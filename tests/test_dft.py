"""Matmul-DFT parity tests: dsp/dft.py vs the jnp.fft path and oracles."""

import dataclasses

import numpy as np
import pytest

from convsep_tpu.dsp import sinebell, stft, istft
from convsep_tpu.dsp.dft import stft_matmul, istft_matmul
from tests.oracles import stft_np


@pytest.mark.parametrize("length,win,hop", [(4000, 256, 128), (10000, 1024, 512)])
def test_stft_matmul_matches_fft(rng, length, win, hop):
    x = rng.standard_normal(length).astype(np.float32)
    w = sinebell(win)
    re, im = stft_matmul(x, w, hop)
    want = stft_np(x, w, hop, win)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-4 * scale)


def test_istft_matmul_matches_fft_istft(rng):
    w = sinebell(256)
    x = rng.standard_normal(5000).astype(np.float32)
    spec = np.asarray(stft_np(x, w, 128, 256)).astype(np.complex64)
    a = np.asarray(istft(spec, w, 128, 5000))
    b = np.asarray(istft_matmul(spec.real, spec.imag, w, 128, 5000))
    np.testing.assert_allclose(a, b, atol=5e-4)


@pytest.mark.parametrize("length", [999, 8192])
def test_matmul_roundtrip(rng, length):
    x = (0.3 * rng.standard_normal(length)).astype(np.float32)
    w = sinebell(1024)
    re, im = stft_matmul(x, w, 512)
    y = np.asarray(istft_matmul(re, im, w, 512, length))
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_matmul_roundtrip_nfft_padding(rng):
    """nfft > window (zero-padded FFT) handled by matrix truncation."""
    x = (0.3 * rng.standard_normal(3000)).astype(np.float32)
    w = sinebell(256)
    re, im = stft_matmul(x, w, 128, nfft=512)
    assert re.shape[-1] == 257
    y = np.asarray(istft_matmul(re, im, w, 128, 3000, nfft=512))
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_batched_leading_axes(rng):
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    w = sinebell(256)
    re, im = stft_matmul(x, w, 128)
    assert re.shape[0] == 3
    y = np.asarray(istft_matmul(re, im, w, 128, 4000))
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_fused_separation_matmul_matches_fft_impl(rng):
    """The two fused-pipeline backends produce near-identical stems."""
    from tests.test_separate import tiny_preset, _oracle_separator
    from convsep_tpu.data import sine_mixture

    p_fft = tiny_preset("ikala")
    p_mm = dataclasses.replace(
        p_fft, transform=dataclasses.replace(p_fft.transform, fft_impl="matmul")
    )
    L = 8000
    stems, mix = sine_mixture(2, L, fs=8000, freqs=(220.0, 1400.0), seed=3)
    est_fft = _oracle_separator(p_fft, stems, L)(mix)
    est_mm = _oracle_separator(p_mm, stems, L)(mix)
    np.testing.assert_allclose(est_mm, est_fft, atol=2e-3)


def test_frame_count_mismatch_raises(rng):
    w = sinebell(256)
    with pytest.raises(ValueError):
        istft_matmul(np.zeros((5, 129)), np.zeros((5, 129)), w, 128, 44100)


@pytest.mark.parametrize("nfft,hop", [(256, 128), (1024, 512), (4096, 2048)])
def test_factored_dft_matches_direct(rng, nfft, hop):
    """Cooley–Tukey factored matmul-DFT == direct, forward and inverse,
    including an arbitrary (non-hermitian-consistent) masked spectrum."""
    win = sinebell(nfft)
    sig = (0.3 * rng.standard_normal(nfft * 12)).astype(np.float32)
    re_d, im_d = stft_matmul(sig, win, hop, algorithm="direct")
    re_f, im_f = stft_matmul(sig, win, hop, algorithm="factored")
    scale = float(np.abs(np.asarray(re_d)).max())
    np.testing.assert_allclose(np.asarray(re_f) / scale, np.asarray(re_d) / scale, atol=3e-6)
    np.testing.assert_allclose(np.asarray(im_f) / scale, np.asarray(im_d) / scale, atol=3e-6)
    L = len(sig)
    x_d = np.asarray(istft_matmul(re_d, im_d, win, hop, L, algorithm="direct"))
    x_f = np.asarray(istft_matmul(re_d, im_d, win, hop, L, algorithm="factored"))
    np.testing.assert_allclose(x_f, x_d, atol=3e-6)
    # masked spectra carry junk imag at DC/Nyquist — semantics must match
    mask = (0.5 + 0.5 * rng.random(re_d.shape)).astype(np.float32)
    x_d = np.asarray(istft_matmul(re_d * mask, im_d * mask, win, hop, L, algorithm="direct"))
    x_f = np.asarray(istft_matmul(re_d * mask, im_d * mask, win, hop, L, algorithm="factored"))
    np.testing.assert_allclose(x_f, x_d, atol=3e-6)


def test_factored_auto_threshold():
    from convsep_tpu.dsp.dft import _use_factored

    assert not _use_factored("auto", 1024)  # measured v5e crossover
    assert _use_factored("auto", 2048)
    assert _use_factored("auto", 4096)
    assert not _use_factored("auto", 254)  # 2·127: no balanced even split
    with pytest.raises(ValueError):
        _use_factored("fft", 1024)
