"""DSP parity tests: JAX STFT/iSTFT vs numpy oracles of the reference math.

SURVEY.md §4 "Unit: DSP parity" — tolerance ≤1e-5 float32, property tests
over odd lengths and last-frame padding.
"""

import numpy as np
import pytest

from convsep_tpu.dsp import (
    sinebell,
    stft,
    istft,
    overlap_add,
    num_frames,
    magphase,
    scale_magnitude,
    unscale_magnitude,
    frame_signal,
)
from tests.oracles import sinebell_np, stft_np, istft_np, overlap_add_np


def test_sinebell_matches_reference_definition():
    w = sinebell(1024)
    assert w.shape == (1024,)
    assert w[0] == 0.0
    np.testing.assert_allclose(w, sinebell_np(1024), atol=0)
    # peak at the center, symmetric about it
    assert abs(w[512] - 1.0) < 1e-12
    np.testing.assert_allclose(w[1:512], w[1024 - 511 :][::-1], atol=1e-12)


@pytest.mark.parametrize("length", [512, 1000, 4097, 44100])
@pytest.mark.parametrize("win,hop", [(1024, 512), (4096, 1024)])
def test_stft_matches_oracle(rng, length, win, hop):
    x = rng.standard_normal(length).astype(np.float32)
    w = sinebell(win)
    got = np.asarray(stft(x, w, hop))
    want = stft_np(x, w, hop, win)
    assert got.shape == want.shape == (num_frames(length, hop), win // 2 + 1)
    np.testing.assert_allclose(got, want, atol=1e-3 * np.abs(want).max())


def test_stft_gather_fallback_matches_oracle(rng):
    # hop that does not divide the window exercises the take-based framing
    x = rng.standard_normal(3000).astype(np.float32)
    w = sinebell(1024)
    got = np.asarray(stft(x, w, 300))
    want = stft_np(x, w, 300, 1024)
    np.testing.assert_allclose(got, want, atol=1e-3 * np.abs(want).max())


def test_frame_signal_paths_agree(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    nf = 12
    a = np.asarray(frame_signal(x, 1024, 512, nf))  # block path
    idx = np.arange(nf)[:, None] * 512 + np.arange(1024)[None, :]
    np.testing.assert_array_equal(a, x[idx])


@pytest.mark.parametrize("length", [777, 2048, 10000])
def test_istft_matches_oracle(rng, length):
    w = sinebell(1024)
    hop = 512
    x = rng.standard_normal(length).astype(np.float32)
    spec = stft_np(x, w, hop, 1024)
    got = np.asarray(istft(spec.astype(np.complex64), w, hop, length))
    want = istft_np(spec, w, hop, length)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("length", [512, 1000, 4097, 44100])
@pytest.mark.parametrize("win,hop", [(1024, 512), (4096, 1024), (1024, 300)])
def test_roundtrip(rng, length, win, hop):
    """istft(stft(x)) ≈ x (SURVEY §4: the load-bearing DSP property)."""
    x = (0.3 * rng.standard_normal(length)).astype(np.float32)
    w = sinebell(win)
    y = np.asarray(istft(stft(x, w, hop), w, hop, length))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=2e-4)


def test_overlap_add_matches_naive(rng):
    frames = rng.standard_normal((7, 1024)).astype(np.float32)
    got = np.asarray(overlap_add(frames, 512))
    np.testing.assert_allclose(got, overlap_add_np(frames, 512), atol=1e-5)
    # non-dividing hop
    got = np.asarray(overlap_add(frames, 300))
    np.testing.assert_allclose(got, overlap_add_np(frames, 300), atol=1e-5)


def test_overlap_add_batched(rng):
    frames = rng.standard_normal((3, 5, 256)).astype(np.float32)
    got = np.asarray(overlap_add(frames, 128))
    for b in range(3):
        np.testing.assert_allclose(got[b], overlap_add_np(frames[b], 128), atol=1e-5)


def test_batched_stft_istft(rng):
    """Leading axes broadcast through the whole chain (sources/channels)."""
    x = rng.standard_normal((4, 3000)).astype(np.float32)
    w = sinebell(1024)
    spec = stft(x, w, 512)
    assert spec.shape == (4, num_frames(3000, 512), 513)
    y = np.asarray(istft(spec, w, 512, 3000))
    np.testing.assert_allclose(y, x, atol=2e-4)


def test_magphase_and_scaling(rng):
    x = rng.standard_normal(3000).astype(np.float32)
    w = sinebell(1024)
    spec = stft(x, w, 512)
    mag, ph = magphase(spec)
    np.testing.assert_allclose(
        np.asarray(mag) * np.exp(1j * np.asarray(ph)), np.asarray(spec), atol=1e-4
    )
    m = np.asarray(mag)
    np.testing.assert_allclose(
        np.asarray(unscale_magnitude(scale_magnitude(mag, "log"), "log")), m, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(scale_magnitude(mag, "lin")), m)


def test_istft_frame_count_mismatch_raises():
    w = sinebell(1024)
    spec = np.zeros((5, 513), np.complex64)
    with pytest.raises(ValueError):
        istft(spec, w, 512, 44100)
