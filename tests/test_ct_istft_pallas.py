"""Fused factored-iDFT/OLA Pallas kernel parity (interpret mode, CPU CI).

The kernel is the VERDICT r3 #4 attack on the 4096-pt presets' MFU: it
replaces the XLA factored inverse chain (6 HBM-materialized frame
tensors) with one VMEM-resident pass per 128-frame block. Semantics must
be bit-comparable to `dft.istft_matmul` — these tests pin that across
block boundaries (spill folding), leading axes, vmap, and the supported()
gate. On TPU hardware the same kernel runs compiled (docs/PALLAS_PROFILE.md
addendum 10).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.dsp import sinebell
from convsep_tpu.dsp.dft import istft_matmul, stft_matmul
from convsep_tpu.dsp.pallas.ct_istft_kernel import (
    ct_pallas_supported,
    istft_ct_pallas,
)


def test_supported_gate():
    # 4096-pt production shape (highres4096 / multires4096 / bach10)
    assert ct_pallas_supported(4096, 4096, 1024)
    # small CI shapes
    assert ct_pallas_supported(256, 256, 64)
    assert ct_pallas_supported(512, 512, 128)
    # rejections: zero-padded window, non-multiple-of-128, hop not a
    # multiple of B lanes, overlap ratio beyond the 8-row spill buffer
    assert not ct_pallas_supported(4096, 2048, 1024)  # win != nfft
    assert not ct_pallas_supported(1000, 1000, 250)  # nfft % 128
    assert not ct_pallas_supported(256, 256, 63)  # win % hop
    assert not ct_pallas_supported(4096, 4096, 16)  # ratio 256 > 9
    assert not ct_pallas_supported(128, 128, 64)  # B < 2


@pytest.mark.parametrize(
    "nfft,hop,length",
    [
        (256, 64, 12000),  # nf=190 > R=128: exercises block-spill folding
        (256, 128, 7000),  # overlap ratio 2
        (512, 128, 9000),  # K2=2, G=64
    ],
)
def test_ct_pallas_matches_matmul(rng, nfft, hop, length):
    w = sinebell(nfft)
    x = (0.3 * rng.standard_normal(length)).astype(np.float32)
    re, im = stft_matmul(x, w, hop, nfft)
    want = np.asarray(istft_matmul(re, im, w, hop, length, nfft=nfft))
    got = np.asarray(istft_ct_pallas(re, im, w, hop, length, nfft=nfft, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got, x, atol=2e-3)  # roundtrip sanity


def test_ct_pallas_leading_axes(rng):
    """(S, nf, bins) sources flatten onto the kernel grid."""
    w = sinebell(256)
    L = 6000
    x = rng.standard_normal((3, L)).astype(np.float32) * 0.2
    re, im = stft_matmul(x, w, 64, 256)
    want = np.asarray(istft_matmul(re, im, w, 64, L, nfft=256))
    got = np.asarray(istft_ct_pallas(re, im, w, 64, L, nfft=256, interpret=True))
    assert got.shape == (3, L)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ct_pallas_under_vmap(rng):
    """The batched separation path vmaps the fused program over tracks;
    pallas_call must lift onto the batch grid axis."""
    w = sinebell(256)
    L = 5000
    x = rng.standard_normal((2, L)).astype(np.float32) * 0.2
    re, im = stft_matmul(x, w, 64, 256)

    f = jax.vmap(
        lambda r, i: istft_ct_pallas(r, i, w, 64, L, nfft=256, interpret=True)
    )
    got = np.asarray(f(re, im))
    want = np.asarray(istft_matmul(re, im, w, 64, L, nfft=256))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ct_pallas_rejects_unsupported(rng):
    w = sinebell(256)
    with pytest.raises(ValueError, match="unsupported"):
        istft_ct_pallas(
            np.zeros((10, 129), np.float32), np.zeros((10, 129), np.float32),
            w, 63, 500, interpret=True,
        )
    with pytest.raises(ValueError, match="frames"):
        istft_ct_pallas(
            np.zeros((5, 129), np.float32), np.zeros((5, 129), np.float32),
            w, 64, 44100, interpret=True,
        )


def test_istft_matmul_ct_pallas_algorithm(rng):
    """`algorithm='ct_pallas'` routes istft_matmul through the kernel."""
    w = sinebell(256)
    L = 6000
    x = (0.3 * rng.standard_normal(L)).astype(np.float32)
    re, im = stft_matmul(x, w, 64, 256)
    want = np.asarray(istft_matmul(re, im, w, 64, L, nfft=256))
    got = np.asarray(
        istft_matmul(re, im, w, 64, L, nfft=256, algorithm="ct_pallas")
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # unsupported shape under the explicit algorithm is an error, not a
    # silent fallback
    with pytest.raises(ValueError, match="unsupported"):
        istft_matmul(re, im, w, 63, L, nfft=256, algorithm="ct_pallas")


@pytest.mark.skipif(
    not os.environ.get("CONVSEP_SLOW_TESTS"),
    reason="4096-pt interpret-mode run takes minutes; set CONVSEP_SLOW_TESTS=1. "
    "TPU-compiled parity for this shape is pinned in PALLAS_PROFILE addendum 10.",
)
def test_ct_pallas_highres4096(rng):
    """Production 4096-pt shape, interpret mode."""
    w = sinebell(4096)
    L = 60000
    x = (0.2 * rng.standard_normal(L)).astype(np.float32)
    re, im = stft_matmul(x, w, 1024)
    want = np.asarray(istft_matmul(re, im, w, 1024, L))
    got = np.asarray(istft_ct_pallas(re, im, w, 1024, L, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ct_pallas_int16_epilogue(rng):
    """In-kernel PCM16 quantization == quantize-after (identical math)."""
    from convsep_tpu.utils.pcm import quantize_pcm16

    w = sinebell(256)
    L = 6000
    x = (0.3 * rng.standard_normal(L)).astype(np.float32)
    re, im = stft_matmul(x, w, 64, 256)
    f32 = istft_matmul(re, im, w, 64, L, nfft=256, algorithm="ct_pallas")
    want = np.asarray(quantize_pcm16(f32))
    got = np.asarray(
        istft_matmul(
            re, im, w, 64, L, nfft=256, algorithm="ct_pallas",
            output_dtype="int16",
        )
    )
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, want)
    # the non-kernel algorithms quantize after synthesis via the same helper
    got_xla = np.asarray(
        istft_matmul(re, im, w, 64, L, nfft=256, algorithm="direct",
                     output_dtype="int16")
    )
    ref_xla = np.asarray(
        quantize_pcm16(istft_matmul(re, im, w, 64, L, nfft=256, algorithm="direct"))
    )
    np.testing.assert_array_equal(got_xla, ref_xla)
