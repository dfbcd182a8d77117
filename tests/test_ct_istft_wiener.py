"""Fused Wiener-mask + iSTFT mega-kernel parity (interpret mode, CPU CI).

docs/PALLAS_PROFILE.md addendum 11: the masked spectra est_re/est_im and
their relayout/pad passes are ~38 ms of the highres4096 b32 budget; the
mega-kernel computes mask + complex multiply + factored iDFT + OLA in one
VMEM pass. Semantics must equal `wiener_mask` (models/masks.py) followed
by `dft.istft_matmul` — pinned here across exponents, conservation mode,
batch axes, PCM16 epilogue, and the dispatch envelope.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from convsep_tpu.dsp import sinebell
from convsep_tpu.dsp.dft import istft_matmul, istft_wiener, stft_matmul
from convsep_tpu.dsp.pallas.ct_istft_kernel import istft_ct_pallas_wiener
from convsep_tpu.models.masks import wiener_mask


def _mk(rng, S, length, nfft, hop, lead=()):
    w = sinebell(nfft)
    x = (0.3 * rng.standard_normal((*lead, length))).astype(np.float32)
    re, im = stft_matmul(x, w, hop, nfft)
    nf = re.shape[-2]
    y = np.abs(
        rng.standard_normal((*lead, S, nf, nfft // 2 + 1))
    ).astype(np.float32)
    # ReLU-dead patches: exercise the eps shortfall / conserve_last paths
    y[..., : nf // 3, :8] = 0.0
    return w, re, im, jnp.asarray(y)


def _want(y, re, im, w, hop, length, nfft, **kw):
    mask = wiener_mask(y, p=kw.get("p", 1.0), eps=kw.get("eps", 1e-8),
                       axis=-3, conserve_last=kw.get("conserve_last", False))
    return np.asarray(
        istft_matmul(mask * jnp.expand_dims(re, -3),
                     mask * jnp.expand_dims(im, -3),
                     w, hop, length, nfft=nfft)
    )


@pytest.mark.parametrize(
    "nfft,hop,length,S,kw",
    [
        (256, 64, 12000, 4, {}),                       # spill folding, S=4
        (256, 128, 7000, 2, {"p": 2.0}),               # classic Wiener
        (512, 128, 9000, 3, {"conserve_last": True}),  # Σ masks = 1
        (256, 64, 6000, 4, {"eps": 1e-4}),
    ],
)
def test_wiener_kernel_matches_xla(rng, nfft, hop, length, S, kw):
    w, re, im, y = _mk(rng, S, length, nfft, hop)
    want = _want(y, re, im, w, hop, length, nfft, **kw)
    got = np.asarray(
        istft_ct_pallas_wiener(y, re, im, w, hop, length, nfft=nfft,
                               interpret=True, **kw)
    )
    assert got.shape == (S, length)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_wiener_kernel_batched(rng):
    """(B, S, nf, bins) y against (B, nf, bins) mixtures — the
    separate_fused_batch layout."""
    w, re, im, y = _mk(rng, 3, 6000, 256, 64, lead=(2,))
    want = _want(y, re, im, w, 64, 6000, 256)
    got = np.asarray(
        istft_ct_pallas_wiener(y, re, im, w, 64, 6000, nfft=256,
                               interpret=True)
    )
    assert got.shape == (2, 3, 6000)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_wiener_kernel_conserve_sums_to_mix(rng):
    """conserve_last ⇒ Σ stems == iSTFT∘STFT of the mixture (the
    complement-fetch contract, now inside the kernel)."""
    nfft, hop, L = 256, 64, 8000
    w, re, im, y = _mk(rng, 4, L, nfft, hop)
    stems = np.asarray(
        istft_ct_pallas_wiener(y, re, im, w, hop, L, nfft=nfft,
                               interpret=True, conserve_last=True)
    )
    mix_rt = np.asarray(istft_matmul(re, im, w, hop, L, nfft=nfft))
    np.testing.assert_allclose(stems.sum(axis=0), mix_rt, atol=1e-4)


def test_wiener_kernel_int16_epilogue(rng):
    from convsep_tpu.utils.pcm import quantize_pcm16

    w, re, im, y = _mk(rng, 2, 6000, 256, 64)
    f32 = istft_ct_pallas_wiener(y, re, im, w, 64, 6000, nfft=256,
                                 interpret=True)
    want = np.asarray(quantize_pcm16(f32))
    got = np.asarray(
        istft_ct_pallas_wiener(y, re, im, w, 64, 6000, nfft=256,
                               interpret=True, output_dtype="int16")
    )
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, want)


def test_wiener_kernel_rejects_bad_shapes(rng):
    w, re, im, y = _mk(rng, 2, 6000, 256, 64)
    with pytest.raises(ValueError, match="unsupported"):
        istft_ct_pallas_wiener(y, re, im, w, 63, 6000, nfft=256,
                               interpret=True)
    with pytest.raises(ValueError, match="unsupported"):  # exponent envelope
        istft_ct_pallas_wiener(y, re, im, w, 64, 6000, nfft=256, p=1.5,
                               interpret=True)
    with pytest.raises(ValueError, match="align"):
        istft_ct_pallas_wiener(y[..., :-1], re, im, w, 64, 6000, nfft=256,
                               interpret=True)
    with pytest.raises(ValueError, match="sources axis"):
        istft_ct_pallas_wiener(y[0], re, im, w, 64, 6000, nfft=256,
                               interpret=True)


def test_istft_wiener_dispatcher(rng):
    """istft_wiener: explicit kernel routing == the XLA fallback path; the
    auto envelope keeps 1024-pt shapes on XLA until the on-chip A/B."""
    w, re, im, y = _mk(rng, 2, 6000, 256, 64)
    want = np.asarray(istft_wiener(y, re, im, w, 64, 6000, nfft=256,
                                   algorithm="direct"))
    got = np.asarray(istft_wiener(y, re, im, w, 64, 6000, nfft=256,
                                  algorithm="ct_pallas_wiener"))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # auto on CPU (or below the nfft floor) must take the XLA path and agree
    auto = np.asarray(istft_wiener(y, re, im, w, 64, 6000, nfft=256))
    np.testing.assert_allclose(auto, want, atol=1e-6)
