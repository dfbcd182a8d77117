"""Fused factored forward-STFT kernel (dsp/pallas/ct_stft_kernel.py).

Equality vs dft.stft_matmul at "highest": a different (128 × nfft/128 vs
64×64) factorization, so agreement is float-reassociation-level, not
bitwise."""

import numpy as np
import pytest

import jax.numpy as jnp

from convsep_tpu.dsp.dft import stft_matmul
from convsep_tpu.dsp.pallas.ct_stft_kernel import ct_stft_supported, stft_ct_pallas
from convsep_tpu.dsp.windows import sinebell


def _ref(sig, win, hop, nfft):
    re, im = stft_matmul(sig, win, hop, nfft=nfft, precision="highest",
                         algorithm="factored")
    return np.asarray(re), np.asarray(im)


def test_supported_envelope():
    assert ct_stft_supported(4096, 4096, 1024)
    assert not ct_stft_supported(4096, 4096, 512)   # hop/128 not 8-aligned
    assert not ct_stft_supported(1024, 1024, 256)   # K2 < 8
    assert not ct_stft_supported(4096, 2048, 1024)  # zero-padded frames
    with pytest.raises(ValueError, match="unsupported"):
        stft_ct_pallas(np.zeros(4096, np.float32), sinebell(1024), 256)


@pytest.mark.parametrize("L", [4096 * 3, 50_000])
def test_ct_stft_matches_matmul(rng, L):
    win = sinebell(4096)
    sig = (0.1 * rng.standard_normal(L)).astype(np.float32)
    re_ref, im_ref = _ref(sig, win, 1024, 4096)
    re, im, ny = stft_ct_pallas(sig, win, 1024, nfft=4096, interpret=True)
    assert re.shape == (re_ref.shape[0], 2048)
    full_re = np.concatenate([np.asarray(re), np.asarray(ny)[:, None]], -1)
    full_im = np.concatenate(
        [np.asarray(im), np.zeros((im.shape[0], 1), np.float32)], -1
    )
    scale = np.abs(re_ref).max()
    np.testing.assert_allclose(full_re, re_ref, atol=2e-5 * scale)
    np.testing.assert_allclose(full_im, im_ref, atol=2e-5 * scale)


def test_ct_stft_batched_matches_single(rng):
    win = sinebell(4096)
    sig = (0.1 * rng.standard_normal((3, 30_000))).astype(np.float32)
    re_b, im_b, ny_b = stft_ct_pallas(sig, win, 1024, interpret=True)
    for i in range(3):
        re1, im1, ny1 = stft_ct_pallas(sig[i], win, 1024, interpret=True)
        np.testing.assert_array_equal(np.asarray(re_b[i]), np.asarray(re1))
        np.testing.assert_array_equal(np.asarray(im_b[i]), np.asarray(im1))
        np.testing.assert_array_equal(np.asarray(ny_b[i]), np.asarray(ny1))


def test_ct_stft_int_input_rejected():
    with pytest.raises(Exception):
        stft_ct_pallas(np.zeros((2, 2, 100), np.float32), sinebell(4096), 1024)


def test_fused_pipeline_ct_analysis_matches_matmul(rng):
    """End-to-end: forcing analysis="ct_pallas" (forward kernel + the
    Nyquist-separate Wiener mega-kernel feed) matches the XLA-analysis
    pipeline within float-reassociation tolerance."""
    import dataclasses

    import jax

    from convsep_tpu.configs.presets import get_preset
    from convsep_tpu.models.convsep import ConvSep
    from convsep_tpu.separate.pipeline import separate_fused_batch

    base = get_preset("highres4096")
    # CPU-sized variant that still qualifies: frame 4096, hop 1024
    model = dataclasses.replace(
        base.model, conv1_filters=4, conv1_freq=8, conv2_filters=4,
        bottleneck=8, time_context=10, mask_dtype="float32",
        decoder_impl="bandconv",
    )
    preset = dataclasses.replace(
        base,
        model=model,
        sep=dataclasses.replace(base.sep, segment_bucket=1),
    )
    t = preset.transform
    L = 10 * model.time_context * t.hop_size
    mix = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    params = ConvSep(model).init(
        jax.random.PRNGKey(0),
        np.zeros((1, model.time_context, model.feat_size, 1), np.float32),
    )

    outs = {}
    for mode, synth in (("matmul", "factored"), ("ct_pallas", "ct_pallas_wiener")):
        p = dataclasses.replace(
            preset,
            transform=dataclasses.replace(
                t, analysis=mode, masked_synthesis=synth
            ),
        )
        outs[mode] = np.asarray(
            separate_fused_batch(params, jnp.asarray(mix), None, p, L, None,
                                 "float32", False)
        )
    a, b = outs["matmul"], outs["ct_pallas"]
    assert a.shape == b.shape
    scale = np.abs(a).max() + 1e-9
    np.testing.assert_allclose(b, a, atol=5e-4 * scale)
