"""Fused Mosaic decode kernel (decoder_impl="bandconv_pallas") parity —
interpret mode on CPU; TPU-compiled parity is driven on-chip (see
docs/PALLAS_PROFILE.md addendum 12)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.models import ConvSep, ConvSepConfig

# TM = T·(stride·C) = 30·4 = 120 and TpC = 16·5 = 80: inside the kernel's
# supported envelope (fused_decode_supported)
CFG = ConvSepConfig(
    time_context=30, feat_size=129, channels_in=1, num_sources=3,
    conv1_filters=6, conv1_freq=9, conv1_freq_stride=4,
    conv2_filters=5, conv2_time=15, bottleneck=16,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_fused_decode_matches_bandconv(rng):
    m_ref = ConvSep(CFG)
    x = jnp.asarray(
        np.abs(rng.standard_normal((5, 30, 129, 1))).astype(np.float32)
    )
    params = m_ref.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m_ref.apply(params, x))
    m_fused = ConvSep(dataclasses.replace(CFG, decoder_impl="bandconv_pallas"))
    got = np.asarray(m_fused.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_decode_row_blocks(rng):
    """Batch sizes that don't tile the row block (padding path) agree."""
    m_ref = ConvSep(CFG)
    m_fused = ConvSep(dataclasses.replace(CFG, decoder_impl="bandconv_pallas"))
    for B in (1, 7, 16):
        x = jnp.asarray(
            np.abs(rng.standard_normal((B, 30, 129, 1))).astype(np.float32)
        )
        params = m_ref.apply  # noqa: F841 (keep init once below)
        p = m_ref.init(jax.random.PRNGKey(1), x)
        np.testing.assert_allclose(
            np.asarray(m_fused.apply(p, x)),
            np.asarray(m_ref.apply(p, x)),
            atol=1e-4,
            err_msg=f"B={B}",
        )


def test_fused_decode_unsupported_shapes_raise():
    """ikala-class TM (= 30) is outside the supported envelope."""
    from convsep_tpu.models.decoder_fused_pallas import fused_decode_supported

    assert not fused_decode_supported(TpC=800, TM=30, ktaps=2)
    assert not fused_decode_supported(TpC=800, TM=120, ktaps=18)
    assert fused_decode_supported(TpC=800, TM=120, ktaps=8)
    # r4: the spill window extends past one w-block (ktaps − 1 ≤ 16) …
    assert fused_decode_supported(TpC=800, TM=120, ktaps=10)
    # … but dsd100's exact geometry (TM = 90 → 1.42× lane pad) stays OUT:
    # the compiled kernel measured 1.18× slower than XLA bandconv there
    # (v5e 2026-08-20 A/B, BASELINE.md decision record)
    assert not fused_decode_supported(TpC=80, TM=90, ktaps=10)


@pytest.mark.parametrize("conv1_freq", [37, 65])
def test_fused_decode_wide_spill(rng, conv1_freq):
    """ktaps = 10 and 17 (spill 16 > w-block 8): contributions ride the
    carry through TWO block boundaries; 17 is the envelope's edge."""
    cfg = dataclasses.replace(CFG, conv1_freq=conv1_freq)
    m_ref = ConvSep(cfg)
    x = jnp.asarray(
        np.abs(rng.standard_normal((4, 30, 129, 1))).astype(np.float32)
    )
    params = m_ref.init(jax.random.PRNGKey(3), x)
    m_fused = ConvSep(dataclasses.replace(cfg, decoder_impl="bandconv_pallas"))
    np.testing.assert_allclose(
        np.asarray(m_fused.apply(params, x)),
        np.asarray(m_ref.apply(params, x)),
        atol=1e-4,
    )


def test_fused_decode_multitile_tm(rng):
    """TM > 128 (multires-class geometry, TMp = 256) agrees too."""
    cfg = dataclasses.replace(CFG, channels_in=2)  # TM = 30·4·2 = 240
    m_ref = ConvSep(cfg)
    x = jnp.asarray(
        np.abs(rng.standard_normal((4, 30, 129, 2))).astype(np.float32)
    )
    params = m_ref.init(jax.random.PRNGKey(2), x)
    m_fused = ConvSep(dataclasses.replace(cfg, decoder_impl="bandconv_pallas"))
    np.testing.assert_allclose(
        np.asarray(m_fused.apply(params, x)),
        np.asarray(m_ref.apply(params, x)),
        atol=1e-4,
    )


def test_decoder_auto_resolves_on_cpu():
    """decoder_impl="auto" must run the XLA chain off-TPU (interpret-mode
    Mosaic would crawl on full-size 4096-pt programs)."""
    cfg = dataclasses.replace(CFG, decoder_impl="auto")
    m = ConvSep(cfg)
    x = jnp.zeros((2, 30, 129, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    ref = ConvSep(CFG)
    np.testing.assert_allclose(
        np.asarray(m.apply(params, x)), np.asarray(ref.apply(params, x))
    )


def test_prepare_inference_dec_cache(rng):
    """prepare_inference (r4): the pre-prepared dec_cache kernel must give
    bitwise the result of the raw leaf (the prep is the same reshape/pad
    the kernel path does per dispatch, hoisted), and must no-op for
    configs that don't resolve to the fused decode."""
    from convsep_tpu.models.convsep import prepare_inference

    cfg = dataclasses.replace(CFG, decoder_impl="bandconv_pallas")
    m = ConvSep(cfg)
    x = jnp.asarray(
        np.abs(rng.standard_normal((5, 30, 129, 1))).astype(np.float32)
    )
    params = m.init(jax.random.PRNGKey(4), x)
    prepared = prepare_inference(cfg, params)
    assert prepared["dec_cache"]["fc_expand"]["k4"].ndim == 4
    # the raw leaf is DROPPED (keeping both doubled the weight's HBM
    # footprint and OOMed the bench — 2026-08-20)
    assert "kernel" not in prepared["params"]["fc_expand"]
    np.testing.assert_array_equal(
        np.asarray(m.apply(prepared, x)), np.asarray(m.apply(params, x))
    )
    # idempotent + no-op off the pallas decoder
    assert prepare_inference(cfg, prepared) is prepared
    assert prepare_inference(CFG, params) is params
