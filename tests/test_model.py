"""ConvSep model unit tests (SURVEY.md §4 'Unit: model').

The tied transposed conv must equal the vjp of the forward conv — that IS
the definition of Lasagne's InverseLayer, so this test pins reference
semantics without needing the reference.
"""

import numpy as np
import jax
import jax.numpy as jnp

from convsep_tpu.models import ConvSep, ConvSepConfig
from convsep_tpu.models.convsep import tied_conv_transpose

CFG = ConvSepConfig(
    time_context=30, feat_size=513, channels_in=1, num_sources=2,
    conv1_filters=8, conv2_filters=8, bottleneck=32,
)


def _init(cfg=CFG, batch=3):
    model = ConvSep(cfg)
    x = jnp.zeros((batch, cfg.time_context, cfg.feat_size, cfg.channels_in))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_tied_conv_transpose_is_vjp_of_conv(rng):
    dn = ("NHWC", "HWIO", "NHWC")
    for (h, w, i, o), strides, in_spatial in [
        ((1, 30, 1, 8), (1, 3), (30, 513)),   # strided vertical conv
        ((15, 1, 8, 8), (1, 1), (30, 162)),   # horizontal conv
        ((1, 30, 1, 8), (1, 4), (30, 513)),   # stride not tiling evenly
    ]:
        k = rng.standard_normal((h, w, i, o)).astype(np.float32)
        x0 = jnp.zeros((2, *in_spatial, i))
        fwd = lambda v: jax.lax.conv_general_dilated(  # noqa: E731
            v, k, strides, "VALID", dimension_numbers=dn
        )
        y = rng.standard_normal(jax.eval_shape(fwd, x0).shape).astype(np.float32)
        want = jax.vjp(fwd, x0)[1](jnp.asarray(y))[0]
        got = tied_conv_transpose(jnp.asarray(y), jnp.asarray(k), strides, in_spatial)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_forward_shape_and_nonnegativity(rng):
    model, params = _init()
    x = jnp.asarray(np.abs(rng.standard_normal((3, 30, 513, 1))).astype(np.float32))
    y = model.apply(params, x)
    assert y.shape == (3, 30, 513, 2)
    assert (np.asarray(y) >= 0).all()


def test_forward_deterministic_under_jit(rng):
    model, params = _init()
    x = jnp.asarray(rng.standard_normal((3, 30, 513, 1)).astype(np.float32))
    f = jax.jit(model.apply)
    a = np.asarray(f(params, x))
    b = np.asarray(f(params, x))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.asarray(model.apply(params, x)), a, atol=1e-5)


def test_param_shapes_match_reference_contract():
    """Weight-shape contract (de-facto architecture parity test, SURVEY §4)."""
    cfg = ConvSepConfig()
    _, params = _init(cfg, batch=1)
    p = params["params"]
    assert p["conv1_kernel"].shape == (1, 30, 1, 50)
    assert p["conv2_kernel"].shape == (15, 1, 50, 50)
    assert p["fc"]["kernel"].shape == (cfg.enc_flat, 128)
    assert p["fc_expand"]["kernel"].shape == (128, 2 * cfg.enc_flat)
    assert p["out_bias"].shape == (2,)
    # encoder geometry
    assert cfg.enc_time == 16 and cfg.enc_freq == 484


def test_separate_applies_mask(rng):
    model, params = _init()
    x = jnp.asarray(np.abs(rng.standard_normal((2, 30, 513, 1))).astype(np.float32))
    mix = x[..., 0]
    est = model.apply(params, x, mix, method=ConvSep.separate)
    est = np.asarray(est)
    assert est.shape == (2, 30, 513, 2)
    # masked estimates sum to at most the mixture
    assert (est.sum(-1) <= np.asarray(mix) + 1e-4).all()


def test_multichannel_score_informed_input(rng):
    cfg = ConvSepConfig(
        channels_in=5, num_sources=4, conv1_filters=4, conv2_filters=4, bottleneck=16
    )
    model = ConvSep(cfg)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 30, 513, 5))).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == (2, 30, 513, 4)


def test_bfloat16_compute_close_to_f32(rng):
    import dataclasses

    cfg32 = CFG
    cfg16 = dataclasses.replace(CFG, compute_dtype="bfloat16")
    model32, params = _init(cfg32)
    model16 = ConvSep(cfg16)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 30, 513, 1))).astype(np.float32))
    y32 = np.asarray(model32.apply(params, x))
    y16 = np.asarray(model16.apply(params, x))
    assert y16.dtype == np.float32
    scale = np.abs(y32).max() + 1e-9
    assert np.abs(y16 - y32).max() / scale < 0.05


def test_tied_conv_transpose_regular_matches_vjp(rng):
    """The regular-conv decoder (MXU path, r2) must be the exact vjp too —
    including non-tiling strides and multi-channel inputs."""
    from convsep_tpu.models.convsep import tied_conv_transpose_regular

    dn = ("NHWC", "HWIO", "NHWC")
    for (h, w, i, o), strides, in_spatial in [
        ((1, 30, 1, 8), (1, 3), (30, 513)),
        ((15, 1, 8, 8), (1, 1), (30, 162)),
        ((1, 30, 1, 8), (1, 4), (30, 513)),
        ((1, 30, 5, 8), (1, 3), (30, 513)),   # score-informed channels_in=5
        ((7, 5, 3, 4), (1, 2), (20, 33)),     # 2-D kernel, both axes active
    ]:
        k = rng.standard_normal((h, w, i, o)).astype(np.float32)
        x0 = jnp.zeros((2, *in_spatial, i))
        fwd = lambda v: jax.lax.conv_general_dilated(  # noqa: E731
            v, k, strides, "VALID", dimension_numbers=dn
        )
        y = rng.standard_normal(jax.eval_shape(fwd, x0).shape).astype(np.float32)
        want = jax.vjp(fwd, x0)[1](jnp.asarray(y))[0]
        got = tied_conv_transpose_regular(jnp.asarray(y), jnp.asarray(k), strides, in_spatial)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_decoder_impls_agree(rng):
    """All tied-decoder implementations produce the same network:
    bandconv (composed band+freq single conv, the default), band
    (banded-GEMM time stage), conv (regular convs), and conv_transpose
    (vjp-shaped reference formulation)."""
    import dataclasses

    cfg = ConvSepConfig(
        time_context=12, feat_size=65, channels_in=1, num_sources=3,
        conv1_filters=6, conv1_freq=9, conv1_freq_stride=2,
        conv2_filters=5, conv2_time=5, bottleneck=16,
    )
    assert cfg.decoder_impl == "bandconv"
    for stride in (1, 2):
        c = dataclasses.replace(cfg, conv1_freq_stride=stride)
        x = jnp.asarray(np.abs(rng.standard_normal((3, 12, 65, 1))).astype(np.float32))
        m_band = ConvSep(c)
        params = m_band.init(jax.random.PRNGKey(0), x)
        a = np.asarray(m_band.apply(params, x))
        for impl in ("band", "band_einsum", "conv", "conv_transpose",
                     "bandconv_nlast", "bandgemm"):
            m = ConvSep(dataclasses.replace(c, decoder_impl=impl))
            b = np.asarray(m.apply(params, x))
            np.testing.assert_allclose(a, b, atol=1e-4, err_msg=f"{impl} s={stride}")


def test_encoder_collapsed_matches_conv(rng):
    """encoder_impl="collapsed" (conv1∘conv2∘flatten∘fc composed into ONE
    GEMM via the tied-decoder adjoint of the fc kernel columns) is the
    same network as "conv": identical param tree, same-seed init produces
    the identical fc kernel, and the forward agrees to float32 tolerance
    (the composition reorders the adds). Exercises a strided conv1, extra
    input channels, and non-default filter counts."""
    import dataclasses

    cfg = ConvSepConfig(
        time_context=12, feat_size=65, channels_in=2, num_sources=3,
        conv1_filters=6, conv1_freq=9, conv1_freq_stride=2,
        conv2_filters=5, conv2_time=5, bottleneck=16,
        encoder_impl="conv",
    )
    cc = dataclasses.replace(cfg, encoder_impl="collapsed")
    x = jnp.asarray(np.abs(rng.standard_normal((3, 12, 65, 2))).astype(np.float32))
    m_conv, m_col = ConvSep(cfg), ConvSep(cc)
    params = m_conv.init(jax.random.PRNGKey(0), x)
    p2 = m_col.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(
        lambda a: a.shape, p2
    )
    np.testing.assert_array_equal(
        np.asarray(params["params"]["fc"]["kernel"]),
        np.asarray(p2["params"]["fc"]["kernel"]),
    )
    a = np.asarray(m_conv.apply(params, x))
    b = np.asarray(m_col.apply(params, x))
    np.testing.assert_allclose(a, b, atol=2e-5)

    # precomposed path (the batched/streaming entry points hoist the
    # composition out of lax.map bodies): identical result, and idempotent
    from convsep_tpu.models.convsep import precompose_collapsed, trainable_config

    pre = precompose_collapsed(params, cc)
    assert "enc_cache" in pre and precompose_collapsed(pre, cc) is pre
    assert precompose_collapsed(params, cfg) is params  # no-op for "conv"
    c = np.asarray(m_col.apply(pre, x))
    np.testing.assert_allclose(b, c, atol=1e-6)

    assert trainable_config(cc).encoder_impl == "conv"

    import pytest

    with pytest.raises(ValueError, match="encoder_impl"):
        ConvSep(dataclasses.replace(cfg, encoder_impl="nope")).apply(params, x)


def test_band_decode_matches_regular(rng):
    """tied_conv_transpose_band == tied_conv_transpose_regular for the
    (kh, 1, I, O) stride-1 time-stage kernels it handles."""
    from convsep_tpu.models.convsep import (
        tied_conv_transpose_band,
        tied_conv_transpose_regular,
    )

    for kh, Tp, W, I, O in ((15, 16, 162, 7, 5), (5, 6, 9, 3, 3), (1, 8, 4, 2, 6)):
        y = jnp.asarray(rng.standard_normal((2, Tp, W, O)).astype(np.float32))
        k = jnp.asarray((rng.standard_normal((kh, 1, I, O)) * 0.2).astype(np.float32))
        T = Tp + kh - 1
        ref = np.asarray(tied_conv_transpose_regular(y, k, (1, 1), (T, W)))
        got = np.asarray(tied_conv_transpose_band(y, k))
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_band_pallas_decoder_matches_band(rng):
    """decoder_impl="band_pallas" (Mosaic band stage + w-major freq decode,
    interpret mode here) == decoder_impl="band" on the same params."""
    import dataclasses

    for stride, feat in ((2, 65), (3, 64)):
        cfg = ConvSepConfig(
            time_context=12, feat_size=feat, channels_in=1, num_sources=3,
            conv1_filters=6, conv1_freq=9, conv1_freq_stride=stride,
            conv2_filters=5, conv2_time=5, bottleneck=16,
        )
        x = jnp.asarray(np.abs(rng.standard_normal((3, 12, feat, 1))).astype(np.float32))
        m_band = ConvSep(cfg)
        params = m_band.init(jax.random.PRNGKey(0), x)
        a = np.asarray(m_band.apply(params, x))
        m_pl = ConvSep(dataclasses.replace(cfg, decoder_impl="band_pallas"))
        b = np.asarray(m_pl.apply(params, x))
        # band_pallas matches XLA's default GEMM precision by running bf16
        # operands (f32 accumulate) — compare at bf16 resolution
        scale = np.abs(a).max() + 1e-9
        assert np.abs(b - a).max() / scale < 2e-2, f"stride={stride}"


def test_freq_decode_wmajor_matches_regular(rng):
    from convsep_tpu.models.convsep import (
        freq_decode_wmajor,
        tied_conv_transpose_regular,
    )

    for kw, sw, Wp, F, I, O in ((9, 3, 20, 66, 1, 5), (8, 2, 12, 30, 2, 4), (6, 3, 10, 33, 1, 3)):
        y = jnp.asarray(rng.standard_normal((2, 7, Wp, O)).astype(np.float32))
        k = jnp.asarray((rng.standard_normal((1, kw, I, O)) * 0.2).astype(np.float32))
        ref = np.asarray(tied_conv_transpose_regular(y, k, (1, sw), (7, F)))
        ywm = jnp.transpose(y, (0, 2, 1, 3))  # (N, Wp, T, O) w-major input
        got = np.asarray(freq_decode_wmajor(ywm, k, sw, F))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"kw={kw},sw={sw}")


def test_trainable_config_normalizes_pallas():
    import dataclasses

    from convsep_tpu.models.convsep import trainable_config

    cfg = ConvSepConfig(decoder_impl="band_pallas")
    tc = trainable_config(cfg)
    assert tc.decoder_impl == "band" and tc.encoder_impl == "conv"
    assert tc.expand_pad == "output"
    cfg2 = ConvSepConfig(decoder_impl="conv", encoder_impl="conv", expand_pad="output")
    assert trainable_config(cfg2) is cfg2


def test_fused2d_decoder_matches_band(rng):
    """decoder_impl="fused" (both decode stages as ONE composed-kernel 2-D
    conv) == decoder_impl="band" on the same params, strided and not."""
    import dataclasses

    for stride, feat in ((1, 40), (2, 65), (3, 64)):
        cfg = ConvSepConfig(
            time_context=12, feat_size=feat, channels_in=1, num_sources=3,
            conv1_filters=6, conv1_freq=9, conv1_freq_stride=stride,
            conv2_filters=5, conv2_time=5, bottleneck=16,
        )
        x = jnp.asarray(np.abs(rng.standard_normal((3, 12, feat, 1))).astype(np.float32))
        m_band = ConvSep(cfg)
        params = m_band.init(jax.random.PRNGKey(0), x)
        a = np.asarray(m_band.apply(params, x))
        m_f = ConvSep(dataclasses.replace(cfg, decoder_impl="fused"))
        b = np.asarray(m_f.apply(params, x))
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=f"stride={stride}")


def test_fused2d_decoder_multichannel(rng):
    """fused decode with score-informed channels_in>1 == band."""
    import dataclasses

    cfg = ConvSepConfig(
        time_context=10, feat_size=33, channels_in=3, num_sources=2,
        conv1_filters=4, conv1_freq=7, conv1_freq_stride=2,
        conv2_filters=4, conv2_time=5, bottleneck=8, decoder_reduce="sum",
    )
    x = jnp.asarray(np.abs(rng.standard_normal((2, 10, 33, 3))).astype(np.float32))
    m = ConvSep(cfg)
    params = m.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m.apply(params, x))
    b = np.asarray(ConvSep(dataclasses.replace(cfg, decoder_impl="fused")).apply(params, x))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_band_decode_wmajor_matches_band(rng):
    from convsep_tpu.models.convsep import (
        band_decode_wmajor,
        tied_conv_transpose_band,
    )

    for kh, Tp, W, I, O in ((15, 16, 162, 7, 5), (15, 16, 484, 5, 5), (1, 8, 4, 2, 6)):
        y = jnp.asarray(rng.standard_normal((2, Tp, W, O)).astype(np.float32))
        k = jnp.asarray((rng.standard_normal((kh, 1, I, O)) * 0.2).astype(np.float32))
        ref = np.asarray(tied_conv_transpose_band(y, k))  # (n, H, w, i)
        got = np.asarray(band_decode_wmajor(y, k))  # (n, w, H, i)
        np.testing.assert_allclose(got.transpose(0, 2, 1, 3), ref, atol=2e-5)


def test_expand_pad_output_matches_kernel(rng):
    """expand_pad="output" (training: GEMM weight-gradient, no sublane
    pad) is numerically identical to the inference "kernel" pad mode in
    forward AND parameter gradients, for strided and stride-1 presets."""
    import dataclasses

    for stride in (3, 1):
        cfg = ConvSepConfig(
            time_context=10, feat_size=33, channels_in=1, num_sources=2,
            conv1_filters=4, conv1_freq=7, conv1_freq_stride=stride,
            conv2_filters=4, conv2_time=5, bottleneck=8,
            decoder_impl="bandconv", expand_pad="kernel",
        )
        cfg_o = dataclasses.replace(cfg, expand_pad="output")
        x = jnp.asarray(np.abs(rng.standard_normal((3, 10, 33, 1))).astype(np.float32))
        params = ConvSep(cfg).init(jax.random.PRNGKey(2), x)
        a = np.asarray(ConvSep(cfg).apply(params, x, method=ConvSep.sources))
        b = np.asarray(ConvSep(cfg_o).apply(params, x, method=ConvSep.sources))
        np.testing.assert_allclose(a, b, atol=1e-6)

        def loss(c):
            return lambda p: jnp.sum(ConvSep(c).apply(p, x, method=ConvSep.sources) ** 2)

        ga = jax.grad(loss(cfg))(params)
        gb = jax.grad(loss(cfg_o))(params)
        for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-4, rtol=1e-5)


def test_trainable_config_selects_output_pad():
    from convsep_tpu.configs import get_preset
    from convsep_tpu.models.convsep import trainable_config

    cfg = trainable_config(get_preset("dsd100").model)
    assert cfg.expand_pad == "output"
    assert cfg.encoder_impl == "conv"
