"""Pallas kernel parity tests, interpreter mode (CPU CI).

On TPU hardware the same kernels run compiled; these tests pin their
numerics against the jnp reference implementations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from convsep_tpu.dsp import sinebell
from convsep_tpu.dsp.dft import stft_matmul
from convsep_tpu.dsp.pallas import stft_pallas, wiener_apply_pallas
from convsep_tpu.models.masks import wiener_filter
from tests.oracles import stft_np


@pytest.mark.parametrize("length,win,hop", [(8000, 256, 128), (20000, 1024, 512)])
def test_stft_pallas_matches_matmul(rng, length, win, hop):
    x = rng.standard_normal(length).astype(np.float32)
    w = sinebell(win)
    re_p, im_p = stft_pallas(x, w, hop, interpret=True)
    re_m, im_m = stft_matmul(x, w, hop)
    assert re_p.shape == re_m.shape
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_m), atol=1e-4)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_m), atol=1e-4)


def test_stft_pallas_matches_fft_oracle(rng):
    x = rng.standard_normal(6000).astype(np.float32)
    w = sinebell(256)
    re_p, im_p = stft_pallas(x, w, 128, interpret=True)
    want = stft_np(x, w, 128, 256)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(re_p), want.real, atol=3e-4 * scale)
    np.testing.assert_allclose(np.asarray(im_p), want.imag, atol=3e-4 * scale)


def test_stft_pallas_rejects_bad_hop(rng):
    with pytest.raises(ValueError, match="win % hop"):
        stft_pallas(np.zeros(1000, np.float32), sinebell(256), 100, interpret=True)
    with pytest.raises(ValueError, match="expects"):
        stft_pallas(np.zeros((2, 2, 1000), np.float32), sinebell(256), 128, interpret=True)


@pytest.mark.parametrize("p", [1.0, 2.0])
def test_wiener_pallas_matches_jnp(rng, p):
    S, F, B = 4, 200, 513  # non-tile-aligned on purpose
    y = np.abs(rng.standard_normal((S, F, B))).astype(np.float32)
    re = rng.standard_normal((F, B)).astype(np.float32)
    im = rng.standard_normal((F, B)).astype(np.float32)
    out_re, out_im = wiener_apply_pallas(
        jnp.asarray(y), jnp.asarray(re), jnp.asarray(im), p=p, interpret=True
    )
    # reference: masks from models.masks applied to re/im separately
    want_re = np.asarray(wiener_filter(jnp.asarray(y).transpose(1, 2, 0), jnp.asarray(re), p=p))
    want_im = np.asarray(wiener_filter(jnp.asarray(y).transpose(1, 2, 0), jnp.asarray(im), p=p))
    np.testing.assert_allclose(np.asarray(out_re), want_re.transpose(2, 0, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_im), want_im.transpose(2, 0, 1), atol=2e-5)


def test_wiener_pallas_shape_validation(rng):
    with pytest.raises(ValueError, match="does not match"):
        wiener_apply_pallas(
            jnp.zeros((2, 10, 16)), jnp.zeros((9, 16)), jnp.zeros((9, 16)), interpret=True
        )


@pytest.mark.parametrize("win,hop", [(256, 128), (1024, 256)])  # k=2 and k=4
def test_istft_pallas_matches_matmul(rng, win, hop):
    from convsep_tpu.dsp.dft import istft_matmul
    from convsep_tpu.dsp.pallas import istft_pallas

    length = 9000
    x = (0.3 * rng.standard_normal(length)).astype(np.float32)
    w = sinebell(win)
    re, im = stft_matmul(x, w, hop)
    a = np.asarray(istft_matmul(re, im, w, hop, length))
    b = np.asarray(istft_pallas(re, im, w, hop, length, interpret=True))
    np.testing.assert_allclose(b, a, atol=1e-4)
    np.testing.assert_allclose(b, x, atol=2e-3)


def test_istft_pallas_validation(rng):
    from convsep_tpu.dsp.pallas import istft_pallas

    w = sinebell(256)
    with pytest.raises(ValueError, match="win % hop"):
        istft_pallas(np.zeros((10, 129)), np.zeros((10, 129)), w, 100, 1000, interpret=True)
    with pytest.raises(ValueError, match="frames"):
        istft_pallas(np.zeros((5, 129)), np.zeros((5, 129)), w, 128, 44100, interpret=True)


def test_stft_pallas_batched_matches_matmul(rng):
    from convsep_tpu.dsp.dft import stft_matmul
    from convsep_tpu.dsp.pallas import stft_pallas
    from convsep_tpu.dsp.windows import sinebell

    w = sinebell(64)
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    re, im = stft_pallas(x, w, 32, interpret=True)
    re2, im2 = stft_matmul(x, w, 32)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(im), np.asarray(im2), atol=1e-5)


def test_istft_pallas_batched_matches_matmul(rng):
    from convsep_tpu.dsp.dft import istft_matmul, stft_matmul
    from convsep_tpu.dsp.pallas import istft_pallas
    from convsep_tpu.dsp.windows import sinebell

    w = sinebell(64)
    x = rng.standard_normal((4, 777)).astype(np.float32)
    re, im = stft_matmul(x, w, 32)
    got = istft_pallas(re, im, w, 32, 777, interpret=True)
    want = istft_matmul(re, im, w, 32, 777)
    assert got.shape == (4, 777)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_separate_fused_pallas_impl_matches_matmul(rng):
    """Production wiring: fft_impl='pallas' routes separation through the
    fused kernels and matches the matmul path (VERDICT r1 #2)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from convsep_tpu.configs import get_preset
    from convsep_tpu.configs.presets import TransformConfig
    from convsep_tpu.models import ConvSep
    from convsep_tpu.separate.pipeline import bucket_length, separate_fused

    base = get_preset("dsd100")
    t = TransformConfig(fs=8000, frame_size=128, hop_size=64, fft_impl="matmul")
    preset = dataclasses.replace(
        base,
        transform=t,
        model=dataclasses.replace(
            base.model, time_context=10, feat_size=t.bins,
            conv1_filters=4, conv1_freq=8, conv2_filters=4, bottleneck=16,
        ),
        sep=dataclasses.replace(base.sep, segment_bucket=2),
    )
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.time_context, cfg.feat_size, 1))
    )
    L = bucket_length(6000, preset)
    audio = jnp.asarray(rng.standard_normal(L).astype(np.float32) * 0.1)
    stems_mm = separate_fused(params, audio, None, preset, L)
    p2 = dataclasses.replace(preset, transform=dataclasses.replace(t, fft_impl="pallas"))
    stems_pl = separate_fused(params, audio, None, p2, L)
    np.testing.assert_allclose(
        np.asarray(stems_pl), np.asarray(stems_mm), atol=2e-5
    )


def test_e2e_train_pallas_stft_matches_matmul(rng):
    """fft_impl='pallas' in the e2e audio train loss equals matmul."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from convsep_tpu.train.e2e import make_audio_loss_fn
    from convsep_tpu.train.loop import create_train_state
    from tests.test_train import tiny_train_preset

    preset = tiny_train_preset()
    state, _ = create_train_state(preset, 0)
    from convsep_tpu.data.audio_dataset import segment_samples

    seg = segment_samples(preset)
    mix = jnp.asarray(rng.standard_normal((2, seg)).astype(np.float32) * 0.1)
    stems = jnp.stack([mix * 0.6, mix * 0.4], axis=1)
    l_mm = make_audio_loss_fn(preset)(state.params, mix, stems)
    p2 = dataclasses.replace(
        preset, transform=dataclasses.replace(preset.transform, fft_impl="pallas")
    )
    l_pl = make_audio_loss_fn(p2)(state.params, mix, stems)
    np.testing.assert_allclose(float(l_pl), float(l_mm), rtol=1e-5)


def test_stft_istft_pallas_highres4096(rng):
    """4096-pt window: tiled DFT-matrix kernels (VMEM-bounded) still match."""
    from convsep_tpu.dsp.dft import istft_matmul, stft_matmul
    from convsep_tpu.dsp.pallas import istft_pallas, stft_pallas

    w = sinebell(4096)
    L = 60000
    x = (0.2 * rng.standard_normal(L)).astype(np.float32)
    re_p, im_p = stft_pallas(x, w, 1024, interpret=True)
    re_m, im_m = stft_matmul(x, w, 1024)
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re_m), atol=2e-4)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im_m), atol=2e-4)
    y_p = istft_pallas(re_m, im_m, w, 1024, L, interpret=True)
    y_m = istft_matmul(re_m, im_m, w, 1024, L)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_m), atol=1e-4)
    # batched too (sources axis)
    re4 = jnp.stack([re_m, re_m * 0.5]); im4 = jnp.stack([im_m, im_m * 0.5])
    y4 = istft_pallas(re4, im4, w, 1024, L, interpret=True)
    np.testing.assert_allclose(np.asarray(y4[0]), np.asarray(y_m), atol=1e-4)
