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
    with pytest.raises(ValueError, match="1-D"):
        stft_pallas(np.zeros((2, 1000), np.float32), sinebell(256), 128, interpret=True)


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
