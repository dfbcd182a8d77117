"""Wiener mask unit tests vs numpy oracle (SURVEY.md §4 'Unit: mask math')."""

import numpy as np
import jax.numpy as jnp

from convsep_tpu.models.masks import wiener_mask, wiener_filter
from tests.oracles import wiener_np


def test_wiener_filter_matches_oracle(rng):
    y = np.abs(rng.standard_normal((6, 30, 513, 4))).astype(np.float32)
    mix = np.abs(rng.standard_normal((6, 30, 513))).astype(np.float32)
    for p in (1.0, 2.0):
        got = np.asarray(wiener_filter(jnp.asarray(y), jnp.asarray(mix), p=p))
        np.testing.assert_allclose(got, wiener_np(y, mix, p=p), rtol=2e-5, atol=1e-6)


def test_mask_sums_below_one(rng):
    y = np.abs(rng.standard_normal((8, 16, 4))).astype(np.float32)
    m = np.asarray(wiener_mask(jnp.asarray(y)))
    assert (m >= 0).all()
    s = m.sum(axis=-1)
    assert (s <= 1.0 + 1e-6).all()


def test_mask_eps_behavior_all_zero_sources():
    y = np.zeros((4, 8, 3), np.float32)
    m = np.asarray(wiener_mask(jnp.asarray(y)))
    assert np.isfinite(m).all() and (m == 0).all()


def test_negative_inputs_clamped():
    y = np.array([[-1.0, 2.0]], np.float32)
    m = np.asarray(wiener_mask(jnp.asarray(y)))
    np.testing.assert_allclose(m[0, 0], 0.0)
    assert m[0, 1] > 0.99


def test_complex_mixture_preserves_phase(rng):
    """Real mask × complex mix == masked magnitude with mixture phase."""
    y = np.abs(rng.standard_normal((5, 9, 2))).astype(np.float32)
    mix = (rng.standard_normal((5, 9)) + 1j * rng.standard_normal((5, 9))).astype(np.complex64)
    est = np.asarray(wiener_filter(jnp.asarray(y), jnp.asarray(mix)))
    mask = wiener_np(y, np.ones((5, 9), np.float32))
    np.testing.assert_allclose(est, mask * mix[..., None], rtol=1e-5, atol=1e-6)


def test_wiener_mask_conserve_last_sums_to_one():
    import numpy as np
    import jax.numpy as jnp
    from convsep_tpu.models.masks import wiener_mask

    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.standard_normal((4, 7, 9)).astype(np.float32))
    # plain: sums to < 1 (ReLU-dead bins leak through the eps denominator)
    plain = wiener_mask(y, axis=0)
    cons = wiener_mask(y, axis=0, conserve_last=True)
    np.testing.assert_allclose(np.asarray(cons.sum(0)), 1.0, atol=1e-6)
    # non-last sources are unchanged; the shortfall all lands on the last
    np.testing.assert_allclose(np.asarray(cons[:-1]), np.asarray(plain[:-1]))
    assert (np.asarray(cons[-1]) >= np.asarray(plain[-1]) - 1e-7).all()
    # trailing-axis convention too
    cons_t = wiener_mask(y.transpose(1, 2, 0), axis=-1, conserve_last=True)
    np.testing.assert_allclose(np.asarray(cons_t.sum(-1)), 1.0, atol=1e-6)
