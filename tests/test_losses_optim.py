"""Loss and optimizer parity tests (SURVEY.md §4, §7 hard-part #5)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from convsep_tpu.train import (
    separation_loss,
    interference_matrix,
    lasagne_adadelta,
    make_optimizer,
)


def test_separation_loss_matches_manual(rng):
    est = rng.standard_normal((4, 6, 9, 3)).astype(np.float32)
    tgt = rng.standard_normal((4, 6, 9, 3)).astype(np.float32)
    w = interference_matrix(3, alpha=0.001, beta=0.01, other_idx=2, beta_voc=0.03)
    got = float(separation_loss(jnp.asarray(est), jnp.asarray(tgt), w))
    recon = sum(((est[..., i] - tgt[..., i]) ** 2).mean() for i in range(3))
    pen = sum(
        w[i, j] * ((est[..., i] - tgt[..., j]) ** 2).mean()
        for i in range(3)
        for j in range(3)
        if i != j
    )
    np.testing.assert_allclose(got, recon - pen, rtol=1e-5)


def test_interference_matrix_structure():
    w = interference_matrix(4, alpha=0.001, beta=0.01, beta_voc=0.03, vocals_idx=0, other_idx=3)
    assert np.diag(w).sum() == 0
    assert w[1, 0] == np.float32(0.03)  # targeting vocals
    assert w[0, 3] == np.float32(0.01)  # targeting other
    assert w[1, 2] == np.float32(0.001)


def test_loss_without_interference_is_mse(rng):
    est = rng.standard_normal((2, 5, 3, 2)).astype(np.float32)
    tgt = rng.standard_normal((2, 5, 3, 2)).astype(np.float32)
    got = float(separation_loss(jnp.asarray(est), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, ((est - tgt) ** 2).sum(-1).mean(), rtol=1e-5)


def _numpy_adadelta_steps(grads_seq, p0, lr=1.0, rho=0.95, eps=1e-6):
    p = p0.copy()
    accu = np.zeros_like(p)
    delta = np.zeros_like(p)
    for g in grads_seq:
        accu = rho * accu + (1 - rho) * g * g
        upd = g * np.sqrt(delta + eps) / np.sqrt(accu + eps)
        p = p - lr * upd
        delta = rho * delta + (1 - rho) * upd * upd
    return p


def test_lasagne_adadelta_matches_numpy_oracle(rng):
    p0 = rng.standard_normal(7).astype(np.float32)
    grads = [rng.standard_normal(7).astype(np.float32) for _ in range(5)]
    opt = lasagne_adadelta()
    params = jnp.asarray(p0)
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), _numpy_adadelta_steps(grads, p0), rtol=1e-5)


def test_lasagne_adadelta_agrees_with_optax(rng):
    """Document (dis)agreement with optax.adadelta under reference defaults."""
    p0 = jnp.asarray(rng.standard_normal(11).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(11).astype(np.float32))
    ours = lasagne_adadelta()
    theirs = optax.adadelta(learning_rate=1.0, rho=0.95, eps=1e-6)
    so, st = ours.init(p0), theirs.init(p0)
    po, pt = p0, p0
    for _ in range(3):
        uo, so = ours.update(g, so, po)
        po = optax.apply_updates(po, uo)
        ut, st = theirs.update(g, st, pt)
        pt = optax.apply_updates(pt, ut)
    np.testing.assert_allclose(np.asarray(po), np.asarray(pt), rtol=1e-5, atol=1e-7)


def test_make_optimizer_registry():
    import pytest

    assert make_optimizer("adam", learning_rate=1e-3) is not None
    with pytest.raises(ValueError):
        make_optimizer("nope")


def test_adadelta_trains_a_quadratic(rng):
    """Loss decreases on a toy problem (sanity of sign conventions)."""
    target = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    loss_fn = lambda p: jnp.sum((p - target) ** 2)  # noqa: E731
    opt = lasagne_adadelta()
    p = jnp.zeros(4)
    state = opt.init(p)
    l0 = float(loss_fn(p))
    for _ in range(200):
        g = jax.grad(loss_fn)(p)
        u, state = opt.update(g, state)
        p = optax.apply_updates(p, u)
    assert float(loss_fn(p)) < 0.1 * l0
