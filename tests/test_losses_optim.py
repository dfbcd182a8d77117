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


def test_adadelta_bf16_state_tracks_oracle(rng):
    """bfloat16 accumulator STORAGE (TrainConfig.optimizer_state_dtype):
    update math stays float32, so a few steps stay close to the float32
    oracle — within bf16's ~2^-8 relative storage error, far tighter than
    the loose bound asserted here."""
    p0 = rng.standard_normal(64).astype(np.float32)
    grads = [rng.standard_normal(64).astype(np.float32) for _ in range(5)]
    opt = lasagne_adadelta(state_dtype="bfloat16")
    params = jnp.asarray(p0)
    state = opt.init(params)
    assert state.accu.dtype == jnp.bfloat16
    assert state.delta_accu.dtype == jnp.bfloat16
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state)
        assert updates.dtype == jnp.float32  # math dtype, not storage
        assert state.accu.dtype == jnp.bfloat16
        params = optax.apply_updates(params, updates)
    oracle = _numpy_adadelta_steps(grads, p0)
    np.testing.assert_allclose(np.asarray(params), oracle, rtol=0.05, atol=5e-3)
    # and it is genuinely the storage that narrowed, not a no-op knob
    assert np.abs(np.asarray(params) - oracle).max() > 0


def test_adadelta_bf16_state_trains_a_quadratic(rng):
    target = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    loss_fn = lambda p: jnp.sum((p - target) ** 2)  # noqa: E731
    opt = lasagne_adadelta(state_dtype="bfloat16")
    p = jnp.zeros(4)
    state = opt.init(p)
    l0 = float(loss_fn(p))
    for _ in range(200):
        g = jax.grad(loss_fn)(p)
        u, state = opt.update(g, state)
        p = optax.apply_updates(p, u)
    assert float(loss_fn(p)) < 0.1 * l0


def test_optimizer_state_dtype_preset_wiring():
    """create_train_state honors TrainConfig.optimizer_state_dtype and the
    fused Pallas impl refuses narrowed state."""
    import dataclasses

    import pytest

    from convsep_tpu.configs.presets import TransformConfig, get_preset
    from convsep_tpu.train.loop import _preset_apply_fn, create_train_state

    p = get_preset("ikala")
    t = TransformConfig(fs=8000, frame_size=256, hop_size=128)
    model = dataclasses.replace(
        p.model, time_context=10, feat_size=t.bins, conv1_filters=4,
        conv1_freq=8, conv2_filters=4, bottleneck=16,
    )
    preset = dataclasses.replace(
        p,
        transform=t,
        model=model,
        train=dataclasses.replace(
            p.train, optimizer_state_dtype="bfloat16", time_context=10
        ),
    )
    state, opt = create_train_state(preset, 0)
    leaves = jax.tree.leaves(state.opt_state)
    assert leaves and all(l.dtype == jnp.bfloat16 for l in leaves)
    fused = dataclasses.replace(
        preset,
        train=dataclasses.replace(preset.train, optimizer_impl="fused"),
    )
    with pytest.raises(ValueError, match="optimizer_state_dtype"):
        _preset_apply_fn(fused)
    non_ada = dataclasses.replace(
        preset,
        train=dataclasses.replace(preset.train, optimizer="adam"),
    )
    with pytest.raises(ValueError, match="adadelta"):
        create_train_state(non_ada, 0)
