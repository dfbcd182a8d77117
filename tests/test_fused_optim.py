"""Fused single-pass Pallas adadelta vs the optax reference path.

The kernel (train/fused_optim.py) must be math-identical to
train/optim.py::lasagne_adadelta — same formulas, one HBM pass. Runs in
interpreter mode off-TPU (tests/conftest.py forces the CPU backend).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from convsep_tpu.train.fused_optim import _geometry, fused_adadelta_apply
from convsep_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    make_train_step_multi,
)
from convsep_tpu.train.optim import lasagne_adadelta

from test_train import tiny_train_preset


def _tree(key, shapes):
    ks = jax.random.split(key, len(shapes))
    return {
        f"leaf{i}": jax.random.normal(k, s, jnp.float32)
        for i, (k, s) in enumerate(zip(ks, shapes))
    }


def _reference_step(opt, params, grads, state):
    gnorm = optax.global_norm(grads)
    updates, state = opt.update(grads, state, params)
    return optax.apply_updates(params, updates), state, gnorm


def test_geometry_divides_exactly():
    for n in (1 << 20, 128 * 518400, 129600 * 128, 512 * 96):
        rows, cols, br = _geometry(n)
        assert rows * cols == n
        assert cols % 128 == 0
        assert rows % br == 0 and br % 8 == 0
    assert _geometry(7) is None
    assert _geometry(2 * 3**4 * 5**2 * 128) is None  # no sublane-multiple row divisor


def test_fused_matches_optax_mixed_leaves():
    # one kernel-eligible leaf (past min_elems), plus fallback-path leaves
    key = jax.random.PRNGKey(0)
    params = _tree(key, [(2048, 512), (7,), (50, 3), (128,)])
    opt = lasagne_adadelta()
    ref_p, ref_s = params, opt.init(params)
    cur_p, cur_s = params, opt.init(params)
    for i in range(3):  # several steps so the accumulators are nontrivial
        grads = _tree(jax.random.PRNGKey(10 + i), [(2048, 512), (7,), (50, 3), (128,)])
        ref_p, ref_s, ref_gn = _reference_step(opt, ref_p, grads, ref_s)
        cur_p, cur_s, gnorm = fused_adadelta_apply(
            cur_p, grads, cur_s, min_elems=1 << 16, interpret=True
        )
        for a, b in zip(jax.tree.leaves(cur_p), jax.tree.leaves(ref_p)):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
        for a, b in zip(jax.tree.leaves(cur_s), jax.tree.leaves(ref_s)):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)  # 1-ULP FMA jitter
        np.testing.assert_allclose(gnorm, ref_gn, rtol=1e-5)


def test_fused_train_step_equals_xla_impl():
    preset_x = tiny_train_preset(num_epochs=1)
    preset_f = dataclasses.replace(
        preset_x, train=dataclasses.replace(preset_x.train, optimizer_impl="fused")
    )
    state_x, opt_x = create_train_state(preset_x, rng=0)
    state_f, opt_f = create_train_state(preset_f, rng=0)
    step_x = make_train_step(preset_x, opt_x)
    step_f = make_train_step(preset_f, opt_f)

    cfg = preset_x.model
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (4, cfg.time_context, cfg.feat_size, cfg.channels_in))
    y = jax.random.uniform(key, (4, cfg.num_sources, cfg.time_context, cfg.feat_size))

    for _ in range(2):
        state_x, m_x = step_x(state_x, x, y)
        state_f, m_f = step_f(state_f, x, y)
    np.testing.assert_allclose(m_f["loss"], m_x["loss"], rtol=1e-6)
    np.testing.assert_allclose(m_f["grad_norm"], m_x["grad_norm"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_f.params), jax.tree.leaves(state_x.params)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_fused_multi_step_equals_xla_impl():
    preset_x = tiny_train_preset(num_epochs=1, steps_per_dispatch=3)
    preset_f = dataclasses.replace(
        preset_x, train=dataclasses.replace(preset_x.train, optimizer_impl="fused")
    )
    state_x, opt_x = create_train_state(preset_x, rng=1)
    state_f, opt_f = create_train_state(preset_f, rng=1)
    step_x = make_train_step_multi(preset_x, opt_x)
    step_f = make_train_step_multi(preset_f, opt_f)

    cfg = preset_x.model
    key = jax.random.PRNGKey(4)
    xs = jax.random.uniform(key, (3, 4, cfg.time_context, cfg.feat_size, cfg.channels_in))
    ys = jax.random.uniform(key, (3, 4, cfg.num_sources, cfg.time_context, cfg.feat_size))

    state_x, m_x = step_x(state_x, xs, ys)
    state_f, m_f = step_f(state_f, xs, ys)
    np.testing.assert_allclose(m_f["loss"], m_x["loss"], rtol=1e-6)
    np.testing.assert_allclose(m_f["grad_norm"], m_x["grad_norm"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_f.params), jax.tree.leaves(state_x.params)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    assert int(state_f.step) == int(state_x.step) == 3


def test_unknown_optimizer_impl_raises():
    import pytest

    preset = tiny_train_preset(num_epochs=1)
    bad = dataclasses.replace(
        preset, train=dataclasses.replace(preset.train, optimizer_impl="typo")
    )
    _, opt = create_train_state(bad, rng=0)
    with pytest.raises(ValueError, match="optimizer_impl"):
        make_train_step(bad, opt)

    adam = dataclasses.replace(
        preset,
        train=dataclasses.replace(preset.train, optimizer="adam", optimizer_impl="fused"),
    )
    _, opt = create_train_state(adam, rng=0)
    with pytest.raises(ValueError, match="adadelta"):
        make_train_step(adam, opt)
