"""Optimizers.

Reference parity: `lasagne.updates.adadelta(loss, params, learning_rate=1.0,
rho=0.95, epsilon=1e-6)` [U] (SURVEY.md §2.1 #6, §7 hard-part #5):

    accu      <- rho * accu + (1 - rho) * g^2
    update    <- g * sqrt(delta_accu + eps) / sqrt(accu + eps)
    param     <- param - lr * update
    delta_accu<- rho * delta_accu + (1 - rho) * update^2

Implemented as a first-class optax GradientTransformation (state is a
pytree like any optax optimizer, so orbax checkpoints and pjit sharding
apply unchanged), and unit-tested against a numpy oracle and
`optax.adadelta` (tests/test_optim.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdadeltaState(NamedTuple):
    accu: optax.Updates
    delta_accu: optax.Updates


def lasagne_adadelta(
    learning_rate: float = 1.0,
    rho: float = 0.95,
    eps: float = 1e-6,
    state_dtype: str | jnp.dtype | None = None,
) -> optax.GradientTransformation:
    """Adadelta with the reference's (Lasagne) formulation and defaults.

    ``state_dtype`` stores the two accumulators in a narrower dtype
    (e.g. ``"bfloat16"``) while all update arithmetic stays float32 —
    the train step is HBM-bound on streaming accu/delta_accu over the
    265 MB fc_expand leaf (BASELINE.md 2026-08-18), so halving the
    accumulator bytes attacks the measured floor directly. None keeps
    the exact-reference float32 state.

    Long-horizon caveat (ADVICE r3): bfloat16 has an 8-bit mantissa, so a
    per-step increment smaller than ~2⁻⁹ of the running accumulator is
    rounded away — once gradients shrink far below the stored accu/
    delta_accu the accumulators stall high instead of decaying by ρ. The
    committed checks cover short horizons (5/200 steps, ≤2e-5 rel loss
    drift) plus a 2000-step decay-tracking bound (tests/test_losses_optim
    ::test_bf16_state_long_horizon_decay). For 10⁵+-step production runs
    keep float32 state, or watch val-SDR in the soak harness and switch if
    it drifts; narrowing only delta_accu (accu f32) or stochastic rounding
    are the follow-on options if this knob ever matters at that scale."""
    sdt = jnp.dtype(state_dtype) if state_dtype is not None else None

    def _store(x):
        return x if sdt is None else x.astype(sdt)

    def init_fn(params):
        zeros = lambda p: jnp.zeros(p.shape, sdt or p.dtype)  # noqa: E731
        return AdadeltaState(
            accu=jax.tree.map(zeros, params),
            delta_accu=jax.tree.map(zeros, params),
        )

    def update_fn(grads, state, params=None):
        del params
        accu = jax.tree.map(
            lambda a, g: rho * a.astype(g.dtype) + (1 - rho) * g * g,
            state.accu,
            grads,
        )
        updates = jax.tree.map(
            lambda g, d, a: g * jnp.sqrt(d.astype(g.dtype) + eps)
            / jnp.sqrt(a + eps),
            grads,
            state.delta_accu,
            accu,
        )
        # materialize `updates` once: without the barrier XLA rematerializes
        # it inside the param-apply fusion, which keeps delta_accu live past
        # the delta_accu' write and forces a full aliasing copy of the
        # biggest leaf (identity math; dsd100 B=32 step 10.44 → 9.27 ms on
        # the v5e, 2026-08-18)
        updates = jax.lax.optimization_barrier(updates)
        delta_accu = jax.tree.map(
            lambda d, u: _store(rho * d.astype(u.dtype) + (1 - rho) * u * u),
            state.delta_accu,
            updates,
        )
        scaled = jax.tree.map(lambda u: -learning_rate * u, updates)
        return scaled, AdadeltaState(
            accu=jax.tree.map(_store, accu), delta_accu=delta_accu
        )

    return optax.GradientTransformation(init_fn, update_fn)


_REGISTRY = {
    "adadelta": lasagne_adadelta,
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
}


def make_optimizer(name: str = "adadelta", **kwargs) -> optax.GradientTransformation:
    """Named optimizer factory; 'adadelta' is the reference-parity default."""
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown optimizer {name!r}; have {sorted(_REGISTRY)}") from None
    return factory(**kwargs)
