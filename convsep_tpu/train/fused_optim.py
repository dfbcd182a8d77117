"""Single-pass fused adadelta update as a Pallas TPU kernel.

The XLA lowering of the reference adadelta formulation (train/optim.py,
`lasagne.updates.adadelta` parity [U], SURVEY.md §2.1 #6) splits the update
into three fusions over each parameter leaf — accu'+updates, delta_accu',
param apply — plus a separate `optax.global_norm` read of the gradients:
~11 HBM passes per leaf, ~4 ms/step of pure bandwidth on the dsd100
preset's 332 MB of dense weights (BASELINE.md 2026-08-18 rows). This
kernel does the whole update in ONE pass per leaf:

    reads  p, g, accu, delta_accu          (4 passes)
    writes p', accu', delta_accu'          (3 passes, aliased in place)

with the intermediate `update` living only in VMEM (the optimization
barrier the XLA path needs to avoid a 265 MB aliasing copy is moot here),
and the grad-norm square-sum accumulated for free into an SMEM scalar
while `g` is resident (saves `global_norm`'s extra read of every leaf).

**Measured outcome (v5e, 2026-08-18): the XLA path wins — this kernel is
a pinned decision record, selectable but not the default.** dsd100 B=32
step: xla 9.78 ms vs fused 27.6 ms. Two reasons (docs/PALLAS_PROFILE.md
addendum 8): (a) the `expand_pad="output"` training rewrite already lets
XLA fuse the adadelta accumulation into the dW GEMM epilogue, so the
"extra passes" this kernel removes don't exist in the production step;
(b) Mosaic's 16 MB scoped-VMEM stack caps the 14 double-buffered block
refs at ~1 MB each, and the isolated kernel reaches only ~265 GB/s of
DMA throughput vs the XLA fusion's ~450 GB/s (update-only microbench:
xla 6.5 ms vs pallas 10.7 ms on the 265 MB fc_expand leaf).

Leaves too small or oddly shaped for the kernel fall back to the exact
same jnp formulas — the math is identical everywhere (equality-tested
against the optax path in tests/test_fused_optim.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convsep_tpu.train.optim import AdadeltaState

# Kernel engages only on leaves at least this many elements (the dispatch
# overhead of a per-leaf pallas_call is not worth paying on biases).
_MIN_ELEMS = 1 << 20
_MAX_BLOCK_ROWS = 512


def _geometry(n: int) -> tuple[int, int, int] | None:
    """n elements → (rows, cols, block_rows) with cols a lane multiple,
    block_rows a sublane multiple that divides rows exactly (so the grid
    never over-runs the array and the SMEM grad-norm sum stays exact)."""
    for cols in (512, 256, 128):
        if n % cols:
            continue
        rows = n // cols
        for br in range(min(_MAX_BLOCK_ROWS, rows), 7, -8):
            if rows % br == 0:
                return rows, cols, br
    return None


def _kernel(p_ref, g_ref, a_ref, d_ref, p_out, a_out, d_out, sq_ref, *, lr, rho, eps):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        sq_ref[0, 0] = 0.0

    g = g_ref[:]
    a = rho * a_ref[:] + (1.0 - rho) * g * g
    # same op sequence as train/optim.py so results match bit-for-bit
    u = g * jnp.sqrt(d_ref[:] + eps) / jnp.sqrt(a + eps)
    a_out[:] = a
    d_out[:] = rho * d_ref[:] + (1.0 - rho) * u * u
    p_out[:] = p_ref[:] - lr * u
    sq_ref[0, 0] += jnp.sum(g * g)


def _leaf_pallas(p, g, a, d, lr, rho, eps, interpret):
    rows, cols, br = _geometry(p.size)
    shape = p.shape
    p, g, a, d = (t.reshape(rows, cols) for t in (p, g, a, d))
    spec = pl.BlockSpec((br, cols), lambda i: (i, 0))
    f32 = jax.ShapeDtypeStruct((rows, cols), jnp.float32)
    p2, a2, d2, sq = pl.pallas_call(
        partial(_kernel, lr=lr, rho=rho, eps=eps),
        grid=(rows // br,),
        in_specs=[spec] * 4,
        out_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[f32, f32, f32, jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        input_output_aliases={0: 0, 2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(p, g, a, d)
    return p2.reshape(shape), a2.reshape(shape), d2.reshape(shape), sq[0, 0]


def _leaf_jnp(p, g, a, d, lr, rho, eps):
    a2 = rho * a + (1.0 - rho) * g * g
    u = g * jnp.sqrt(d + eps) / jnp.sqrt(a2 + eps)
    d2 = rho * d + (1.0 - rho) * u * u
    return p - lr * u, a2, d2, jnp.sum(g * g)


def fused_adadelta_apply(
    params,
    grads,
    state: AdadeltaState,
    learning_rate: float = 1.0,
    rho: float = 0.95,
    eps: float = 1e-6,
    *,
    min_elems: int = _MIN_ELEMS,
    interpret: bool | None = None,
):
    """(params, grads, AdadeltaState) → (params', AdadeltaState', grad_norm),
    the whole adadelta step in one HBM pass per large leaf."""
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()

    p_leaves, treedef = jax.tree.flatten(params)
    g_leaves = treedef.flatten_up_to(grads)
    a_leaves = treedef.flatten_up_to(state.accu)
    d_leaves = treedef.flatten_up_to(state.delta_accu)

    new_p, new_a, new_d, sqs = [], [], [], []
    for p, g, a, d in zip(p_leaves, g_leaves, a_leaves, d_leaves):
        fuse = (
            p.dtype == jnp.float32
            and p.size >= min_elems
            and _geometry(p.size) is not None
        )
        fn = partial(_leaf_pallas, interpret=interpret) if fuse else _leaf_jnp
        p2, a2, d2, sq = fn(p, g, a, d, learning_rate, rho, eps)
        new_p.append(p2)
        new_a.append(a2)
        new_d.append(d2)
        sqs.append(sq)

    gnorm = jnp.sqrt(sum(sqs))
    unflatten = treedef.unflatten
    return unflatten(new_p), AdadeltaState(unflatten(new_a), unflatten(new_d)), gnorm
