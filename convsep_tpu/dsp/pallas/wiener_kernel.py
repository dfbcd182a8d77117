"""Fused generalized-Wiener mask+apply Pallas kernel.

SURVEY.md §2.2 #3: ``est_i = mix * y_i^p / (Σ_j y_j^p + eps)`` computed in
one VPU pass per tile — the per-source masks are never materialized in HBM
(with S sources the naive path writes/reads S mask planes; here only the
inputs and the S outputs touch HBM). Layout: sources on the leading axis so
each (frames × bins) plane is a well-tiled 2-D array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 128
_BLOCK_COLS = 128


def _kernel(y_ref, mix_re_ref, mix_im_ref, out_re_ref, out_im_ref, *, p, eps):
    # mask RATIO in f32 regardless of y's storage dtype (the bf16 mask
    # tail — same contract as models.masks.wiener_mask and the ct
    # mega-kernel, so every mask path stays equal)
    y = jnp.maximum(y_ref[:].astype(jnp.float32), 0.0)  # (S, R, C)
    yp = y if p == 1.0 else jnp.power(y, p)
    mask = yp * pl.reciprocal(jnp.sum(yp, axis=0, keepdims=True) + eps, approx=False)
    out_re_ref[:] = mask * mix_re_ref[:][None]
    out_im_ref[:] = mask * mix_im_ref[:][None]


def wiener_apply_pallas(
    y: jnp.ndarray,
    mix_re: jnp.ndarray,
    mix_im: jnp.ndarray,
    p: float = 1.0,
    eps: float = 1e-8,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """y (S, F, B) nonneg estimates + mixture re/im (F, B) →
    masked estimate re/im (S, F, B)."""
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    return _wiener_apply_impl(y, mix_re, mix_im, float(p), float(eps), bool(interpret))


@partial(jax.jit, static_argnames=("p", "eps", "interpret"))
def _wiener_apply_impl(y, mix_re, mix_im, p, eps, interpret):
    S, Fr, B = y.shape
    if mix_re.shape != (Fr, B) or mix_im.shape != (Fr, B):
        raise ValueError(f"mix {mix_re.shape} does not match y {y.shape}")
    R, C = _BLOCK_ROWS, _BLOCK_COLS
    gr, gc = -(-Fr // R), -(-B // C)
    pad_r, pad_c = gr * R - Fr, gc * C - B
    if pad_r or pad_c:
        y = jnp.pad(y, ((0, 0), (0, pad_r), (0, pad_c)))
        mix_re = jnp.pad(mix_re, ((0, pad_r), (0, pad_c)))
        mix_im = jnp.pad(mix_im, ((0, pad_r), (0, pad_c)))

    grid_spec = pl.GridSpec(
        grid=(gr, gc),
        in_specs=[
            pl.BlockSpec((S, R, C), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((S, R, C), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, R, C), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ),
    )
    out_re, out_im = pl.pallas_call(
        partial(_kernel, p=p, eps=eps),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(y.shape, jnp.float32),
            jax.ShapeDtypeStruct(y.shape, jnp.float32),
        ),
        interpret=interpret,
    )(y, mix_re, mix_im)
    if pad_r or pad_c:
        out_re = out_re[:, :Fr, :B]
        out_im = out_im[:, :Fr, :B]
    return out_re, out_im
