"""Pallas kernel for the tied-decoder band (time) stage.

Motivation (device trace, 2026-08-17, dsd100 batched scan on a v5e): the
XLA lowering of `tied_conv_transpose_band` spends 1.38 ms/track undoing
the expansion dense's GEMM-friendly output layout (reshape.126) plus
0.72 ms/track relaying the fold into the band GEMM's preferred operand
layout (copy.50) — pure data movement around a 1.80 ms GEMM. This kernel
consumes the row-major fold directly: each grid program holds one
(time', freq', chan) slab in VMEM and accumulates the banded contraction

    out[n, w, (H, i)] = Σ_h  z[n, h, w, :] @ band[h]        (MXU, per tap)

with the full (Tp, C, T*C) band tensor VMEM-resident (≤5 MB for every
preset). The output is w-major — (N, W', T*C) — which the freq-stage
decode consumes by convolving along dim 1 (see `freq_decode_wmajor` in
models/convsep.py); no (T, F)-plane relayout of the 100 MB intermediate
ever materializes.

Inference-path only: `pallas_call` has no registered vjp here, so training
normalizes `decoder_impl="band_pallas"` back to the einsum formulation
(identical parameters and math — models/convsep.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(z_ref, band_ref, out_ref, *, Tp):
    # z_ref (1, Tp, Wp, C); band_ref (Tp, C, T*C); out_ref (1, Wp, T*C).
    # Per-tap partial matmuls (cf. stft_kernel's k partial dots): Mosaic
    # cannot rank-change vectors, so 2-D slabs via leading-index loads.
    acc = jnp.dot(
        z_ref[0, 0], band_ref[0], preferred_element_type=jnp.float32
    )
    for h in range(1, Tp):
        acc = acc + jnp.dot(
            z_ref[0, h], band_ref[h], preferred_element_type=jnp.float32
        )
    out_ref[0] = acc


def band_tensor(kernel: jnp.ndarray, time_context: int) -> jnp.ndarray:
    """(kh, 1, I, O) tied kernel → (Tp, O, T*I) banded tap tensor.

    band[h, o, H*I + i] = kernel[H-h, 0, i, o] for 0 <= H-h < kh, else 0 —
    the same contraction `tied_conv_transpose_band` builds, pre-flattened
    for the kernel's 2-D per-tap matmuls.
    """
    kh, kw, I, O = kernel.shape
    if kw != 1:
        raise ValueError(f"band decode expects a (kh, 1, I, O) kernel, got {kernel.shape}")
    T = time_context
    Tp = T - kh + 1
    hp = jnp.arange(Tp)[:, None]
    H = jnp.arange(T)[None, :]
    delta = H - hp
    valid = (delta >= 0) & (delta < kh)
    idx = jnp.clip(delta, 0, kh - 1)
    taps = kernel[:, 0].transpose(0, 2, 1)  # (kh, O, I)
    band = taps[idx] * valid[:, :, None, None].astype(kernel.dtype)  # (Tp,T,O,I)
    return band.transpose(0, 2, 1, 3).reshape(Tp, O, T * I)


@partial(jax.jit, static_argnames=("interpret",))
def _band_pallas_impl(z: jnp.ndarray, band: jnp.ndarray, interpret: bool):
    N, Tp, W, C = z.shape
    TI = band.shape[-1]
    # out-block sublane dim (W) must sit on the 8-row tile; pad on the XLA
    # side (the pad fuses into the producer's epilogue)
    Wp = -(-W // 8) * 8
    if Wp != W:
        z = jnp.pad(z, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    out = pl.pallas_call(
        partial(_kernel, Tp=Tp),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, Tp, Wp, C), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, C, TI), lambda n: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Wp, TI), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Wp, TI), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Tp * Wp * C * TI,
            bytes_accessed=z.dtype.itemsize * N * Tp * Wp * C
            + 4 * N * Wp * TI
            + band.dtype.itemsize * Tp * C * TI,
            transcendentals=0,
        ),
        interpret=interpret,
    )(z, band)
    return out[:, :W]


def band_decode_pallas(
    z: jnp.ndarray,
    kernel: jnp.ndarray,
    time_context: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(N, Tp, W, O) fold → (N, W, T*I) w-major time-stage decode.

    Same math as `tied_conv_transpose_band` with the output axes reordered
    to (w, (H, i)); `freq_decode_wmajor` consumes this layout directly.
    """
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    band = band_tensor(kernel, time_context)
    if z.dtype == jnp.float32:
        # match XLA's default-precision GEMM (operands demoted to bf16,
        # f32 accumulate): f32 MXU passes measured 1.6x slower end to end,
        # and the cast fuses into the expansion dense's epilogue
        z = z.astype(jnp.bfloat16)
    return _band_pallas_impl(z, band.astype(z.dtype), interpret)
