"""Fused Mosaic decode kernel: expansion GEMM → ReLU → composed band GEMM
→ tap fold, one VMEM pass (decoder_impl="bandconv_pallas").

Why (trace 2026-08-19, highres4096 batch16): the XLA bandconv chain
materializes the ~1.3 GB (bf16) per-source expansion in HBM, relayouts it
twice for the conv emitter (EmitInputBatchInLanes — the composed conv has
only T·M = 120 output-channel lanes), and pays ~31 ms/batch across
fc_expand GEMM (4.6) + ReLU/relayout copies (~12) + conv (14.5). None of
those tensors need to exist: per (source, w-chunk, row-chunk) the chain is

    e = relu(fc @ K4[s, w] + b[s, w])        # (BB, Tp·C2)
    g = e @ Kcat                             # (BB, ktaps·128)
    out[rows, w+i] += g[:, i·128:(i+1)·128]  # tap fold, i = ktaps−1−τ

with every operand VMEM-resident. HBM traffic drops to one read of the
expansion kernel per row-block (the 414 MB K4 streams, overlapped with
compute) + the fc rows + one write of the (…, 128)-padded decode output.

Fold-boundary design mirrors dsp/pallas/ct_istft_kernel.py: the w-grid is
the minor axis, a grid-persistent carry scratch folds each block's last
ktaps−1 rows into the next block (reset at w-block 0, so source/row grid
axes stay parallel-safe), and the *final* block's spill is provably
discardable because W is padded so that W_pad − W ≥ ktaps − 1 (the padded
expansion columns are exact zeros) — `_phase_merge_tail` slices the valid
full-conv extent anyway.

Reference parity: identical math to decoder_impl="bandconv"
(`band_freq_conv_kernel` composition of the tied InverseLayer decode,
SURVEY.md §2.1 #5); interpret-mode equality tests in
tests/test_decoder_fused_pallas.py. Inference-only (no custom vjp):
`trainable_config` swaps it for "bandconv".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WB = 8          # w rows per grid block (one sublane tile of the K4 slice)
_BB = 200        # fc rows per grid block (VMEM budget; multiple of 8)
_SPILL_MAX = 16  # carry-row ceiling; requires ktaps - 1 <= 16


def w_pad_rows(W: int, ktaps: int) -> int:
    """Padded w rows: w-blocks tile exactly AND the final block's spill
    lands on zero-expansion rows (W_pad − W ≥ ktaps − 1)."""
    return -(-(W + ktaps - 1) // _WB) * _WB


def _spill_rows(ktaps: int) -> int:
    """Carry rows for a tap count, rounded to a sublane tile (8).

    A spill window LARGER than the w-block (_WB = 8) is sound: the fold
    adds the previous carry into acc[0:spill] BEFORE the new carry is
    captured from acc[WB:WB+spill], and the two regions overlap on rows
    [WB, spill) — contributions destined two blocks ahead ride through the
    carry twice (r4, extends the envelope from ktaps ≤ 9 to ktaps ≤ 17;
    dsd100-class ktaps = 10)."""
    return max(8, -(-(ktaps - 1) // 8) * 8)


def fused_decode_supported(TpC: int, TM: int, ktaps: int) -> bool:
    """Shapes the kernel handles well; callers fall back to "bandconv".

    TM (= T·M out-dims per tap) pads to a multiple of 128 lanes — below
    ~90 the MXU pad waste outweighs the fusion (ikala-class TM=30 would
    waste 4×); above 384 the per-tap accumulator outgrows the VMEM budget.

    The lane-pad bound is MEASURED, not guessed: at TMp/TM = 128/90 = 1.42
    (dsd100 geometry, ktaps = 10) the compiled kernel is exact but ~1.18×
    SLOWER than the XLA bandconv chain at b32 (5.20 vs 4.41 ms/track,
    v5e 2026-08-20 — BASELINE.md decision record), while at 1.07
    (highres/multires, TM = 120/360) it wins. Bound set at 1.25 so "auto"
    only ever picks the winning branch.
    """
    if not (ktaps - 1 <= _SPILL_MAX and TpC % 8 == 0 and 90 <= TM <= 384):
        return False
    TMp = -(-TM // 128) * 128
    return TMp / TM <= 1.25


def _kernel(fc_ref, k4_ref, b_ref, kcat_ref, out_ref, acc, carry,
            *, WB, ktaps, TMp, dt, spill):
    """One (source s, row-block bb, w-block wb) step."""
    acc[:] = jnp.zeros_like(acc)
    fc = fc_ref[:]
    for w in range(WB):
        e = jax.lax.dot_general(
            fc, k4_ref[:, 0, w, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jnp.maximum(e + b_ref[0, w, :][None, :], 0.0).astype(dt)
        g = jax.lax.dot_general(
            e, kcat_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BB, ktaps·TMp); tap column blocks pre-reversed so block i
        # contributes to output row w + i (lane split at 128-multiples)
        g3 = g.reshape(g.shape[0], ktaps, TMp)
        acc[:, w:w + ktaps] += g3
    # fold the previous w-block's spill (same (s, bb): the w axis is the
    # minor grid dim and carry resets at wb == 0). Must precede the carry
    # capture below — when spill > WB the regions overlap and the fold's
    # writes to rows [WB, spill) are re-captured for the block after next.
    @pl.when(pl.program_id(2) != 0)
    def _fold():
        acc[:, 0:spill] += carry[:]

    carry[:] = acc[:, WB:WB + spill]
    # out_ref dtype = mask_dtype: a bf16 mask tail halves the kernel's
    # dominant HBM write and every downstream layout pass over it
    out_ref[:, 0] = acc[:, :WB, :out_ref.shape[-1]].astype(out_ref.dtype)


def band_freq_decode_pallas(
    fc: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    KC: jnp.ndarray,
    ktaps: int,
    S: int,
    W: int,
    TpC: int,
    dt,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> tuple[jnp.ndarray, int]:
    """fc (B, J) → decode output (B, S, W_pad, T·M) ≡ the bandconv conv
    output rows [0, W_pad) (its final ktaps−1 rows are the discardable
    full-conv tail).

    `kernel`/`bias`: the fc_expand params ((J, S·W·TpC), (S·W·TpC,));
    `KC`: (ktaps, 1, TpC, T·M) from band_freq_conv_kernel.
    """
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    B, J = fc.shape
    TM = KC.shape[3]
    if not fused_decode_supported(TpC, TM, ktaps):
        raise ValueError(
            f"band_freq_decode_pallas unsupported for TpC={TpC} TM={TM} "
            f"ktaps={ktaps}"
        )
    # pad W so the final block's spill lands on zero-expansion rows
    # (W_pad − W ≥ ktaps − 1) and w-blocks tile exactly
    W_pad = w_pad_rows(W, ktaps)
    if kernel.ndim == 4:
        # pre-prepared leaf (prepare_inference): already (J, S, W_pad,
        # TpC) in compute dtype — no per-dispatch relayout/pad passes
        if kernel.shape != (J, S, W_pad, TpC):
            raise ValueError(
                f"prepared fc_expand kernel {kernel.shape} != "
                f"{(J, S, W_pad, TpC)}"
            )
        k4 = kernel.astype(dt)
    else:
        k4 = kernel.astype(dt).reshape(J, S, W, TpC)
        if W_pad != W:
            k4 = jnp.pad(k4, ((0, 0), (0, 0), (0, W_pad - W), (0, 0)))
    b3 = bias.astype(jnp.float32).reshape(S, W, TpC)
    if W_pad != W:
        b3 = jnp.pad(b3, ((0, 0), (0, W_pad - W), (0, 0)))
    # tap-reversed, lane-tile-padded composed decode matrix: column block i
    # holds tap τ = ktaps−1−i, so g.reshape(BB, ktaps, TMp)[:, i] adds to
    # output row w + i with no flip in the kernel
    TMp = -(-TM // 128) * 128
    kcat = jnp.pad(
        KC[::-1, 0].transpose(1, 0, 2), ((0, 0), (0, 0), (0, TMp - TM))
    ).reshape(TpC, ktaps * TMp).astype(dt)
    # largest multiple-of-8 row block ≤ the VMEM-scaled budget that divides
    # the padded rows — an exact divisor avoids both pad-row compute and
    # the output row slice (B = 784 → BB = 112, not 200); wider TMp
    # accumulators shrink the row budget proportionally
    bb_max = max(8, (_BB * 128 // TMp) // 8 * 8)
    B8 = -(-B // 8) * 8
    BB = next(
        (b for b in range(min(bb_max, B8), 7, -8) if B8 % b == 0),
        min(bb_max, B8),
    )
    n_bb = -(-B8 // BB)
    B_pad = n_bb * BB
    fcp = fc.astype(dt)
    if B_pad != B:
        fcp = jnp.pad(fcp, ((0, B_pad - B), (0, 0)))
    n_wb = W_pad // _WB
    spill = _spill_rows(ktaps)
    out = pl.pallas_call(
        partial(_kernel, WB=_WB, ktaps=ktaps, TMp=TMp, dt=dt, spill=spill),
        grid=(S, n_bb, n_wb),
        in_specs=[
            pl.BlockSpec((BB, J), lambda s, bb, wb: (bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 1, _WB, TpC), lambda s, bb, wb: (0, s, wb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WB, TpC), lambda s, bb, wb: (s, wb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kcat.shape, lambda s, bb, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, 1, _WB, TM),
                               lambda s, bb, wb: (bb, s, wb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, S, W_pad, TM), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((BB, _WB + spill, TMp), jnp.float32),
            pltpu.VMEM((BB, spill, TMp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * B_pad * W_pad * (J * TpC + TpC * ktaps * TMp),
            bytes_accessed=(
                n_bb * k4.size * k4.dtype.itemsize
                + S * n_wb * B_pad * J * 2
                + B_pad * S * W_pad * TM * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(fcp, k4, b3, kcat)
    return (out if B_pad == B else out[:B]), W_pad
