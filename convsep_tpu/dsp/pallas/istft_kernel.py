"""Fused inverse-DFT + windowed overlap-add Pallas kernel.

SURVEY.md §2.2 #2: the scatter-free TPU overlap-add. Each grid program
takes an R-frame block of (re, im) spectra, runs the window-folded inverse
DFT on the MXU (dsp/dft.py matrices), and overlap-adds *locally* in VMEM —
the (n_frames × win_length) inverse-frame array never exists in HBM. A
frame block of R frames covers R+k-1 output hop-blocks; the R interior
blocks are this program's exclusive output rows, and the k-1 trailing
blocks that overlap the next program's region are emitted as a separate
per-program `spill` output, folded in afterwards with one shifted add (no
scatter, no cross-program races).

Requires win_length % hop == 0 (all presets; the jnp paths cover the rest).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convsep_tpu.dsp.dft import _inverse_mats, _key
from convsep_tpu.dsp.istft import ola_norm
from convsep_tpu.dsp.stft import num_frames

_BLOCK_FRAMES = 16


def _kernel(re_ref, im_ref, inv_a_ref, inv_b_ref, body_ref, spill_ref, *, R, H, k, W):
    # compute stays 2-D (Mosaic kernels must avoid rank-changing vector
    # reshapes); the batch axis is block dim 0 of size 1
    frames = jnp.dot(
        re_ref[0], inv_a_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + jnp.dot(
        im_ref[0], inv_b_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, W)
    # local OLA over R+k-1 hop blocks: out[j] = sum_i frames[j-i, i*H:(i+1)*H].
    # acc is padded to R+8 rows so the spill block is a full aligned 8-row
    # tile (Mosaic requires block dims divisible by (8, 128)); rows beyond
    # k-1 stay zero.
    # shifted pad-and-adds (`.at[].add` would lower to scatter-add, which
    # Mosaic does not implement)
    acc = jnp.zeros((R + 8, H), jnp.float32)
    for i in range(k):
        acc = acc + jnp.pad(frames[:, i * H : (i + 1) * H], ((i, 8 - i), (0, 0)))
    body_ref[0] = acc[:R]
    spill_ref[0] = acc[R : R + 8]


def _kernel_big(re_ref, im_ref, inv_a_ref, inv_b_ref, body_ref, spill_ref, acc, *, R, H, k, W, WB):
    """Large-window variant: the W (synthesis-sample) axis is chunked into
    WB-wide column blocks so the inverse-DFT matrix blocks fit VMEM. The
    hop-block row shift becomes a dynamic roll; chunk column offsets are
    WB-aligned dynamic lane slices into the (R+8, H) accumulator."""
    c = pl.program_id(2)
    i = c * WB // H  # hop block this chunk belongs to (WB divides H)
    o = pl.multiple_of((c * WB) % H, WB)
    f = jnp.dot(
        re_ref[0], inv_a_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + jnp.dot(
        im_ref[0], inv_b_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, WB)
    fpad = jnp.pad(f, ((0, 8), (0, 0)))  # (R+8, WB), zeros wrap harmlessly
    shifted = pltpu.roll(fpad, shift=i, axis=0)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:, pl.ds(o, WB)] += shifted

    @pl.when(c == pl.num_programs(2) - 1)
    def _():
        body_ref[0] = acc[:R]
        spill_ref[0] = acc[R : R + 8]


@partial(jax.jit, static_argnames=("hop", "length", "win_len", "nfft", "interpret"))
def _istft_pallas_impl(re, im, inv_a, inv_b, inv_norm, hop, length, win_len, nfft, interpret):
    """re/im: (N, nf, bins) — the batch rides a leading grid axis."""
    H, W = hop, win_len
    k = W // H
    N, nf, bins = re.shape
    # fast path: both (bins, W) inverse matrices resident in VMEM; large
    # windows (4096-pt: 67 MB of matrices) switch to the chunked kernel
    if 2 * bins * W * 4 <= 8_000_000:
        return _istft_small(re, im, inv_a, inv_b, inv_norm, hop, length, win_len, interpret)
    R = 64  # more frames per block amortizes re-fetching the matrix chunks
    n_blocks = -(-nf // R)
    pad_f = n_blocks * R - nf
    if pad_f:
        re = jnp.pad(re, ((0, 0), (0, pad_f), (0, 0)))
        im = jnp.pad(im, ((0, 0), (0, pad_f), (0, 0)))
    WB = 256  # block fits VMEM incl. pallas double-buffering of pipelined inputs
    assert H % WB == 0 and W % WB == 0, (H, W, WB)
    n_c = W // WB

    body, spill = pl.pallas_call(
        partial(_kernel_big, R=R, H=H, k=k, W=W, WB=WB),
        grid=(N, n_blocks, n_c),
        in_specs=[
            pl.BlockSpec((1, R, bins), lambda b, j, c: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, bins), lambda b, j, c: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, WB), lambda b, j, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, WB), lambda b, j, c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, R, H), lambda b, j, c: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, H), lambda b, j, c: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, n_blocks * R, H), jnp.float32),
            jax.ShapeDtypeStruct((N, n_blocks * 8, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((R + 8, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * N * n_blocks * R * W * bins,
            bytes_accessed=4 * (2 * N * n_blocks * R * bins + 2 * N * n_blocks * bins * W + N * n_blocks * R * H),
            transcendentals=0,
        ),
        interpret=interpret,
    )(re, im, inv_a, inv_b)
    return _fold_spill(body, spill, inv_norm, N, n_blocks, R, nf, H, W, k, hop, length)


def _istft_small(re, im, inv_a, inv_b, inv_norm, hop, length, win_len, interpret):
    H, W = hop, win_len
    k = W // H
    N, nf, bins = re.shape
    R = _BLOCK_FRAMES
    n_blocks = -(-nf // R)
    pad_f = n_blocks * R - nf
    if pad_f:
        re = jnp.pad(re, ((0, 0), (0, pad_f), (0, 0)))
        im = jnp.pad(im, ((0, 0), (0, pad_f), (0, 0)))

    body, spill = pl.pallas_call(
        partial(_kernel, R=R, H=H, k=k, W=W),
        grid=(N, n_blocks),
        in_specs=[
            pl.BlockSpec((1, R, bins), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, bins), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, W), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, W), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, R, H), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, H), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, n_blocks * R, H), jnp.float32),
            jax.ShapeDtypeStruct((N, n_blocks * 8, H), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * N * n_blocks * R * W * bins,
            bytes_accessed=4 * (2 * N * n_blocks * R * bins + 2 * bins * W + N * n_blocks * R * H),
            transcendentals=0,
        ),
        interpret=interpret,
    )(re, im, inv_a, inv_b)
    return _fold_spill(body, spill, inv_norm, N, n_blocks, R, nf, H, W, k, hop, length)


def _fold_spill(body, spill, inv_norm, N, n_blocks, R, nf, H, W, k, hop, length):
    # fold each program's spill into the head of the next program's body
    # (reshapes below run in XLA, outside the Mosaic kernel)
    spill_rows = spill.reshape(N, n_blocks, 8, H)[:, :, : k - 1, :]
    pad_spill = jnp.pad(spill_rows, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
    body = body.reshape(N, n_blocks, R, H)
    body = body.at[:, :, : k - 1, :].add(pad_spill)
    data = body.reshape(N, n_blocks * R * H)
    # the final spill extends past the last body block
    tail = spill_rows[:, -1].reshape(N, -1)
    data = jnp.concatenate([data, tail], axis=-1)
    total = (nf - 1) * H + W
    data = data[:, :total] * inv_norm
    front = W // 2
    return data[:, front : front + length].astype(jnp.float32)


def istft_pallas(
    re: jnp.ndarray,
    im: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    length: int,
    analysis_window: np.ndarray | None = None,
    nfft: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(nf, bins)×2 → (length,) via the fused Pallas kernel; matches
    dsp.dft.istft_matmul. Accepts (nf, bins) or batched (N, nf, bins) —
    the batch (e.g. the sources axis) rides a leading kernel grid axis."""
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if re.ndim not in (2, 3):
        raise ValueError(f"istft_pallas expects (frames, bins) or (N, frames, bins), got {re.shape}")
    if win_len % hop != 0:
        raise ValueError(f"pallas istft requires win % hop == 0, got {win_len}/{hop}")
    if win_len // hop > 9:
        raise ValueError("pallas istft supports win/hop ratios up to 9 (8-row spill tile)")
    if analysis_window is None:
        analysis_window = window
    if nfft is None:
        nfft = 2 * (int(re.shape[-1]) - 1)
    expect = num_frames(length, hop)
    if int(re.shape[-2]) != expect:
        raise ValueError(
            f"re/im have {re.shape[-2]} frames but length={length}, hop={hop} implies {expect}"
        )
    inv_a, inv_b = _inverse_mats(nfft, win_len, _key(window))
    inv_norm = 1.0 / ola_norm(
        window.astype(np.float32), np.asarray(analysis_window, np.float32), int(hop), expect
    )
    batched = re.ndim == 3
    re3 = jnp.asarray(re, jnp.float32)
    im3 = jnp.asarray(im, jnp.float32)
    if not batched:
        re3, im3 = re3[None], im3[None]
    out = _istft_pallas_impl(
        re3,
        im3,
        jnp.asarray(inv_a),
        jnp.asarray(inv_b),
        jnp.asarray(inv_norm),
        int(hop),
        int(length),
        win_len,
        int(nfft),
        interpret,
    )
    return out if batched else out[0]
