"""Fused framing + windowed-DFT Pallas kernel.

SURVEY.md §2.2 #1: the TPU-native replacement for the reference's
`stft_norm` hot loop. Each grid program DMAs one contiguous signal chunk
HBM→VMEM, builds its block of overlapping frames with static hop-slices
(VPU, in registers — the (n_frames × win_length) frames array is NEVER
materialized in HBM, saving ~2× win_length/hop of the signal's bytes in
HBM traffic), and feeds the MXU with the window-folded DFT matrices from
dsp/dft.py, emitting (frames, bins) real/imag float32 blocks.

Requirements: win_length % hop == 0 (all presets satisfy this; dsp.stft's
gather path covers the rest). The signal must be pre-padded with the
reference's front/back padding — `stft_pallas` handles that and matches
`dsp.dft.stft_matmul` bit-for-bit in its matmul ordering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convsep_tpu.dsp.dft import _forward_mats, _key
from convsep_tpu.dsp.stft import _pad_signal, num_frames

# frames per grid program; multiple of 8 for f32 sublane tiling
_BLOCK_FRAMES = 16


def _kernel(sig_hbm, cos_ref, sin_ref, re_ref, im_ref, scratch, sem, *, R, H, k, W):
    # signal arrives hop-blocked 3-D (batch, n_blocks_total, H): Mosaic
    # kernels must avoid rank-changing vector reshapes, so compute stays 2-D.
    # grid is (B, n_cbins, n_blocks): the frame axis is innermost so each
    # (W, CB) DFT-matrix column block is DMA'd once per c step, not per
    # frame block; the signal chunk is small and re-fetched per step.
    b = pl.program_id(0)
    j = pl.program_id(2)
    start = j * R
    # rows covering R overlapping frames: frame r = rows [r, r+k).
    # DMA row counts must align to the 8-row sublane tile, so the halo is
    # rounded up (EXTRA) and the signal pre-padded accordingly.
    extra = -(-(k - 1) // 8) * 8
    dma = pltpu.make_async_copy(sig_hbm.at[b, pl.ds(start, R + extra), :], scratch, sem)
    dma.start()
    dma.wait()
    blocks = scratch[:]
    # frames @ DFT == sum_i blocks[i:i+R] @ DFT[i*H:(i+1)*H] — k partial
    # matmuls instead of materializing frames (Mosaic also cannot concat
    # slices with mismatched sublane offsets)
    re = jnp.zeros(re_ref.shape[1:], jnp.float32)
    im = jnp.zeros(im_ref.shape[1:], jnp.float32)
    for i in range(k):
        rows = blocks[i : i + R]
        re = re + jnp.dot(rows, cos_ref[i * H : (i + 1) * H, :], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        im = im + jnp.dot(rows, sin_ref[i * H : (i + 1) * H, :], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    re_ref[0] = re
    im_ref[0] = im


@partial(jax.jit, static_argnames=("hop", "nfft", "win_len", "n_frames", "interpret"))
def _stft_pallas_impl(padded, cos_m, sin_m, hop, nfft, win_len, n_frames, interpret):
    """padded: (B, padded_len) — batch rides a leading grid axis."""
    H, W = hop, win_len
    k = W // H
    R = _BLOCK_FRAMES
    n_blocks = -(-n_frames // R)  # cdiv
    bins = nfft // 2 + 1
    B = padded.shape[0]
    # pad the signal so the last program's chunk is in-bounds, then
    # hop-block it to 3-D on the XLA side (free reshape there)
    extra = -(-(k - 1) // 8) * 8  # DMA halo rounded to the 8-row tile
    need = (n_blocks * R + extra) * H
    if padded.shape[-1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[-1])))
    sig3d = padded[:, :need].reshape(B, -1, H)

    # bin-column blocking keeps the two (W, CB) DFT matrix blocks within
    # the ~16 MB VMEM budget (a full 4096-pt matrix pair is 67 MB)
    bins_up = -(-bins // 128) * 128
    CB = min(bins_up, max(128, (8_000_000 // (8 * W)) // 128 * 128))
    n_c = -(-bins // CB)

    re, im = pl.pallas_call(
        partial(_kernel, R=R, H=H, k=k, W=W),
        grid=(B, n_c, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # signal stays in HBM
            pl.BlockSpec((W, CB), lambda b, c, j: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, CB), lambda b, c, j: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, R, CB), lambda b, c, j: (b, j, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, CB), lambda b, c, j: (b, j, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_blocks * R, bins), jnp.float32),
            jax.ShapeDtypeStruct((B, n_blocks * R, bins), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R + extra, H), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * n_blocks * R * W * bins,
            bytes_accessed=4 * B * (n_c * need + 2 * n_blocks * R * bins) + 8 * W * bins,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sig3d, cos_m, sin_m)
    return re[:, :n_frames], im[:, :n_frames]


def stft_pallas(
    signal: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    nfft: int | None = None,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT via the fused Pallas kernel → (re, im), matching stft_matmul.

    Accepts (length,) or batched (B, length) signals — the batch rides a
    leading kernel grid axis (no vmap lifting needed). `interpret=True`
    runs the kernel in interpreter mode (CPU CI).
    """
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if signal.ndim not in (1, 2):
        raise ValueError(f"stft_pallas expects (L,) or (B, L), got {signal.shape}")
    if win_len % hop != 0:
        raise ValueError(f"pallas stft requires win % hop == 0, got {win_len}/{hop}")
    if nfft is None:
        nfft = win_len
    cos_m, sin_m = _forward_mats(nfft, win_len, _key(window))
    nf = num_frames(signal.shape[-1], hop)
    batched = signal.ndim == 2
    sig = jnp.asarray(signal, jnp.float32)
    if not batched:
        sig = sig[None]
    padded = _pad_signal(sig, win_len, hop)
    re, im = _stft_pallas_impl(
        padded,
        jnp.asarray(cos_m),
        jnp.asarray(sin_m),
        int(hop),
        int(nfft),
        win_len,
        nf,
        interpret,
    )
    return (re, im) if batched else (re[0], im[0])
