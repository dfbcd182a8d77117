"""Fused factored (Cooley–Tukey) forward-STFT kernel: framing + window +
two-stage DFT in VMEM, emitting half-spectra in NATURAL bin order.

Why (trace 2026-08-20, highres4096 b32 with both r5 mega-kernels
engaged): the XLA factored analysis chain (`_stft_matmul_ct_impl`, 64×64
split at "highest" precision) is ~28 ms of the 180 ms dispatch — six
(32, 1442, 64, 64) matmul/fusion passes plus their layout copies. The
dense Pallas STFT kernel (stft_kernel.py) is no replacement at 4096
points: its (W, bins) matmul is ~11× the factored MACs.

TPU-native structure (mirrors ct_istft_kernel.py's design):

* sample split n = 128·a + b (b < 128 on LANES): the hop-blocked signal
  view (B, n_sub_rows, 128) makes each frame's (A2 = nfft/128, 128)
  stage-1 input a pure sublane window of the signal — framing is G
  small overlapping DMAs (sub-rows are hop/128-aligned, ≥ 8-row tiles),
  the (nf, W) frames tensor never exists anywhere;
* bin split k = k1 + 128·k2 (k1 < 128): stage 1 contracts the SMALL
  factor a (A2 per frame) merged across G frames via a block-diagonal
  kron(I_G, E1) matrix — one (G·A2, 128)ᵀ·(G·A2, G·128) matmul per
  group, the same full-width-lanes trick as the inverse kernel;
* the twiddle e^{-2πi k1 b / nfft} binds the stages as ONE (128, G·128)
  elementwise constant;
* stage 2 contracts b (128-deep) against E2 (128, K2), K2 = nfft/256;
* each frame's (128 k1, K2 k2) result is transposed in VMEM via an MXU
  identity dot (exact at HIGHEST; Mosaic vector transposes crash or
  hang this toolchain — probed 2026-08-20) and written as a (K2, 128)
  tile, so the (B, nf, K2, 128) output REshapes for free to the natural
  (B, nf, nfft/2) half-spectrum: flat position 128·k2 + k1 = k;
* the Nyquist bin (k = nfft/2) is a single thin XLA dot over the
  hop-blocked signal (k_ratio shifted (H,)-vector contractions) — it
  never touches the kernel.

Parity: same math as dft.stft_matmul(algorithm="factored") at "highest"
— a different (128 × nfft/128 vs 64×64) factorization, so results agree
to float-reassociation level (~1e-6 rel), not bitwise.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convsep_tpu.dsp.stft import _pad_signal, num_frames

_B = 128   # lane-width sample factor: n = 128·a + b
_G = 8     # frames per stage-1 block-diagonal group


def ct_stft_supported(nfft: int, win_len: int, hop: int) -> bool:
    """Shapes this kernel handles; callers fall back to the XLA chain.

    Needs: nfft == win_len (no zero-padded frames), whole 128-sample
    sub-rows per hop (the framing view), A2 = nfft/128 ≥ 8 (stage-1
    depth is a sublane tile), and K2 = nfft/256 ≥ 8 (the transposed
    output tile needs ≥ 8 rows)."""
    if nfft != win_len or nfft % _B or hop % _B:
        return False
    A2, K2 = nfft // _B, nfft // (2 * _B)
    # A2 | 128: the cross term e^{-2pi i 128 k2 a/A2-ish} must vanish;
    # hop/128 % 8 == 0: in-kernel DMA row OFFSETS ride the 8-row sublane
    # tile (hop = 1024-class presets)
    return (A2 >= 8 and K2 >= 8 and 128 % A2 == 0
            and (hop // _B) % 8 == 0 and win_len % hop == 0)


@lru_cache(maxsize=8)
def _ct_stft_consts(nfft: int, window_key) -> dict:
    """Stage matrices + fused constants (float32 numpy), e^{-iθ} forward
    convention: X[k] = Σ_n w[n]·x[n]·(cos − i·sin)(2π k n / N)."""
    A2 = nfft // _B          # a-extent per frame
    K2 = nfft // (2 * _B)    # k2-extent over the half spectrum
    a = np.arange(A2)
    b = np.arange(_B)
    k1 = np.arange(_B)
    k2 = np.arange(K2)
    # stage 1: e^{-2πi k1·(128 a)/N} = e^{-2πi k1 a / A2}
    ang1 = 2.0 * np.pi * np.outer(a, k1) / A2            # (A2, 128) [a, k1]
    # twiddle: e^{-2πi k1 b / N} on (b, k1)
    angt = 2.0 * np.pi * np.outer(b, k1) / nfft          # (128, 128) [b, k1]
    # stage 2: e^{-2πi (128 k2) b / N} = e^{-2πi k2 b / A2·?}: 128·k2·b/N
    ang2 = 2.0 * np.pi * np.outer(b, k2) * _B / nfft     # (128, K2) [b, k2]
    bd = lambda m: np.kron(np.eye(_G), m)  # noqa: E731
    window = np.asarray(window_key, np.float64)
    win2 = np.tile(window.reshape(A2, _B), (_G, 1))      # (G·A2, 128)
    f32 = lambda x: np.ascontiguousarray(x, np.float32)  # noqa: E731
    return dict(
        A2=A2, K2=K2,
        bd_c=f32(bd(np.cos(ang1))), bd_s=f32(bd(np.sin(ang1))),
        tc=f32(np.tile(np.cos(angt), (1, _G))),          # (128, G·128)
        ts=f32(np.tile(np.sin(angt), (1, _G))),
        e2c=f32(np.cos(ang2)), e2s=f32(np.sin(ang2)),
        win2=f32(win2),
        alt=f32(np.where((np.arange(nfft) % 2) == 0, 1.0, -1.0)
                * np.asarray(window, np.float64)),       # Nyquist vector
    )


def _dg0(x, y, prec):
    return jax.lax.dot_general(
        x, y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _kernel(sig_hbm, bdc_ref, bds_ref, tc_ref, ts_ref, e2c_ref, e2s_ref,
            win_ref, re_ref, im_ref, sblk, xg, sem,
            *, R, A2, K2, hs, prec_name):
    """One (track b, R-frame block j) step: R/G groups of G frames."""
    from convsep_tpu.dsp.pallas.ct_istft_kernel import _prec_of, _eye

    prec = _prec_of(prec_name)
    bt = pl.program_id(0)
    j = pl.program_id(1)
    eye = _eye(_B)
    win = win_ref[:]
    # ONE DMA for the whole block's signal span (overlapping frames share
    # sub-rows); per-frame duplication happens with cheap VMEM slice
    # copies below. The first version issued G blocking DMAs per group —
    # 46k serialized small transfers dominated the kernel (70.7 ms traced
    # vs ~30 ms after this fix, b32 2026-08-20).
    rows_blk = (R - 1) * hs + A2
    dma = pltpu.make_async_copy(
        sig_hbm.at[bt, pl.ds(j * R * hs, rows_blk), :], sblk, sem
    )
    dma.start()
    dma.wait()
    for grp in range(R // _G):
        # stack G overlapping frames: VMEM sublane-aligned slice copies
        for g in range(_G):
            r = grp * _G + g
            xg[g * A2:(g + 1) * A2] = sblk[r * hs:r * hs + A2]
        xw = xg[:] * win                         # (G·A2, 128) windowed
        # stage 1 (contract a, block-diag over G frames):
        # (G·A2, 128 b)ᵀ·(G·A2, G·128) → (128 b, G·128 (g, k1))
        ar = _dg0(xw, bdc_ref[:], prec)
        ai = -_dg0(xw, bds_ref[:], prec)
        # twiddle e^{-2πi k1 b/N} on (b, (g, k1)): complex multiply
        tc = tc_ref[:]
        ts = ts_ref[:]
        br = ar * tc + ai * ts
        bi = ai * tc - ar * ts
        # stage 2 (contract b): (128, G·128)ᵀ·(128, K2) → (G·128, K2)
        cr = _dg0(br, e2c_ref[:], prec) + _dg0(bi, e2s_ref[:], prec)
        ci = _dg0(bi, e2c_ref[:], prec) - _dg0(br, e2s_ref[:], prec)
        # per frame: transpose (128 k1, K2) → (K2, 128) via identity dot
        # (exact f32; flat (k2, k1) = natural bin order) and write
        for g in range(_G):
            rows = slice(g * _B, (g + 1) * _B)
            re_ref[0, grp * _G + g] = jax.lax.dot_general(
                cr[rows], eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            im_ref[0, grp * _G + g] = jax.lax.dot_general(
                ci[rows], eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )


@partial(jax.jit, static_argnames=("hop", "nfft", "n_frames", "interpret",
                                   "precision"))
def _impl(padded, consts_args, hop, nfft, n_frames, interpret, precision):
    (bdc, bds, tc, ts, e2c, e2s, win2, alt) = consts_args
    B, _ = padded.shape
    A2 = nfft // _B
    K2 = nfft // (2 * _B)
    hs = hop // _B
    R = 2 * _G  # frames per grid block (2 block-diag groups)
    n_blocks = -(-n_frames // R)
    # signal long enough for the last frame's DMA window
    need = ((n_blocks * R - 1) * hs + A2) * _B
    if padded.shape[-1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[-1])))
    sig2 = padded[:, :need].reshape(B, -1, _B)

    cargs = [bdc, bds, tc, ts, e2c, e2s, win2]
    cspecs = [pl.BlockSpec(c.shape, lambda b, j: (0,) * c.ndim,
                           memory_space=pltpu.VMEM) for c in cargs]
    re, im = pl.pallas_call(
        partial(_kernel, R=R, A2=A2, K2=K2, hs=hs, prec_name=precision),
        grid=(B, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), *cspecs],
        out_specs=(
            pl.BlockSpec((1, R, K2, _B), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, K2, _B), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_blocks * R, K2, _B), jnp.float32),
            jax.ShapeDtypeStruct((B, n_blocks * R, K2, _B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((R - 1) * hs + A2, _B), jnp.float32),
            pltpu.VMEM((_G * A2, _B), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_blocks * (R // _G) * (
                2 * _G * A2 * _B * _G * _B      # stage 1 (block-diag)
                + 4 * _B * _G * _B * K2         # stage 2
                + 2 * _G * _B * _B * K2         # transposes
            ),
            bytes_accessed=4 * B * n_blocks * R * (A2 * _B + 2 * K2 * _B),
            transcendentals=0,
        ),
        interpret=interpret,
    )(sig2, *cargs)
    half = K2 * _B
    re = re.reshape(B, n_blocks * R, half)[:, :n_frames]
    im = im.reshape(B, n_blocks * R, half)[:, :n_frames]
    # Nyquist (k = N/2): Σ_n w[n]·x[n]·(−1)^n — k_ratio shifted thin dots
    # over the hop-blocked signal (XLA side; imag part is exactly 0)
    k_ratio = nfft // hop
    rows_need = n_frames + k_ratio - 1
    tot = rows_need * hop
    if padded.shape[-1] < tot:
        padded = jnp.pad(padded, ((0, 0), (0, tot - padded.shape[-1])))
    sigh = padded[:, :tot].reshape(B, rows_need, hop)
    altv = alt.reshape(k_ratio, hop)
    ny = jnp.zeros((B, n_frames), jnp.float32)
    for i in range(k_ratio):
        ny = ny + jnp.einsum(
            "bfh,h->bf", sigh[:, i:i + n_frames], altv[i],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return re, im, ny


def stft_ct_pallas(
    signal: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    nfft: int | None = None,
    precision: str = "highest",
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, L) or (L,) signal → (re, im, ny): half-spectra WITHOUT the
    Nyquist lane ((…, nf, nfft/2), natural bin order) plus the real
    Nyquist row (…, nf). ``concat([re, ny[..., None]], -1)`` equals
    dft.stft_matmul's re up to float reassociation; im's Nyquist is 0.

    Keeping Nyquist separate lets the (…, nf, 2048) body reshape out of
    the kernel for FREE (the 2049-lane concat would cost a full-tensor
    pass) — the fused pipeline's mag/Wiener consumers take the pair."""
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if nfft is None:
        nfft = win_len
    if not ct_stft_supported(int(nfft), win_len, int(hop)):
        raise ValueError(
            f"stft_ct_pallas unsupported for nfft={nfft} win={win_len} "
            f"hop={hop}; use dft.stft_matmul"
        )
    batched = signal.ndim == 2
    sig = jnp.asarray(signal, jnp.float32)
    if not batched:
        sig = sig[None]
    nf = num_frames(sig.shape[-1], int(hop))
    padded = _pad_signal(sig, win_len, int(hop))
    consts = _ct_stft_consts(
        int(nfft), tuple(np.asarray(window, np.float64).tolist())
    )
    cargs = tuple(jnp.asarray(consts[k]) for k in
                  ("bd_c", "bd_s", "tc", "ts", "e2c", "e2s", "win2", "alt"))
    re, im, ny = _impl(padded, cargs, int(hop), int(nfft), nf, interpret,
                       precision)
    return (re, im, ny) if batched else (re[0], im[0], ny[0])


def resolve_analysis(
    analysis: str, masked_synthesis: str, nfft: int, win_len: int, hop: int,
    wiener_p: float, arrays: tuple = (),
) -> str:
    """What the fused pipeline's analysis stage will actually run —
    "ct_pallas" (this kernel) or "matmul" (the XLA chain). The single
    source of truth for the bench record (routing is never assumed).

    DECISION RECORD (2026-08-20, b32 highres4096 A/B, min-of-4): "auto"
    resolves to "matmul" — the compiled kernel is exact (1.7e-7 rel
    on-chip) but SLOWER than the XLA 64×64 factored chain it replaces:
    8.58 ms/track as first built (46k serialized per-frame DMAs), 8.09
    after the one-DMA-per-block fix, vs 6.44 on the XLA chain. At
    "highest" precision both formulations are near FLOP-optimal
    (N·(f1+f2) MACs/frame), XLA's einsum chain is already MXU-bound, and
    the kernel's per-frame output transposes + thin-stage pass waste
    cost more than the ~10 ms of XLA layout passes it deletes. Kept as a
    forceable implementation (analysis="ct_pallas") and as the measured
    record — same pattern as the bandgemm/bandconv_nlast decoder
    formulations."""
    if analysis == "matmul" or analysis == "auto":
        return "matmul"
    if analysis == "ct_pallas":
        return "ct_pallas"
    raise ValueError(
        f"unknown analysis {analysis!r}; have auto | ct_pallas | matmul"
    )
