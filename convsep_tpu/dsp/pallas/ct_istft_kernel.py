"""Fused factored (Cooley–Tukey) inverse-DFT + window + overlap-add kernel.

VERDICT r3 #4: the XLA factored iSTFT chain (dsp/dft.py
`_idft_frames_factored`) materializes ~6 HBM tensors of
(B, S, nf, N1, N2) — 755 MB each for highres4096 vmap8 — plus the layout
copies between the einsum stages; the 2026-08-19 trace puts ~25 ms of the
78 ms batched program in that chain. This kernel runs the whole factored
inverse per R-frame block in VMEM: HBM traffic drops to one read of the
half-spectra + one write of the OLA'd hop blocks (~1 GB total for the
same program).

TPU-native structure (see docs/PALLAS_PROFILE.md addendum 10):

* factorization nfft = A·B with A = 128 (lane width): bins k = k1 + A·k2
  (k1 < 128 minor), so the (R, nfft/2) → (R, K2, 128) view splits the
  lane axis exactly at lane-tile boundaries — a free relayout;
* G = 128 // K2 frames are merged into the sublane axis and stage 1
  (contract k2) becomes ONE (128, 128) @ (128, G·B) matmul against a
  block-diagonal kron(I_G, E2) matrix — K2 is tiny (16 at 4096 points),
  so a per-frame dot would waste the MXU; the block-diagonal form pays
  (128/K2)× MACs on structural zeros but keeps every pass a full-width
  matmul (measured faster than thin K=16 batched dots);
* the twiddle e^{+2πi m2 k1 / nfft} binds stage-1 output (k1 rows,
  (frame, m2) lanes) to stage 2 and is applied as ONE (128, G·B)
  elementwise constant;
* stage 2 (contract k1) is a (128, G·B)ᵀ·(128, 128) real-part matmul;
* hermitian fold (×2 + DC / Nyquist rank-1 corrections), synthesis
  window·(1/N), and the local OLA all happen in registers/VMEM;
* output samples emerge indexed n = B·m1 + m2 — the kernel overlap-adds
  in that PERMUTED layout (hop block h = m1 // (H/B) is a contiguous
  lane slice); the epilogue unpermutes each hop row to sample order
  IN VMEM via MXU identity dots (_transpose_rows — the XLA-side fixup
  this replaces lowered to a while loop of full-track
  dynamic-update-slices, 30.6 ms of the 235 ms highres4096 b32 dispatch,
  trace 2026-08-20), so the body reaches HBM already flat-mergeable.

Reference parity: semantics identical to dsp/dft.istft_matmul
(algorithm="factored") — window-power OLA normalization, W//2 front trim
(transform.py [U] inverse semantics per SURVEY.md §2.1 #1).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convsep_tpu.dsp.istft import ola_norm
from convsep_tpu.dsp.stft import num_frames

_A = 128  # N1: lane-width factor; bins k = k1 + A*k2
# Frames per grid block (lower bound; rounded up to a multiple of G per
# shape in _impl). 64 — not 128 — is deliberate: at R=128 the 4096-pt
# block's VMEM footprint (double-buffered 2×(R, 2049) spectra + outputs +
# scratch + the unrolled g-loop's live (128, G·B) temporaries) measured
# 17.22 MB under jax.vmap's pallas batching rule — over the 16 MB scope —
# even though the single-track grid compiled; R=64 fits both with headroom
# and measured FASTER (12.25 vs 12.94 ms/track vmap8, 2026-08-19).
_R = 64


def ct_pallas_supported(nfft: int, win_len: int, hop: int) -> bool:
    """Shapes this kernel handles; callers fall back to the XLA factored
    path otherwise."""
    if nfft != win_len or nfft % _A:
        return False
    half, B = nfft // 2, nfft // _A
    if half % _A or 128 % (half // _A) or B < 2:
        return False
    # OLA addressing needs hop as a whole number of m1 lanes per block
    return win_len % hop == 0 and hop % B == 0 and win_len // hop <= 9


@lru_cache(maxsize=8)
def _ct_pallas_consts(nfft: int, window_key, P: int = 1) -> dict:
    """Stage matrices + fused elementwise constants, float32 numpy.

    `P` widens the block-diagonal group: G = P·(128/K2) frames per
    stage-1 matmul. Measured on-chip (isolated 4096-pt kernel, N=32,
    2026-08-19): P=1 46.7 ms, P=2 53.2 ms, P=4 VMEM-OOM — the extra
    structural-zero MACs cost more than the instruction-count savings,
    so P stays 1 (decision record)."""
    A = _A
    B = nfft // A
    half = nfft // 2
    K2 = half // A
    G = P * (128 // K2)  # frames merged per block-diagonal stage-1 matmul
    k2 = np.arange(K2)
    m2 = np.arange(B)
    k1 = np.arange(A)
    m1 = np.arange(A)
    ang2 = 2.0 * np.pi * np.outer(k2, m2) / B  # e^{+2πi m2 k2 / B}
    e2c, e2s = np.cos(ang2), np.sin(ang2)
    bd = lambda m: np.kron(np.eye(G), m)  # noqa: E731  (G·K2, G·B)
    angt = 2.0 * np.pi * np.outer(k1, m2) / nfft  # twiddle e^{+2πi m2 k1/N}
    tc = np.tile(np.cos(angt), (1, G))  # (A, G·B), lanes t = r'·B + m2
    ts = np.tile(np.sin(angt), (1, G))
    ang1 = 2.0 * np.pi * np.outer(k1, m1) / A  # e^{+2πi m1 k1 / A}
    window = np.asarray(window_key, np.float64)
    # window/N over output samples n = B·m1 + m2, laid out (t, m1)
    w2 = (window.reshape(A, B).T / float(nfft))  # (B m2, A m1)
    alt = np.where(m2 % 2 == 0, 1.0, -1.0)[:, None]  # (−1)^n = (−1)^{m2}
    f32 = lambda x: np.ascontiguousarray(x, np.float32)  # noqa: E731
    # frame-scalar broadcast over t = r'·B + m2 lanes: a (G·B, G) selection
    # matmul (pltpu.repeat is tile-, not np.repeat-, semantics)
    sel = np.kron(np.eye(G), np.ones((B, 1)))
    return dict(
        B=B, K2=K2, G=G,
        bd_c=f32(bd(e2c)), bd_s=f32(bd(e2s)),
        tc=f32(tc), ts=f32(ts),
        c1=f32(np.cos(ang1)), s1=f32(np.sin(ang1)),
        w2=f32(np.tile(w2, (G, 1))),  # (G·B, A)
        alt=f32(np.tile(alt, (G, 1))),  # (G·B, 1)
        sel=f32(sel),  # (G·B, G)
    )


def _dg0(x, y, prec):
    """dot_general contracting dim 0 of both operands."""
    return jax.lax.dot_general(
        x, y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _eye(n: int):
    """In-kernel f32 identity (iota compare — no extra operand)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(jnp.float32)


def _transpose_rows(out, eye, pcm16):
    """(R, B, HB) → per-row (HB, B) tiles via MXU identity dots.

    The body unpermute (m2, m1') → sample order n = B·m1' + m2 moved
    in-kernel: Mosaic vector transposes/reshapes crash or hang this
    toolchain (swapaxes / lane-merge reshape probes 2026-08-20:
    compile-helper HTTP 500 or >240 s hang), but an identity dot_general
    at HIGHEST precision is an EXACT f32 transpose (bf16x3 covers the full
    f32 mantissa; on-chip probe: bitwise equal, cost indistinguishable
    from a passthrough kernel). The XLA-side fixup this replaces lowered
    to a while loop + 128 full-track dynamic-update-slices — 30.6 ms of
    the 235 ms highres4096 b32 dispatch (trace 2026-08-20).

    Rows are transposed FOUR at a time through one dot — the sublane
    merge (4, B, HB) → (4B, HB) is free metadata, the (HB, 4B) result
    holds the four transposed tiles as consecutive lane blocks, and the
    lane-slice extraction compiles cleanly (probed) — quartering the MXU
    pass count vs a per-row loop (measured: batched 45.6 ms vs per-row
    48.3 ms on the isolated 1.5 GB relayout probe)."""
    R = out.shape[0]
    Bq = out.shape[1]
    q = 4 if R % 4 == 0 else 1
    rows = []
    for g in range(R // q):
        xq = out[g * q:(g + 1) * q].reshape(q * Bq, out.shape[2])
        # y[i, k] = Σ_l eye[i, l]·xq[k, l] = xqᵀ — both operands contract
        # their LANE dim (a native MXU B·Aᵀ pass); HIGHEST is exact f32
        y = jax.lax.dot_general(
            eye, xq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if pcm16:
            y = jnp.clip(jnp.round(y * 32768.0), -32768.0, 32767.0)
            y = y.astype(jnp.int16)
        for a in range(q):
            rows.append(y[:, a * Bq:(a + 1) * Bq])
    return rows


def _prec_of(prec_name: str):
    # Mosaic lowers only DEFAULT/HIGHEST dot precisions; "high" (bf16x3)
    # saturates to HIGHEST here — strictly MORE accurate than asked, and
    # the stage matmuls are tiny VMEM-resident (128, 128)·(128, G·B) dots,
    # so the extra MXU passes are noise next to the HBM read of the spectra
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[prec_name]


def _group_tile(xr_blk, xi_blk, rows, cr, prec, *, G, half, ny_col=None):
    """Factored iDFT of G frames' half-spectra → windowed (G·B, A) sample
    tile (t = r'·B + m2 rows, m1 lanes). Shared by the plain and the
    Wiener-masked kernels — identical math.

    ``ny_col``: (R, 1) real Nyquist column when the spectra arrive
    WITHOUT the Nyquist lane (the fused forward-STFT kernel emits the
    (nf, nfft/2) body + a separate Nyquist row — ct_stft_kernel.py);
    None reads it from lane `half` as before."""
    bdc, bds, tc, ts, c1, s1, w2, alt, sel = cr
    A = _A
    K2 = half // A
    # (G, K2, 128) view of G frames' half-spectra → (G·K2, 128): the
    # lane split lands on lane-tile boundaries, the sublane merge is
    # pure metadata
    xr = xr_blk[rows, :half].reshape(G * K2, A)
    xi = xi_blk[rows, :half].reshape(G * K2, A)
    # stage 1 (contract k2, block-diagonal over the G frames):
    # (G·K2, A)ᵀ·(G·K2, G·B) → (A k1, G·B t), t = r'·B + m2
    ar = _dg0(xr, bdc, prec) - _dg0(xi, bds, prec)
    ai = _dg0(xr, bds, prec) + _dg0(xi, bdc, prec)
    # twiddle e^{+2πi m2 k1 / N} on (k1, t)
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc
    # stage 2 (contract k1), real part only: (G·B t, A m1)
    x = _dg0(br, c1, prec) - _dg0(bi, s1, prec)
    # hermitian fold + DC/Nyquist corrections + window/N; frame scalars
    # broadcast to the (t, m1) layout via the selection matmul
    dc = jnp.dot(sel, xr_blk[rows, 0:1],
                 preferred_element_type=jnp.float32)      # (G·B, 1)
    ny_src = ny_col[rows] if ny_col is not None else xr_blk[rows, half:half + 1]
    ny = jnp.dot(sel, ny_src, preferred_element_type=jnp.float32)
    return (2.0 * x - dc + ny * alt) * w2


def _kernel(re_ref, im_ref, bdc_ref, bds_ref, tc_ref, ts_ref, c1_ref, s1_ref,
            w2_ref, alt_ref, sel_ref, norm_ref, body_ref, acc, carry,
            *, R, H, nfft, G, prec_name, pcm16):
    """One (R frames) block: factored iDFT + window + local permuted OLA.

    Spill folding happens IN-KERNEL via a grid-persistent `carry` scratch:
    block j adds block j−1's spill rows (same track — `carry` resets at
    j==0, so the track axis can shard/parallelize freely) into its first
    hop rows before emitting. The XLA-side `.at[].add` fold this replaces
    lowered to a slice_add fusion + an aliased dynamic-update-slice + two
    pads over the 753 MB body tensor — ~7.9 ms per vmap8 highres4096
    batch, ~11% of the program (trace 2026-08-19)."""
    prec = _prec_of(prec_name)
    half = nfft // 2
    B = nfft // _A
    HB = H // B          # m1 lanes per hop block
    k_ratio = nfft // H  # frames overlapping one hop row
    cr = (bdc_ref[:], bds_ref[:], tc_ref[:], ts_ref[:], c1_ref[:], s1_ref[:],
          w2_ref[:], alt_ref[:], sel_ref[:])

    acc[:] = jnp.zeros_like(acc)
    xr_blk = re_ref[0]
    xi_blk = im_ref[0]
    for g in range(R // G):
        rows = slice(g * G, (g + 1) * G)
        x = _group_tile(xr_blk, xi_blk, rows, cr, prec, G=G, half=half)
        # permuted local OLA: sample n = B·m1 + m2; hop block h is the
        # contiguous m1-lane slice [h·HB, (h+1)·HB); rows split back to
        # (G, B, HB) tiles and shift by h hop rows
        for h in range(k_ratio):
            chunk = x[:, h * HB:(h + 1) * HB].reshape(G, B, HB)
            acc[g * G + h:g * G + h + G] += chunk
    # fold the previous block's spill into this block's first hop rows
    # (acc rows ≥ k_ratio−1 of the carry are exact zeros, so adding all 8
    # is free); the read must precede the carry overwrite, and rows 0:8
    # are disjoint from R:R+8 (R ≥ 64). The frame axis is padded by
    # ≥ k_ratio−1 in _impl, so the final real frames' spill always lands
    # inside padded body rows — no spill output exists at all.
    @pl.when(pl.program_id(1) != 0)
    def _fold_carry():
        acc[0:8] += carry[:]

    carry[:] = acc[R:R + 8]
    # epilogue in VMEM: window-power OLA normalization (norm_ref is the
    # inv-norm permuted to the kernel's (row, m2, m1') accumulator order),
    # the (m2, m1') → sample-order unpermute via MXU identity dots
    # (_transpose_rows), and — on the int16 serving path — PCM16
    # quantization, halving the kernel's HBM writes
    out = acc[:R] * norm_ref[:]
    for r, t in enumerate(_transpose_rows(out, _eye(out.shape[-1]), pcm16)):
        body_ref[0, r] = t


def _impl(re, im, consts, inv_norm, hop, length, win_len, nfft, precision,
          interpret, pcm16=False):
    H = hop
    k_ratio = win_len // H
    N, nf, bins = re.shape
    # R must be a whole number of G-frame matmul groups; G = 128/K2 reaches
    # 128 at small nfft (K2=1), where bins are tiny and VMEM is a non-issue
    G = consts["G"]
    R = max(_R, G)
    # pad the frame axis by ≥ k_ratio−1 so every real frame's spill folds
    # into a later block's body rows via the kernel carry — the body alone
    # covers the full (nf−1)·H + win_len output and no spill tensor or
    # XLA-side concat exists (a tiny-tail concat onto the 193 MB body made
    # XLA sink the whole output assembly into a while loop, 2026-08-19)
    n_blocks = -(-(nf + k_ratio - 1) // R)
    pad_f = n_blocks * R - nf
    if pad_f:
        re = jnp.pad(re, ((0, 0), (0, pad_f), (0, 0)))
        im = jnp.pad(im, ((0, 0), (0, pad_f), (0, 0)))
    B = consts["B"]
    HB = H // B
    # inv-norm permuted to the kernel's (hop row, m2, m1') sample order
    # (sample n = row·H + B·m1' + m2): a host-side constant, multiplied in
    # VMEM by the kernel epilogue
    total = (nf - 1) * H + win_len
    flat = np.zeros(n_blocks * R * H, np.float32)
    flat[:total] = np.asarray(inv_norm, np.float32)
    norm_perm = jnp.asarray(
        np.ascontiguousarray(
            flat.reshape(n_blocks * R, HB, B).transpose(0, 2, 1)
        )
    )
    out_dt = jnp.int16 if pcm16 else jnp.float32
    cargs = [jnp.asarray(consts[k]) for k in
             ("bd_c", "bd_s", "tc", "ts", "c1", "s1", "w2", "alt", "sel")]
    cspecs = [pl.BlockSpec(c.shape, lambda b, j: (0,) * c.ndim,
                           memory_space=pltpu.VMEM) for c in cargs]
    body = pl.pallas_call(
        partial(_kernel, R=R, H=H, nfft=nfft, G=G, prec_name=precision,
                pcm16=pcm16),
        grid=(N, n_blocks),
        in_specs=[
            pl.BlockSpec((1, R, bins), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, bins), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            *cspecs,
            pl.BlockSpec((R, B, HB), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, HB, B), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_blocks * R, HB, B), out_dt),
        scratch_shapes=[
            pltpu.VMEM((R + 8, B, HB), jnp.float32),
            pltpu.VMEM((8, B, HB), jnp.float32),  # cross-block spill carry
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * n_blocks * R * (2 * 128 * 128 * consts["G"] * B
                                          + 128 * consts["G"] * B * 128)
            // consts["G"],
            bytes_accessed=N * n_blocks * R * (4 * 2 * bins
                                               + (2 if pcm16 else 4) * H),
            transcendentals=0,
        ),
        interpret=interpret,
    )(re, im, *cargs, norm_perm)
    # body already in sample order (in-kernel unpermute via identity
    # dots): the (row, m1', m2) → flat merge is a pure reshape, and the
    # frame padding guarantees the body covers the full output extent
    data = body.reshape(N, n_blocks * R * H)
    front = win_len // 2
    return data[:, front:front + length]


def istft_ct_pallas(
    re: jnp.ndarray,
    im: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    length: int,
    analysis_window: np.ndarray | None = None,
    nfft: int | None = None,
    precision: str = "highest",
    interpret: bool | None = None,
    output_dtype: str = "float32",
) -> jnp.ndarray:
    """(…, nf, bins)×2 → (…, length): drop-in for dft.istft_matmul
    (factored algorithm) via the fused Pallas kernel. Leading axes
    (sources / batch·sources) flatten onto the kernel grid.

    ``output_dtype="int16"`` applies PCM16 quantization (identical math to
    utils.pcm.quantize_pcm16) inside the kernel epilogue: the body tensor
    is written to HBM at half the bytes and the downstream unpermute
    repack moves half the data."""
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if nfft is None:
        nfft = 2 * (int(re.shape[-1]) - 1)
    if not ct_pallas_supported(int(nfft), win_len, int(hop)):
        raise ValueError(
            f"istft_ct_pallas unsupported for nfft={nfft} win={win_len} "
            f"hop={hop}; use dft.istft_matmul"
        )
    if analysis_window is None:
        analysis_window = window
    expect = num_frames(length, hop)
    if int(re.shape[-2]) != expect:
        raise ValueError(
            f"re/im have {re.shape[-2]} frames but length={length}, "
            f"hop={hop} implies {expect}"
        )
    lead = re.shape[:-2]
    N = int(np.prod(lead)) if lead else 1
    re3 = jnp.asarray(re, jnp.float32).reshape(N, expect, re.shape[-1])
    im3 = jnp.asarray(im, jnp.float32).reshape(N, expect, im.shape[-1])
    inv_norm = 1.0 / ola_norm(
        window.astype(np.float32), np.asarray(analysis_window, np.float32),
        int(hop), expect,
    )
    consts = _ct_pallas_consts(
        int(nfft), tuple(np.asarray(window, np.float64).tolist())
    )
    if output_dtype not in ("float32", "int16"):
        raise ValueError(f"output_dtype must be float32|int16, got {output_dtype}")
    out = _impl(re3, im3, consts, inv_norm, int(hop),
                int(length), win_len, int(nfft), precision, interpret,
                pcm16=output_dtype == "int16")
    return out.reshape(*lead, length) if lead else out[0]


# ---------------------------------------------------------------------------
# Wiener + iSTFT mega-kernel
#
# docs/PALLAS_PROFILE.md addendum 11 budget: at highres4096 b32, the masked
# spectra est_re/est_im = mask·(re, im) cost ~29 ms of XLA relayout+pad HBM
# passes feeding the plain kernel, plus ~9 ms for the Wiener fusion itself —
# every pass a near-bandwidth sweep of the (32, 4, 1442, 2049) f32 family.
# The masked spectra never need to exist: this kernel reads the model's
# per-source magnitudes y (S per track) + the mixture halves re/im (2 per
# track) and computes mask_s = relu(y_s)^p / (Σ relu(y_j)^p + eps), the
# complex multiply, and the full factored iDFT + window + OLA in VMEM.
# HBM traffic per track drops from 2S est units (+ the passes that wrote
# them: S y reads + 2 mix reads + 2S est writes + relayout/pad re-reads)
# to S + 2 units read, once.
# ---------------------------------------------------------------------------


def _wiener_kernel(y_ref, re_ref, im_ref, *rest,
                   R, H, nfft, G, S, prec_name, pcm16, p, eps,
                   conserve_last, has_ny):
    """One (R frames) block of ONE track, all S sources: Wiener mask +
    complex multiply + factored iDFT + window + permuted OLA in VMEM.

    Mask semantics == models.masks.wiener_mask (axis = sources): mask_s =
    relu(y_s)^p / (Σ_j relu(y_j)^p + eps); ``conserve_last`` adds the eps
    shortfall to the LAST source (masks sum to exactly 1 — the
    complement-fetch contract). Frame-padding rows have y = re = im = 0,
    so their mask·spectrum is 0 under either mode.

    ``has_ny``: the mixture spectra arrive as the fused forward kernel's
    (R, nfft/2) body + a separate real Nyquist column (ct_stft_kernel) —
    y still carries all nfft/2+1 bins and the Nyquist mask applies to
    the column."""
    if has_ny:
        ny_ref, *rest = rest
    (bdc_ref, bds_ref, tc_ref, ts_ref, c1_ref, s1_ref, w2_ref, alt_ref,
     sel_ref, norm_ref, body_ref, acc, carry) = rest
    prec = _prec_of(prec_name)
    half = nfft // 2
    B = nfft // _A
    HB = H // B
    k_ratio = nfft // H
    cr = (bdc_ref[:], bds_ref[:], tc_ref[:], ts_ref[:], c1_ref[:], s1_ref[:],
          w2_ref[:], alt_ref[:], sel_ref[:])

    def _pow(v):
        # mask math in f32 regardless of the y storage dtype (the bf16
        # mask tail halves the kernel's dominant y-read traffic; the
        # RATIO still computes at full precision)
        v = jnp.maximum(v.astype(jnp.float32), 0.0)
        return v * v if p == 2.0 else v

    yv = y_ref[0]          # (S, R, nfft/2+1), f32 or bf16 (mask_dtype)
    re_blk = re_ref[0]     # (R, nfft/2+1) — or (R, nfft/2) when has_ny
    im_blk = im_ref[0]
    ny_col = ny_ref[0][:, 0:1] if has_ny else None  # (R, 1) real Nyquist
    denom = jnp.full(yv.shape[1:], jnp.float32(eps))
    for s in range(S):
        denom = denom + _pow(yv[s])
    inv_den = 1.0 / denom
    norm = norm_ref[:]
    for s in range(S):
        yp = _pow(yv[s])
        if conserve_last and s == S - 1:
            yp = yp + jnp.float32(eps)
        m = yp * inv_den                 # (R, nfft/2+1)
        if has_ny:
            er = m[:, :half] * re_blk
            ei = m[:, :half] * im_blk
            er_ny = m[:, half:half + 1] * ny_col
        else:
            er = m * re_blk
            ei = m * im_blk
            er_ny = None
        acc[s] = jnp.zeros_like(acc[s])
        for g in range(R // G):
            rows = slice(g * G, (g + 1) * G)
            x = _group_tile(er, ei, rows, cr, prec, G=G, half=half,
                            ny_col=er_ny)
            for h in range(k_ratio):
                chunk = x[:, h * HB:(h + 1) * HB].reshape(G, B, HB)
                acc[s, g * G + h:g * G + h + G] += chunk

        @pl.when(pl.program_id(1) != 0)
        def _fold_carry():
            acc[s, 0:8] += carry[s]

        carry[s] = acc[s, R:R + 8]
        out = acc[s, :R] * norm
        # sample-order unpermute in VMEM (see _transpose_rows)
        for r, t in enumerate(_transpose_rows(out, _eye(out.shape[-1]), pcm16)):
            body_ref[0, s, r] = t


def _pick_r_wiener(
    nfft: int, bins: int, S: int, G: int, H: int, y_bytes: int = 4
) -> int:
    """Frames per block: largest multiple of G in {64, 32, 16, 8, G} whose
    VMEM footprint estimate fits. The plain kernel's measured envelope
    (R=128 → 17.22 MB, over scope; R=64 fits) calibrates the constant:
    double-buffered streamed blocks + scratch + ~4 block-sized temporaries
    (denom / er / ei / group tiles). `y_bytes` is accepted for the bf16
    mask tail but deliberately IGNORED for the R choice: the in-VMEM f32
    upcast temporaries eat exactly what the smaller stream frees (R=64
    with bf16 y measured 22.5 MB actual vs 16 MB scope — compile-time
    VMEM OOM 2026-08-20), so R must stay what the f32 calibration picks;
    the HBM read still halves."""
    del y_bytes
    for R in (64, 32, 16, 8):
        if R < G or R % G:
            continue
        stream = 2 * (S + 2) * R * bins * 4  # dbuf y + re + im blocks
        scratch = S * (R + 8) * H * 4 + S * 8 * H * 4
        out = 2 * S * R * H * 4
        temps = 6 * R * bins * 4
        if stream + scratch + out + temps <= 12 * 2 ** 20:
            return R
    return G


def _impl_wiener(y, re, im, consts, inv_norm, hop, length, win_len, nfft,
                 precision, interpret, p, eps, conserve_last, pcm16=False,
                 ny=None):
    H = hop
    k_ratio = win_len // H
    Nt, S, nf, bins = y.shape
    G = consts["G"]
    R = max(_pick_r_wiener(nfft, bins, S, G, H, y.dtype.itemsize), G)
    n_blocks = -(-(nf + k_ratio - 1) // R)
    pad_f = n_blocks * R - nf
    if pad_f:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad_f), (0, 0)))
        re = jnp.pad(re, ((0, 0), (0, pad_f), (0, 0)))
        im = jnp.pad(im, ((0, 0), (0, pad_f), (0, 0)))
    if ny is not None:
        # (Nt, nf) real Nyquist row → (Nt, nf_pad, 128) lane-0 blocks
        ny = jnp.pad(ny[..., None], ((0, 0), (0, pad_f), (0, 127)))
    B = consts["B"]
    HB = H // B
    total = (nf - 1) * H + win_len
    flat = np.zeros(n_blocks * R * H, np.float32)
    flat[:total] = np.asarray(inv_norm, np.float32)
    norm_perm = jnp.asarray(
        np.ascontiguousarray(
            flat.reshape(n_blocks * R, HB, B).transpose(0, 2, 1)
        )
    )
    out_dt = jnp.int16 if pcm16 else jnp.float32
    cargs = [jnp.asarray(consts[k]) for k in
             ("bd_c", "bd_s", "tc", "ts", "c1", "s1", "w2", "alt", "sel")]
    cspecs = [pl.BlockSpec(c.shape, lambda b, j: (0,) * c.ndim,
                           memory_space=pltpu.VMEM) for c in cargs]
    mix_bins = re.shape[-1]  # nfft/2 (has_ny) or nfft/2+1
    ny_ops = () if ny is None else (ny,)
    ny_specs = () if ny is None else (
        pl.BlockSpec((1, R, 128), lambda b, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    )
    body = pl.pallas_call(
        partial(_wiener_kernel, R=R, H=H, nfft=nfft, G=G, S=S,
                prec_name=precision, pcm16=pcm16, p=p, eps=eps,
                conserve_last=conserve_last, has_ny=ny is not None),
        grid=(Nt, n_blocks),
        in_specs=[
            pl.BlockSpec((1, S, R, bins), lambda b, j: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, mix_bins), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, mix_bins), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            *ny_specs,
            *cspecs,
            pl.BlockSpec((R, B, HB), lambda b, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, R, HB, B), lambda b, j: (b, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Nt, S, n_blocks * R, HB, B), out_dt),
        scratch_shapes=[
            pltpu.VMEM((S, R + 8, B, HB), jnp.float32),
            pltpu.VMEM((S, 8, B, HB), jnp.float32),  # cross-block spill carry
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Nt * S * n_blocks * R * (2 * 128 * 128 * G * B
                                               + 128 * G * B * 128) // G,
            bytes_accessed=Nt * n_blocks * R * (
                (S * y.dtype.itemsize + 2 * 4) * bins
                + S * (2 if pcm16 else 4) * H),
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, re, im, *ny_ops, *cargs, norm_perm)
    # body already in sample order (in-kernel unpermute, same as the
    # plain kernel) — the flat merge is a pure reshape
    data = body.reshape(Nt, S, n_blocks * R * H)
    front = win_len // 2
    return data[..., front:front + length]


def istft_ct_pallas_wiener(
    y: jnp.ndarray,
    re: jnp.ndarray,
    im: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    length: int,
    analysis_window: np.ndarray | None = None,
    nfft: int | None = None,
    precision: str = "highest",
    interpret: bool | None = None,
    output_dtype: str = "float32",
    p: float = 1.0,
    eps: float = 1e-8,
    conserve_last: bool = False,
    ny: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused Wiener-mask + iSTFT: y (…, S, nf, bins) nonneg source
    magnitudes + re/im (…, nf, bins) mixture halves → stems (…, S, length).

    Drop-in for ``istft_matmul(mask·re, mask·im, …)`` with ``mask =
    wiener_mask(y, p, eps, axis=-3, conserve_last)`` — the masked spectra
    never materialize in HBM (docs/PALLAS_PROFILE.md addendum 11). p must
    be 1 or 2 (the kernel envelope; other exponents take the XLA path).

    ``ny``: (…, nf) real Nyquist row when re/im are the fused forward
    kernel's (…, nf, nfft/2) bodies (ct_stft_kernel.py — keeping the
    Nyquist lane separate makes both kernels' HBM layouts concat-free);
    y still carries all nfft/2+1 bins."""
    if interpret is None:
        from convsep_tpu.dsp.pallas import interpret_default

        interpret = interpret_default()
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if nfft is None:
        nfft = 2 * (int(re.shape[-1]) - (0 if ny is not None else 1))
    if not ct_pallas_supported(int(nfft), win_len, int(hop)) or p not in (1.0, 2.0):
        raise ValueError(
            f"istft_ct_pallas_wiener unsupported for nfft={nfft} "
            f"win={win_len} hop={hop} p={p}; use wiener_mask + istft_matmul"
        )
    if ny is None:
        if y.shape[-1] != re.shape[-1] or y.shape[-2] != re.shape[-2]:
            raise ValueError(f"y {y.shape} does not align with re/im {re.shape}")
    else:
        if re.shape[-1] != nfft // 2 or y.shape[-1] != nfft // 2 + 1:
            raise ValueError(
                f"with ny, re/im must be (…, nf, {nfft // 2}) and y "
                f"(…, S, nf, {nfft // 2 + 1}); got {re.shape} / {y.shape}"
            )
        if ny.shape != re.shape[:-1]:
            raise ValueError(f"ny {ny.shape} must match re/im frames {re.shape[:-1]}")
    if analysis_window is None:
        analysis_window = window
    expect = num_frames(length, hop)
    if int(re.shape[-2]) != expect:
        raise ValueError(
            f"re/im have {re.shape[-2]} frames but length={length}, "
            f"hop={hop} implies {expect}"
        )
    lead = re.shape[:-2]
    if y.shape[: len(lead)] != lead or y.ndim != len(lead) + 3:
        raise ValueError(
            f"y must be re/im's shape {re.shape} with one sources axis "
            f"inserted at -3, got {y.shape}"
        )
    S = int(y.shape[-3])
    Nt = int(np.prod(lead)) if lead else 1
    # y keeps its storage dtype (bf16 mask tail halves the kernel's y
    # stream); the kernel upcasts to f32 in VMEM for the mask ratio
    ydt = y.dtype if y.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    y4 = jnp.asarray(y, ydt).reshape(Nt, S, expect, y.shape[-1])
    re3 = jnp.asarray(re, jnp.float32).reshape(Nt, expect, re.shape[-1])
    im3 = jnp.asarray(im, jnp.float32).reshape(Nt, expect, im.shape[-1])
    ny2 = None if ny is None else jnp.asarray(ny, jnp.float32).reshape(Nt, expect)
    inv_norm = 1.0 / ola_norm(
        window.astype(np.float32), np.asarray(analysis_window, np.float32),
        int(hop), expect,
    )
    consts = _ct_pallas_consts(
        int(nfft), tuple(np.asarray(window, np.float64).tolist())
    )
    if output_dtype not in ("float32", "int16"):
        raise ValueError(f"output_dtype must be float32|int16, got {output_dtype}")
    out = _impl_wiener(y4, re3, im3, consts, inv_norm, int(hop), int(length),
                       win_len, int(nfft), precision, interpret,
                       float(p), float(eps), bool(conserve_last),
                       pcm16=output_dtype == "int16", ny=ny2)
    return out.reshape(*lead, S, length) if lead else out[0]
