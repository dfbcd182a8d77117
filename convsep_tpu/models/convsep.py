"""ConvSep: convolutional encoder-decoder separation network (flax).

Re-design of the reference's `build_ca` network (examples/*/trainCNN.py [U],
SURVEY.md §2.1 #5/#7/#10):

    input (B, 1, T, F)
      → vertical conv   (Conv2D, num_filters1, kernel (1, freq_extent), linear)
      → horizontal conv (Conv2D, num_filters2, kernel (T//2, 1), linear)
      → dense bottleneck (ReLU)
      → per source: dense expansion (ReLU) → reshape
                    → InverseLayer(conv2) → InverseLayer(conv1)
      → concat sources → shared per-channel bias → ReLU

Lasagne's ``InverseLayer`` computes the *gradient of the referenced conv
w.r.t. its input* — a transposed convolution **tied to the same kernel**
(no new parameters). Here that is ``lax.conv_transpose(transpose_kernel=
True)``, verified against ``jax.vjp`` of the forward conv in
tests/test_model.py.

TPU-native choices:
* NHWC layout (B, T, F, C) — TPU conv-friendly; the channel axis is last so
  the F×C trailing dims map onto (sublane, lane) tiles.
* All source branches are computed as one batched dense ([bottleneck] →
  [S * flat]) and one grouped transposed conv by folding the source axis
  into the batch axis — one MXU matmul / conv call instead of S small ones.
* Parameters are declared in reference layer order with stable names so the
  checkpoint converter (ckpt/convert_reference.py) maps pickled Lasagne
  param lists by position.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from convsep_tpu.models.masks import wiener_filter


@dataclasses.dataclass(frozen=True)
class ConvSepConfig:
    """Architecture hyperparameters (reference: hard-coded in trainCNN.py [U]).

    Defaults follow SURVEY.md §5.6 / the LVA/ICA 2017 description: 50
    vertical filters spanning `conv1_freq` bins, 50 horizontal filters
    spanning `time_context//2` frames, 128-unit bottleneck. All [M] —
    converted reference checkpoints are the shape oracle.
    """

    time_context: int = 30
    feat_size: int = 513
    channels_in: int = 1
    num_sources: int = 2
    conv1_filters: int = 50
    conv1_freq: int = 30
    conv1_freq_stride: int = 1
    conv2_filters: int = 50
    conv2_time: int | None = None  # None → time_context // 2
    bottleneck: int = 128
    # How the decoder collapses the input-channel axis back to one magnitude
    # plane when channels_in > 1 (score-informed runs). "first" keeps the
    # mixture channel, "sum" sums all reconstructed channels, "all" keeps
    # every channel — per-channel source estimates (B, S, C, T, F), the
    # stereo-native joint model (both ears in one forward; the reference
    # was mono-only, SURVEY.md §2.1 #5).
    decoder_reduce: str = "first"
    # MXU compute dtype: "float32" (parity) or "bfloat16" (speed; params stay
    # float32, activations/matmuls run bf16, output cast back to float32).
    compute_dtype: str = "float32"
    # Dtype of the DECODE OUTPUT / mask-magnitude tail (the (B·nseg, S,
    # W_pad, T·M) → (B, S, nf, F) tensor family between the decoder and
    # the Wiener mask). "bfloat16" halves the bytes of every post-decode
    # layout pass AND the Wiener kernel's dominant y-read traffic; the
    # mask RATIO y_s/Σy_j is still computed in f32 (the kernel upcasts in
    # VMEM), so only the magnitudes themselves carry bf16 rounding
    # (~0.4% rel) — measured stem SNR vs the f32 tail is far above the
    # separation error floor (see BASELINE.md 2026-08-20 decision
    # record). The r4 compute_dtype=bfloat16 A/B was a wash precisely
    # because it left this tail in f32. Training always uses float32
    # (trainable_config resets it).
    mask_dtype: str = "float32"
    # Tied-decoder implementation: "bandconv" (default) = BOTH decode
    # stages composed into one conv along W' (band_freq_conv_kernel — the
    # (N·W, T·I) intermediate never materializes; dsd100 scan64 4.92→3.53
    # ms/track device, ikala scan48 ~2× vs "band", 2026-08-17), "band" =
    # time stage as a banded-matrix GEMM + freq stage as a regular conv,
    # "conv" = regular MXU convolutions for both stages, "conv_transpose"
    # = lax.conv_transpose (reference-shaped vjp formulation, kept for
    # parity tests). Identical math in all of them.
    decoder_impl: str = "bandconv"
    # Column order of the fc_expand weight — i.e. the layout the expansion
    # dense's output "fold" arrives in. "wmajor" (default): (W', Tp, C) so
    # the band GEMM + w-major freq decode consume it with ZERO transposes
    # (a weight-column permutation is free for the GEMM; the r1 layout paid
    # a materialized w-relayout of the ~270 MB fold — ROADMAP r2 #3).
    # "tmajor": the r1 (Tp, W', C) order, kept as a decision record and for
    # loading r1-era orbax checkpoints. The checkpoint converter maps
    # reference pickles into either order (ckpt/convert_reference.py).
    expand_order: str = "wmajor"
    # Encoder implementation. "collapsed" (default): the encoder has NO
    # nonlinearity before the post-fc ReLU, so conv1 → conv2 → flatten →
    # fc is composed INTO one (B, T·F·C)·(T·F·C, bottleneck) GEMM — the
    # composition is the tied-decoder adjoint applied to the fc weight
    # columns (the same verified band/freq decode helpers). Removes conv1,
    # conv2, the materialized flatten relayout (dsd100 2026-08-17 trace:
    # reshape.157, 0.79 ms/track = 14% of scan-body device time) and the
    # separate fc GEMM: ~20× fewer encoder FLOPs, identical math and
    # parameters. The ~50–150 GFLOP composition must be hoisted MANUALLY
    # out of lax.map/scan bodies (XLA won't — measured wash in-body,
    # 2026-08-17) via precompose_collapsed(); the batched/streaming entry
    # points do. Measured on the v5e full program: dsd100 scan64 5.58 vs
    # 6.12 ms/track (5988× vs 5463×), ikala scan48 11.41 vs 12.90
    # (2929× vs 2592×). "conv": the reference-shaped chain — what
    # training uses (trainable_config(); per-step batches are too small
    # to amortize the composition). A third formulation — contracting the
    # un-flattened conv output with dot_general ("conv4d") — measured
    # identical to "conv" on the full program (5.97 vs 5.98 ms/track
    # dsd100 scan64): XLA canonicalizes it back to reshape+GEMM. Not kept.
    encoder_impl: str = "collapsed"
    # Where _FcExpandWPad applies the W'→W_pad sublane padding. "kernel"
    # (default, inference): pad a trace-time VIEW of the fc_expand weight,
    # so the dense emits the padded 4-D fold directly (free bitcast, no
    # relayout). "output": run the dense on the stored 2-D weight and pad
    # the ACTIVATION after — identical math (padded stripes stay zero),
    # but the weight gradient becomes a clean dot_general transpose
    # instead of the pad-fused convolution XLA emits for the kernel-pad
    # backward (EmitInputBatchInLanes, 4.7 ms of a 14.9 ms dsd100 B=32
    # train step — 2026-08-18 trace). trainable_config() selects it.
    expand_pad: str = "kernel"

    @property
    def conv2_time_eff(self) -> int:
        return self.conv2_time if self.conv2_time is not None else self.time_context // 2

    @property
    def enc_time(self) -> int:
        """Frames after the (VALID) horizontal conv."""
        return self.time_context - self.conv2_time_eff + 1

    @property
    def enc_freq(self) -> int:
        """Bins after the (VALID, strided) vertical conv."""
        return (self.feat_size - self.conv1_freq) // self.conv1_freq_stride + 1

    @property
    def enc_flat(self) -> int:
        return self.enc_time * self.enc_freq * self.conv2_filters


def tied_conv_transpose(
    y: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int],
    out_spatial: Sequence[int],
) -> jnp.ndarray:
    """Gradient-of-conv (Lasagne InverseLayer) with a tied kernel.

    y: (B, H', W', O); kernel: HWIO as used by the forward VALID conv;
    returns (B, *out_spatial, I). When the forward stride did not evenly
    tile the input, the true vjp leaves an uncovered zero tail — replicated
    here by zero-padding up to `out_spatial`.
    """
    out = jax.lax.conv_transpose(
        y,
        kernel,
        strides=tuple(strides),
        padding="VALID",
        transpose_kernel=True,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    pads = [(0, 0)]
    for got, want in zip(out.shape[1:-1], out_spatial):
        if got > want:
            raise ValueError(f"transpose output {out.shape} exceeds target {out_spatial}")
        pads.append((0, want - got))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        out = jnp.pad(out, pads)
    return out


def tied_conv_transpose_regular(
    y: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int],
    out_spatial: Sequence[int],
) -> jnp.ndarray:
    """`tied_conv_transpose` re-expressed as ONE regular (stride-1) conv.

    XLA-TPU lowers input-dilated convolutions (what conv_transpose becomes)
    to slow loop fusions instead of MXU convolution calls — profiled at
    4.3 ms + 1.6 ms per 33 s dsd100 track in r1's device trace. Rewriting:

    * height (stride 1): the vjp of a VALID conv is a FULL-padded
      cross-correlation with the kernel flipped and in/out channels swapped;
    * width (stride s): phase decomposition — output bins f = s·g + d are
      computed as s conv OUTPUT CHANNELS over g with ktaps = ceil(kw/s)
      taps, then a free (g, d)-merge reshape recovers the bin axis.

    Bit-identical math (same adds in the same per-tap order), MXU-eligible,
    autodiff-friendly. Verified against `tied_conv_transpose`/`jax.vjp` in
    tests/test_model.py.
    """
    kh, kw, I, O = kernel.shape
    sh, sw = strides
    if sh != 1:
        raise NotImplementedError("height stride >1 not used by any preset")
    ktaps = -(-kw // sw)
    k = kernel
    if ktaps * sw != kw:
        k = jnp.pad(k, ((0, 0), (0, ktaps * sw - kw), (0, 0), (0, 0)))
    # (kh, ktaps, sw, I, O) → flip conv taps (h and j), order out-chan (d, i)
    k = k.reshape(kh, ktaps, sw, I, O)[::-1, ::-1]
    k = k.transpose(0, 1, 4, 2, 3).reshape(kh, ktaps, O, sw * I)
    o = jax.lax.conv_general_dilated(
        y,
        k,
        (1, 1),
        [(kh - 1, kh - 1), (ktaps - 1, ktaps - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H'+kh-1, W'+ktaps-1, sw*I)
    B, Ho, Wo, _ = o.shape
    out = o.reshape(B, Ho, Wo * sw, I)
    h_full = y.shape[1] + kh - 1
    w_full = (y.shape[2] - 1) * sw + kw
    out = out[:, :h_full, :w_full]
    return _pad_to(out, out_spatial)


def tied_conv_transpose_fused2d(
    z: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    stride: int,
    out_spatial: Sequence[int],
) -> jnp.ndarray:
    """BOTH decode stages as ONE 2-D conv with a composed kernel.

    The time stage (k2: (kh, 1, I, O), stride 1) and freq stage (k1:
    (1, kw, C_in, I), stride s) act on DISJOINT spatial axes, so their
    phase-decomposed conv kernels (see `tied_conv_transpose_regular`)
    compose by a pure channel contraction over the tied I channels — no
    spatial convolution between kernels:

        K[h, j, o, (d, c)] = Σ_i  k2ᵗ[h, o, i] · k1ᵗ[j, i, (d, c)]

    One VALID-vjp conv of the expansion fold with K then yields d1
    directly. This skips the (n, T, F', I) intermediate entirely (282 MB
    per ikala track) and cuts decoder FLOPs ~1.6× (dsd100) / ~2.2×
    (ikala) because the freq reduction (I → C_in) is applied before the
    time expansion's output is ever materialized.
    """
    kh, kw1, I2, O2 = k2.shape
    _, kw, C_in, O1 = k1.shape
    if kw1 != 1 or k1.shape[0] != 1:
        raise ValueError(f"fused decode expects (kh,1,I,O) + (1,kw,C,I) kernels, got {k2.shape}, {k1.shape}")
    if O1 != I2:
        raise ValueError(f"tied channel mismatch: k1 out {O1} != k2 in {I2}")
    ktaps = -(-kw // stride)
    k1p = k1
    if ktaps * stride != kw:
        k1p = jnp.pad(k1, ((0, 0), (0, ktaps * stride - kw), (0, 0), (0, 0)))
    # per tied_conv_transpose_regular: flip taps, out-channels (phase, in)
    k1t = k1p.reshape(ktaps, stride, C_in, O1)[::-1]  # (j, d, c, i)
    k2t = k2[::-1, 0]  # (h, i, o) taps flipped
    K = jnp.einsum("hio,jdci->hjodc", k2t, k1t).reshape(
        kh, ktaps, O2, stride * C_in
    )
    o = jax.lax.conv_general_dilated(
        z,
        K,
        (1, 1),
        [(kh - 1, kh - 1), (ktaps - 1, ktaps - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (n, Tp+kh-1, W'+ktaps-1, stride*C_in)
    B, Ho, Wo, _ = o.shape
    out = o.reshape(B, Ho, Wo * stride, C_in)
    w_full = (z.shape[2] - 1) * stride + kw
    out = out[:, :, :w_full]
    return _pad_to(out, out_spatial)


def tied_conv_transpose_band(y: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Time-stage decode (kw==1 kernels) as ONE GEMM against a banded tap
    matrix: out[n,H,w,i] = Σ_{h,o} y[n,h,w,o] · K[H-h, 0, i, o].

    Identical math to `tied_conv_transpose_regular` for (kh, 1, I, O)
    kernels with stride 1 (the conv2/time decoder stage — the full conv
    along time always lands exactly on time_context frames). Exists for
    layout, not FLOPs: inside the fused program the conv formulation reads
    the expansion dense's row-major output through a layout-transition
    fusion (measured 4.28 ms + a 1.39 ms materialized reshape per dsd100
    track on a v5e, vs 1.30 ms for the same conv with a native-layout
    operand); contracting (h, o) against a dense band matrix lets XLA lower
    one MXU GEMM straight off the row-major fold (chain-benched 1.34 ms/
    track faster than the conv end to end, ≤3e-7 rel difference).
    """
    kh, kw, I, O = kernel.shape
    if kw != 1:
        raise ValueError(f"band decode expects a (kh, 1, I, O) kernel, got {kernel.shape}")
    Tp = y.shape[1]
    T = Tp + kh - 1  # full conv along time == time_context by construction
    hp = jnp.arange(Tp)[:, None]
    H = jnp.arange(T)[None, :]
    delta = H - hp  # (Tp, T); valid taps are 0 <= delta < kh
    valid = (delta >= 0) & (delta < kh)
    idx = jnp.clip(delta, 0, kh - 1)
    taps = kernel[:, 0].transpose(0, 2, 1)  # (kh, O, I)
    band = taps[idx] * valid[:, :, None, None].astype(kernel.dtype)  # (Tp,T,O,I)
    return jnp.einsum("nhwo,hHoi->nHwi", y, band)


def freq_decode_wmajor(
    y: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    out_freq: int,
    in_freq: int | None = None,
) -> jnp.ndarray:
    """Freq-stage decode consuming the W-MAJOR band-kernel layout.

    `y` is (N, W', T, O) — the Pallas band stage's output orientation
    (models/decoder_pallas.py) — and the result is (N, T, F, I), matching
    `tied_conv_transpose_regular(..., k1, ...)` on the (N, T, W', O)
    orientation. Same phase-decomposition math with the conv taken along
    axis 1; the only materialized transposes are on the (F, T, I)-sized
    result (~24 MB for a dsd100 track), not the 100 MB fold.

    `in_freq`: the TRUE W' when `y` carries trailing sublane-alignment
    zero-padding rows (the `_FcExpandWPad` path) — the conv runs over the
    padded axis (zero rows contribute nothing) and the output is sliced to
    the unpadded full-conv extent.
    """
    kh, kw, I, O = kernel.shape
    if kh != 1:
        raise ValueError(f"freq decode expects a (1, kw, I, O) kernel, got {kernel.shape}")
    k, ktaps = _freq_conv_kernel(kernel, stride)
    o = jax.lax.conv_general_dilated(
        y,
        k,
        (1, 1),
        [(ktaps - 1, ktaps - 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, W'+ktaps-1, T, stride*I)
    return _phase_merge_tail(
        o, stride, I, kw,
        in_freq if in_freq is not None else y.shape[1], out_freq,
    )


def _freq_conv_kernel(kernel: jnp.ndarray, stride: int) -> tuple[jnp.ndarray, int]:
    """Phase-decomposed freq-decode conv kernel: (1, kw, I, O) tied forward
    kernel → ((ktaps, 1, O, stride·I), ktaps). Taps flipped, out channels
    ordered (phase, in-channel); the conv runs along the freq' axis with a
    singleton tap over time."""
    kh, kw, I, O = kernel.shape
    ktaps = -(-kw // stride)
    k = kernel
    if ktaps * stride != kw:
        k = jnp.pad(k, ((0, 0), (0, ktaps * stride - kw), (0, 0), (0, 0)))
    k = k.reshape(ktaps, stride, I, O)[::-1]
    return k.transpose(0, 3, 1, 2).reshape(ktaps, 1, O, stride * I), ktaps


def _phase_merge_tail(
    o: jnp.ndarray, stride: int, I: int, kw: int, in_freq: int, out_freq: int,
    out_dtype=None,
) -> jnp.ndarray:
    """(N, Wo, T, stride·I) full-conv output → (N, T, F, I): merge the
    stride phases into freq bins, slice the valid full-conv extent
    ((in_freq-1)·stride + kw), zero-pad to `out_freq`, reorient.

    ONE transpose, not two: moving T out FIRST makes the (Wo, stride)
    phase merge a contiguous-minor-dims reshape (free), so the whole tail
    is a single materialized copy + slice/pad. The original
    reshape→transpose(0,1,3,2,4)→transpose(0,2,1,3) form cost two
    near-bandwidth passes over the (B·nseg·S, Wo, T, stride) family —
    copy.112 (6.5 ms) + copy.113 (6.1 ms) in the highres4096 b32 trace
    (2026-08-20); this form lowers to one.

    `out_dtype` (mask_dtype): cast BEFORE the transpose so the
    materialized pass moves half the bytes when the mask tail is bf16."""
    if out_dtype is not None:
        o = o.astype(out_dtype)
    N, Wo, T, _ = o.shape
    o = o.reshape(N, Wo, T, stride, I).transpose(0, 2, 1, 3, 4)
    o = o.reshape(N, T, Wo * stride, I)
    w_full = (in_freq - 1) * stride + kw
    w_keep = min(w_full, o.shape[2])
    if out_freq < w_keep:
        raise ValueError(f"decode output {o.shape} exceeds target freq {out_freq}")
    pad_f = out_freq - w_keep
    if w_keep != o.shape[2]:
        o = o[:, :, :w_keep]
    if pad_f:
        o = jnp.pad(o, ((0, 0), (0, 0), (0, pad_f), (0, 0)))
    return o


def _band_matrix_for(kernel: jnp.ndarray, Tp: int) -> jnp.ndarray:
    """(kh, 1, I, O) tied time-kernel → dense (Tp·O, T·I) banded tap matrix
    for the w-major band GEMM (zeros outside the kh-tap band)."""
    kh, kw, I, O = kernel.shape
    if kw != 1:
        raise ValueError(f"band decode expects a (kh, 1, I, O) kernel, got {kernel.shape}")
    T = Tp + kh - 1
    hp = jnp.arange(Tp)[:, None]
    H = jnp.arange(T)[None, :]
    delta = H - hp
    valid = (delta >= 0) & (delta < kh)
    idx = jnp.clip(delta, 0, kh - 1)
    taps = kernel[:, 0].transpose(0, 2, 1)  # (kh, O, I)
    band = taps[idx] * valid[:, :, None, None].astype(kernel.dtype)  # (Tp,T,O,I)
    return band.transpose(0, 2, 1, 3).reshape(Tp * O, T * I)


def band_decode_wmajor(y: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Time-stage band decode as an EXPLICIT 2-D GEMM with w-major output.

    Same contraction as `tied_conv_transpose_band` — out[n,w,H,i] =
    Σ_{h,o} y[n,h,w,o]·K[H-h,0,i,o] — but shaped (N·W, Tp·C) @ (Tp·C, T·I)
    with the (n, w) axes as GEMM rows and the result left w-major for
    `freq_decode_wmajor`. Chain-benchmarked on the v5e (2026-08-17):
    31% faster than the 4-D einsum for ikala shapes (W=484) and ~equal
    for dsd100 (W=162) — XLA physically produced the einsum's output as
    (H, i, n, w) and paid a big relayout where W is wide.
    """
    N, Tp, W, O = y.shape
    bm = _band_matrix_for(kernel, Tp)
    y2 = y.transpose(0, 2, 1, 3).reshape(N * W, Tp * O)
    T = Tp + kernel.shape[0] - 1
    return (y2 @ bm).reshape(N, W, T, kernel.shape[2])


def band_decode_wmajor_fold(z: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """`band_decode_wmajor` consuming an ALREADY w-major fold (N, W, Tp, O)
    — the expand_order="wmajor" layout — with zero transposes anywhere:
    the fold reshapes straight into the GEMM's row-major LHS."""
    N, W, Tp, O = z.shape
    bm = _band_matrix_for(kernel, Tp)
    T = Tp + kernel.shape[0] - 1
    return (z.reshape(N * W, Tp * O) @ bm).reshape(N, W, T, kernel.shape[2])


def band_decode_wmajor_rows(zf: jnp.ndarray, kernel: jnp.ndarray, Tp: int) -> jnp.ndarray:
    """Band GEMM on a pre-folded (rows, Tp·O) LHS → (rows, T·I).

    The `_FcExpandWPad` path: rows = B·S·W_pad where the (B, S, W_pad)
    merge is a pure bitcast (W_pad is sublane-aligned and Tp·O is the
    unchanged minor dim), so the fold relayout the plain Dense path pays
    (reshape.202 in the scan64 trace, 0.79 ms/track) never materializes.
    """
    return zf @ _band_matrix_for(kernel, Tp)


def band_freq_conv_kernel(
    k2: jnp.ndarray, k1: jnp.ndarray, Tp: int, stride: int
) -> tuple[jnp.ndarray, int, int, int]:
    """Compose time-stage band decode and freq-stage decode into ONE conv
    kernel: ((ktaps, 1, Tp·O, T·(stride·C)), ktaps, T, stride·C).

    Both decode stages are linear, so their composition is a single conv
    along W' with in-channels Tp·O (the whole per-(n,w) fold column) and
    out-channels T·stride·C:

        out[n, wo, (t, m)] = Σ_{τ, p, o} z[n, wo−pad+τ, (p,o)] · KC[τ, (p,o), (t,m)]
        KC[τ, c, (t, m)]   = Σ_i bm[c, (t,i)] · kc[τ, i, m]

    with bm the banded tap matrix (`_band_matrix_for`) and kc the
    phase-decomposed freq kernel (`_freq_conv_kernel`). Removes the
    (N·W, T·I) intermediate (≈226 MB/track on dsd100) between the band
    GEMM and the freq conv. The composition is ~65 MFLOP — loop-invariant,
    hoisted out of scan bodies by XLA (unlike the collapsed-encoder
    composition, it is cheap enough to leave in-body too).
    """
    kh2, kw2, I2, O2 = k2.shape
    T = Tp + kh2 - 1
    bm3 = _band_matrix_for(k2, Tp).reshape(Tp * O2, T, I2)  # (c, t, i)
    kc, ktaps = _freq_conv_kernel(k1, stride)  # (ktaps, 1, I2, stride·C)
    M = kc.shape[3]
    KC = jnp.einsum("cti,uim->uctm", bm3, kc[:, 0])
    return KC.reshape(ktaps, 1, Tp * O2, T * M), ktaps, T, M


def _pad_to(out: jnp.ndarray, out_spatial: Sequence[int]) -> jnp.ndarray:
    pads = [(0, 0)]
    for got, want in zip(out.shape[1:-1], out_spatial):
        if got > want:
            raise ValueError(f"decode output {out.shape} exceeds target {out_spatial}")
        pads.append((0, want - got))
    pads.append((0, 0))
    return jnp.pad(out, pads) if any(p != (0, 0) for p in pads) else out


def trainable_config(cfg: "ConvSepConfig") -> "ConvSepConfig":
    """Differentiable-equivalent config: the Pallas band stage has no vjp,
    so training paths swap decoder_impl="band_pallas" for the identical-
    math (and identically-parameterized) einsum formulation; the collapsed
    encoder (whose ~50–150 GFLOP weight composition only amortizes over
    inference-sized dispatches) reverts to the conv chain."""
    if cfg.decoder_impl == "band_pallas":
        cfg = dataclasses.replace(cfg, decoder_impl="band")
    if cfg.decoder_impl in ("bandconv_pallas", "auto"):
        cfg = dataclasses.replace(cfg, decoder_impl="bandconv")
    if cfg.encoder_impl == "collapsed":
        cfg = dataclasses.replace(cfg, encoder_impl="conv")
    if cfg.expand_pad == "kernel":
        # output-pad expansion: same math, GEMM weight-gradient (see
        # ConvSepConfig.expand_pad)
        cfg = dataclasses.replace(cfg, expand_pad="output")
    if cfg.mask_dtype != "float32":
        # the bf16 mask tail is an inference-serving trade; gradients
        # flow through the decode output, so training keeps f32
        cfg = dataclasses.replace(cfg, mask_dtype="float32")
    return cfg


def _compose_collapsed_fc(
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    cfg: ConvSepConfig,
    dt: jnp.dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(fc kernel, fc bias, conv params) → (W_eff (T·F·C, J), c (J,)).

    W_eff columns are the tied-decoder adjoint (band + freq decode, the
    ``jax.vjp``-verified helpers) of the fc kernel columns; c folds
    conv1/conv2's biases through the chain analytically.
    """
    J = cfg.bottleneck
    # unflatten rows in the (T', F', C2) row-major flatten order, then
    # run the adjoint decode chain with bottleneck columns as the batch
    w4 = kernel.astype(dt).reshape(cfg.enc_time, cfg.enc_freq, cfg.conv2_filters, J)
    zcols = w4.transpose(3, 0, 1, 2)  # (J, T', F', C2)
    d2wm = band_decode_wmajor(zcols, k2.astype(dt))  # (J, F', T, C1)
    weff = freq_decode_wmajor(
        d2wm, k1.astype(dt), cfg.conv1_freq_stride, cfg.feat_size
    )  # (J, T, F, C)
    w_eff = weff.reshape(J, -1).T  # (T·F·C, J)
    # bias constant: conv2(conv1(0)+b1)+b2 is the per-C2 constant
    # Σ_{h,i} k2[h,0,i,o]·b1[i] + b2[o], contracted with the kernel
    h2c = jnp.einsum("hwio,i->o", k2.astype(dt), b1.astype(dt)) + b2.astype(dt)
    c = bias.astype(dt) + h2c @ w4.sum(axis=(0, 1))
    return w_eff, c


def precompose_collapsed(variables, cfg: ConvSepConfig):
    """Augment a variables dict with the collapsed encoder's composed
    weight under the ``enc_cache`` collection (no-op unless
    ``encoder_impl="collapsed"``).

    XLA does NOT hoist the ~50–150 GFLOP composition out of
    ``lax.map``/``lax.scan`` while-loop bodies (measured 2026-08-17: the
    in-body composition cost exactly cancelled the conv chain it removed).
    Call this OUTSIDE the loop (batched entry points do, inside their jit
    — the composition lands in the program prologue, once per dispatch) or
    once per separator for repeated-dispatch streaming paths.
    """
    if cfg.encoder_impl != "collapsed" or "enc_cache" in variables:
        return variables
    p = variables["params"]
    dt = jnp.dtype(cfg.compute_dtype)
    w_eff, c = _compose_collapsed_fc(
        p["fc"]["kernel"],
        p["fc"]["bias"],
        p["conv1_kernel"],
        p["conv1_bias"],
        p["conv2_kernel"],
        p["conv2_bias"],
        cfg,
        dt,
    )
    return {**variables, "enc_cache": {"fc": {"w_eff": w_eff, "bias_eff": c}}}


class _FcExpandWPad(nn.Module):
    """Per-source expansion dense emitting a 4-D (B, S, W_pad, Tp·C2) fold.

    Declares the IDENTICAL param tree as the plain ``nn.Dense`` expansion
    (kernel (bottleneck, S·enc_flat) in w-major column order, bias) — the
    padding is applied to a trace-time VIEW of the kernel, never stored.
    W' is zero-padded up to a multiple of 8 (the float32 sublane tile) so
    the downstream ``(B, S, W_pad, Tp·C2) → (B·S·W_pad, Tp·C2)`` fold
    merges only major axes on tile boundaries with the minor dim unchanged
    — a free bitcast instead of the materialized relayout XLA emits for
    the 2-D dense + fold (reshape.202, 0.79 ms/track in the dsd100 scan64
    trace; the vmap-batch variant paid ~2.5 ms/track in a relayout while
    loop). Padded columns are exact zeros (zero weight columns, zero
    bias), so band-GEMM rows and freq-conv taps over them are zeros and
    the sliced output is bitwise unaffected.
    """

    config: ConvSepConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, fc: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        cfg = self.config
        S, J = cfg.num_sources, cfg.bottleneck
        W, TpC = cfg.enc_freq, cfg.enc_time * cfg.conv2_filters
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (J, S * cfg.enc_flat)
        )
        bias = self.param("bias", nn.initializers.zeros, (S * cfg.enc_flat,))
        W_pad = -(-W // 8) * 8
        dt = self.dtype
        if cfg.expand_pad == "output":
            # training path: clean 2-D GEMM (dW is a dot transpose, not the
            # pad-fused conv the kernel-pad backward triggers). No sublane
            # padding at all: the fold is a materialized reshape here
            # anyway, and the decode tail's valid-extent slice
            # ((W'-1)·stride + kw) fits the unpadded full conv exactly
            # (_phase_merge_tail) — both band decoders accept any W_pad.
            out = jax.lax.dot_general(
                fc.astype(dt), kernel.astype(dt), (((1,), (0,)), ((), ()))
            ) + bias.astype(dt)
            return out.reshape(out.shape[0], S, W, TpC), W
        if cfg.expand_pad != "kernel":
            raise ValueError(
                f"unknown expand_pad {cfg.expand_pad!r}; have kernel | output"
            )
        k4 = kernel.astype(dt).reshape(J, S, W, TpC)
        b3 = bias.astype(dt).reshape(S, W, TpC)
        if W_pad != W:
            pad = ((0, 0), (0, 0), (0, W_pad - W), (0, 0))
            k4 = jnp.pad(k4, pad)
            b3 = jnp.pad(b3, pad[1:])
        out = jax.lax.dot_general(
            fc.astype(dt), k4, (((1,), (0,)), ((), ()))
        )  # (B, S, W_pad, Tp·C2)
        return out + b3, W_pad


class _FcExpandParams(nn.Module):
    """Raw fc_expand param declaration (identical tree to _FcExpandWPad /
    nn.Dense) for decoders that consume the kernel/bias directly — the
    fused Mosaic decode kernel streams the kernel from HBM itself.

    When the caller provides a ``dec_cache`` collection
    (:func:`prepare_inference`), the top-level ConvSep pallas branch swaps
    the raw kernel for the pre-prepared form before the Mosaic call."""

    config: ConvSepConfig

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if self.has_variable("dec_cache", "k4"):
            # prepared form REPLACES the raw leaf (prepare_inference drops
            # it from the pytree): keeping both would double the weight's
            # HBM footprint — the +827 MB tipped multires4096's b32 row
            # and the watermark probe into RESOURCE_EXHAUSTED (bench run
            # 2026-08-20)
            kernel = self.get_variable("dec_cache", "k4")
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (cfg.bottleneck, cfg.num_sources * cfg.enc_flat),
            )
        bias = self.param(
            "bias", nn.initializers.zeros, (cfg.num_sources * cfg.enc_flat,)
        )
        return kernel, bias


class _FcExpandWPadNLast(nn.Module):
    """Batch-LAST variant of :class:`_FcExpandWPad`: emits the expansion as
    (W_pad, Tp·C2, S, B) — the GEMM computed kernel-side-first so the
    batch lands on the minor axis.

    Why: XLA's conv emitter for the composed bandconv decode
    (EmitInputBatchInLanes) wants the batch dim minor; with the standard
    batch-major expansion it relayouts the ~1.3 GB (vmap8 highres4096)
    ReLU output twice before the conv (copy.111/copy.115, ~8.4 ms/batch,
    trace 2026-08-19). Emitting batch-last makes the conv input layout the
    natural one. Declares the IDENTICAL param tree as _FcExpandWPad /
    nn.Dense — checkpoints are interchangeable.
    """

    config: ConvSepConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, fc: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        cfg = self.config
        S, J = cfg.num_sources, cfg.bottleneck
        W, TpC = cfg.enc_freq, cfg.enc_time * cfg.conv2_filters
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (J, S * cfg.enc_flat)
        )
        bias = self.param("bias", nn.initializers.zeros, (S * cfg.enc_flat,))
        W_pad = -(-W // 8) * 8
        dt = self.dtype
        k4 = kernel.astype(dt).reshape(J, S, W, TpC).transpose(0, 2, 3, 1)
        b4 = bias.astype(dt).reshape(S, W, TpC).transpose(1, 2, 0)
        if W_pad != W:
            k4 = jnp.pad(k4, ((0, 0), (0, W_pad - W), (0, 0), (0, 0)))
            b4 = jnp.pad(b4, ((0, W_pad - W), (0, 0), (0, 0)))
        out = jax.lax.dot_general(
            k4, fc.astype(dt), (((0,), (1,)), ((), ()))
        )  # (W_pad, Tp·C2, S, B)
        return out + b4[..., None], W_pad


class _CollapsedFc(nn.Module):
    """The whole encoder (conv1 → conv2 → flatten → fc) as ONE GEMM.

    The encoder is affine — no nonlinearity precedes the post-fc ReLU — so
    ``fc_j(x) = ⟨x, A(W[:, j])⟩ + c_j`` where ``A`` is the adjoint of
    ``flatten ∘ conv2 ∘ conv1``: exactly the tied-decoder chain
    (:func:`band_decode_wmajor` + :func:`freq_decode_wmajor`, verified
    against ``jax.vjp`` of the forward convs) applied to the fc kernel's
    columns. The composed weight W_eff is (T·F·C, bottleneck), the input
    flatten is a free trailing-dims reshape, and the bias constant folds
    conv1/conv2's biases through the same chain analytically.

    Declares the IDENTICAL param tree as the "conv" path's ``nn.Dense``
    (name "fc", kernel (enc_flat, bottleneck) lecun-normal, bias zeros) —
    checkpoints are interchangeable between encoder impls. When the caller
    provides a precomposed ``enc_cache`` collection
    (:func:`precompose_collapsed`), the composition is skipped entirely.
    """

    config: ConvSepConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        k1: jnp.ndarray,
        b1: jnp.ndarray,
        k2: jnp.ndarray,
        b2: jnp.ndarray,
    ) -> jnp.ndarray:
        cfg = self.config
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cfg.enc_flat, cfg.bottleneck),
        )
        bias = self.param("bias", nn.initializers.zeros, (cfg.bottleneck,))
        dt = self.dtype
        if self.has_variable("enc_cache", "w_eff"):
            w_eff = self.get_variable("enc_cache", "w_eff").astype(dt)
            c = self.get_variable("enc_cache", "bias_eff").astype(dt)
        else:
            w_eff, c = _compose_collapsed_fc(kernel, bias, k1, b1, k2, b2, cfg, dt)
        # contract the UN-flattened (B, T, F, C) input directly: the STFT
        # chain produces the magnitude frames-minor ({0,1} layout), so a
        # semantic (B, T·F·C) flatten forces a materialized transpose;
        # dot_general over (T, F, C) lets layout assignment negotiate the
        # contraction order with the producer instead
        w4e = w_eff.reshape(cfg.time_context, cfg.feat_size, cfg.channels_in, -1)
        y = jax.lax.dot_general(
            x.astype(dt), w4e, (((1, 2, 3), (0, 1, 2)), ((), ()))
        )
        return y + c


def prepare_inference(cfg: "ConvSepConfig", variables):
    """Augment a variables dict with the fused Mosaic decode's pre-prepared
    fc_expand kernel under the ``dec_cache`` collection (no-op unless the
    config resolves to "bandconv_pallas"). Companion to
    :func:`precompose_collapsed`, same contract.

    Why: the kernel's operand prep (reshape → relayout → w pad → dtype
    cast of the raw 2-D fc_expand weight) is THREE full HBM passes over
    the 827 MB highres4096 leaf — ~8 ms, HALF the single-track device time
    (b32 trace 2026-08-20) — re-executed on EVERY dispatch because XLA
    cannot hoist transformations of a traced argument. Calling this once
    per separator moves it off the dispatch path entirely. The raw leaf is
    REMOVED from the returned pytree (the module reads the dec_cache form
    instead): keeping both doubles the weight's HBM footprint, which
    tipped multires4096 b32 + the watermark probe into OOM (bench run
    2026-08-20). Training and checkpoints always use the raw leaf; never
    checkpoint a prepared pytree."""
    if (
        resolve_decoder_impl(cfg) != "bandconv_pallas"
        # the ConvSep pallas branch additionally requires the w-major
        # expansion layout; an explicit decoder_impl="bandconv_pallas" with
        # expand_order="tmajor" falls through to decoders that declare the
        # raw kernel leaf, which must NOT be dropped (ADVICE r4)
        or cfg.expand_order != "wmajor"
        or not isinstance(variables, dict)
        or "dec_cache" in variables
        or "params" not in variables
    ):
        return variables
    try:
        kernel = variables["params"]["fc_expand"]["kernel"]
    except (KeyError, TypeError):
        return variables
    if getattr(kernel, "ndim", 0) != 2:
        return variables
    from convsep_tpu.models.decoder_fused_pallas import w_pad_rows

    S, J = cfg.num_sources, cfg.bottleneck
    W, TpC = cfg.enc_freq, cfg.enc_time * cfg.conv2_filters
    ktaps = -(-cfg.conv1_freq // cfg.conv1_freq_stride)
    W_pad = w_pad_rows(W, ktaps)
    dt = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def _prep(k):
        k4 = k.astype(dt).reshape(J, S, W, TpC)
        if W_pad != W:
            k4 = jnp.pad(k4, ((0, 0), (0, 0), (0, W_pad - W), (0, 0)))
        return k4

    k4 = _prep(kernel)
    # drop the raw leaf (see docstring); the dec_cache entry is scoped to
    # the fc_expand module path so _FcExpandParams reads it directly
    fe = {k: v for k, v in variables["params"]["fc_expand"].items() if k != "kernel"}
    params_wo = {**variables["params"], "fc_expand": fe}
    return {
        **variables,
        "params": params_wo,
        "dec_cache": {"fc_expand": {"k4": k4}},
    }


def resolve_decoder_impl(cfg: "ConvSepConfig") -> str:
    """The decoder implementation ``decoder_impl="auto"`` resolves to.

    "auto" picks the fused Mosaic decode kernel (decoder_fused_pallas.py)
    on TPU where its shape envelope holds (4096-pt preset geometry), and
    the XLA bandconv chain otherwise (CPU interpret mode would crawl;
    dsd100/ikala geometry is outside the kernel's supported shapes).

    Exposed so the bench can RECORD which decoder each preset row actually
    ran (VERDICT r3 #3: the kernel's value was asserted in commit messages
    but never recorded in a bench artifact).

    Resolution is device-aware (utils.backend.effective_backend, VERDICT
    r4 #7): a jit targeting a non-default backend via
    ``jax.default_device`` resolves against THAT device's platform, not
    the process-global default — a CPU jit inside a TPU process no longer
    bakes in the Mosaic branch.
    """
    if cfg.decoder_impl != "auto":
        return cfg.decoder_impl
    from convsep_tpu.models.decoder_fused_pallas import fused_decode_supported
    from convsep_tpu.utils.backend import effective_backend

    ktaps = -(-cfg.conv1_freq // cfg.conv1_freq_stride)
    if (
        cfg.expand_order == "wmajor"
        and effective_backend() == "tpu"
        and fused_decode_supported(
            cfg.enc_time * cfg.conv2_filters,
            cfg.time_context * cfg.conv1_freq_stride * cfg.channels_in,
            ktaps,
        )
    ):
        return "bandconv_pallas"
    return "bandconv"


class ConvSep(nn.Module):
    """Source-separation CNN; input (B, T, F, C) scaled magnitude.

    Two output layouts over the same parameters:

    * ``sources`` (B, S, T, F) — the network's NATIVE layout (the decoder
      folds sources into the batch axis), no data movement on the way out.
      The separation pipeline consumes this directly.
    * ``__call__`` (B, T, F, S) — sources-last view for mask math that
      broadcasts over a trailing sources axis (training loss path). The
      trailing-axis transpose this implies was measured at 1.4 ms/track on
      a v5e (a materialized lane transpose, ROADMAP r1 #3) — avoid it in
      inference paths.
    """

    config: ConvSepConfig

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, F, C) → (B, T, F, S) nonnegative source estimates.

        With ``decoder_reduce="all"`` (stereo-native): (B, T, F, S, C).
        """
        y = self.sources(x)
        if self.config.decoder_reduce == "all":
            return y.transpose(0, 2, 3, 1, 4)
        return y.transpose(0, 2, 3, 1)

    @nn.compact
    def sources(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, F, C) → (B, S, T, F): native source-major forward."""
        cfg = self.config
        B, T, F, C = x.shape
        if (T, F, C) != (cfg.time_context, cfg.feat_size, cfg.channels_in):
            raise ValueError(f"input {x.shape} does not match config {cfg}")

        k1 = self.param(
            "conv1_kernel",
            nn.initializers.glorot_uniform(),
            (1, cfg.conv1_freq, C, cfg.conv1_filters),
        )
        b1 = self.param("conv1_bias", nn.initializers.zeros, (cfg.conv1_filters,))
        k2 = self.param(
            "conv2_kernel",
            nn.initializers.glorot_uniform(),
            (cfg.conv2_time_eff, 1, cfg.conv1_filters, cfg.conv2_filters),
        )
        b2 = self.param("conv2_bias", nn.initializers.zeros, (cfg.conv2_filters,))

        dt = jnp.dtype(cfg.compute_dtype)
        xc, k1c, k2c = x.astype(dt), k1.astype(dt), k2.astype(dt)
        dn = ("NHWC", "HWIO", "NHWC")
        s1 = (1, cfg.conv1_freq_stride)
        if cfg.encoder_impl == "collapsed":
            fc = _CollapsedFc(cfg, dtype=dt, name="fc")(xc, k1c, b1, k2c, b2)
        elif cfg.encoder_impl == "conv":
            # vertical (frequency) conv — linear, bias via separate
            # BiasLayer in the reference
            h1 = jax.lax.conv_general_dilated(
                xc, k1c, s1, "VALID", dimension_numbers=dn
            )
            h1b = h1 + b1.astype(dt)
            # horizontal (time) conv — linear
            h2 = jax.lax.conv_general_dilated(
                h1b, k2c, (1, 1), "VALID", dimension_numbers=dn
            )
            h2b = h2 + b2.astype(dt)
            flat = h2b.reshape(B, -1)  # (B, enc_flat), (T', F', N2) row-major
            fc = nn.Dense(cfg.bottleneck, name="fc", dtype=dt)(flat)
        else:
            raise ValueError(
                f"unknown encoder_impl {cfg.encoder_impl!r}; have "
                "conv | collapsed"
            )
        fc = nn.relu(fc)

        # per-source expansion, fused into one dense: (B, S*enc_flat)
        S = cfg.num_sources
        wmajor = cfg.expand_order == "wmajor"
        if cfg.decoder_impl == "auto":
            cfg = dataclasses.replace(cfg, decoder_impl=resolve_decoder_impl(cfg))
        if wmajor and cfg.decoder_impl == "bandconv_pallas":
            # fused Mosaic decode: expansion GEMM → ReLU → composed band
            # GEMM → tap fold in ONE VMEM pass; the ~GB per-source
            # expansion never reaches HBM (decoder_fused_pallas.py)
            from convsep_tpu.models.decoder_fused_pallas import (
                band_freq_decode_pallas,
            )

            # _FcExpandParams returns the pre-prepared (J, S, W_pad, TpC)
            # compute-dtype form when a dec_cache collection is present
            # (prepare_inference) — skips ~8 ms/dispatch of operand
            # relayout+pad passes on 4096-pt presets
            kexp, bexp = _FcExpandParams(cfg, name="fc_expand")()
            TpC = cfg.enc_time * cfg.conv2_filters
            KC, ktaps, T, M = band_freq_conv_kernel(
                k2c, k1c, cfg.enc_time, cfg.conv1_freq_stride
            )
            o4, W_pad_k = band_freq_decode_pallas(
                fc, kexp, bexp, KC, ktaps, S, cfg.enc_freq, TpC, dt,
                out_dtype=jnp.dtype(cfg.mask_dtype),
            )  # (B, S, W_pad_k, T·M) in mask_dtype
            d1 = _phase_merge_tail(
                o4.reshape(B * S, W_pad_k, T, M),
                cfg.conv1_freq_stride, C, cfg.conv1_freq,
                cfg.enc_freq, cfg.feat_size,
            )
            return self._finish(d1, B, S, C, cfg)
        if wmajor and cfg.decoder_impl == "bandgemm":
            # composed decode as ONE explicit GEMM + a ktaps-shift fold:
            # the conv form's implicit GEMM has only T·M = out-channel
            # lanes (120 here — starved; EmitInputBatchInLanes relayouts
            # ~1.3 GB of input to compensate). Cat the taps into the GEMM's
            # output dim instead (N_out = ktaps·T·M) and overlap-add the
            # per-tap planes along W′ — the fold is ktaps-1 shifted adds
            # XLA fuses, and every matmul runs full-width.
            exp4, W_pad = _FcExpandWPad(cfg, dtype=dt, name="fc_expand")(fc)
            exp4 = nn.relu(exp4)
            TpC = cfg.enc_time * cfg.conv2_filters
            KC, ktaps, T, M = band_freq_conv_kernel(
                k2c, k1c, cfg.enc_time, cfg.conv1_freq_stride
            )
            kcat = KC[:, 0].transpose(1, 0, 2).reshape(TpC, ktaps * T * M)
            g = jax.lax.dot_general(
                exp4.reshape(B * S * W_pad, TpC), kcat,
                (((1,), (0,)), ((), ())),
            ).astype(dt)  # (B·S·W_pad, ktaps·T·M), fold in compute dtype
            g = g.reshape(B * S, W_pad, ktaps, T * M)
            Wo = W_pad + ktaps - 1
            # conv parity: out[wo] = Σ_τ z[wo + τ − (ktaps−1)]·KC[τ] — tap τ
            # of row w lands at wo = w + (ktaps−1) − τ. A sum of shifted
            # pads fuses into ONE elementwise pass over g (.at[].add
            # lowered to ktaps−1 full-size dynamic-update-slices, 41 ms at
            # batch16 — measured 2026-08-19)
            o = None
            for tap in range(ktaps):
                lo = ktaps - 1 - tap
                shifted = jnp.pad(
                    g[:, :, tap], ((0, 0), (lo, Wo - W_pad - lo), (0, 0))
                )
                o = shifted if o is None else o + shifted
            d1 = _phase_merge_tail(
                o.reshape(B * S, Wo, T, M),
                cfg.conv1_freq_stride, C, cfg.conv1_freq,
                cfg.enc_freq, cfg.feat_size,
            )
            return self._finish(d1, B, S, C, cfg)
        if wmajor and cfg.decoder_impl == "bandconv_nlast":
            # batch-LAST composed decode: expansion emits (W_pad, TpC, S, B)
            # so the conv runs with dimension_numbers HWCN — the batch is
            # already on the minor axis the emitter wants and the ~1.3 GB
            # pre-conv relayouts disappear; the (source, batch) transpose
            # back to batch-major happens on the 3.4× smaller conv OUTPUT
            expT, W_pad = _FcExpandWPadNLast(cfg, dtype=dt, name="fc_expand")(fc)
            expT = nn.relu(expT)
            TpC = cfg.enc_time * cfg.conv2_filters
            KC, ktaps, T, M = band_freq_conv_kernel(
                k2c, k1c, cfg.enc_time, cfg.conv1_freq_stride
            )
            o = jax.lax.conv_general_dilated(
                expT.reshape(W_pad, 1, TpC, S * B),
                KC,
                (1, 1),
                [(ktaps - 1, ktaps - 1), (0, 0)],
                dimension_numbers=("HWCN", "HWIO", "HWCN"),
            )  # (Wo, 1, T·M, S·B)
            Wo = W_pad + ktaps - 1
            o = o.reshape(Wo, T, M, S, B).transpose(4, 3, 0, 1, 2)
            d1 = _phase_merge_tail(
                o.reshape(B * S, Wo, T, M),
                cfg.conv1_freq_stride, C, cfg.conv1_freq,
                cfg.enc_freq, cfg.feat_size,
            )
            return self._finish(d1, B, S, C, cfg)
        if wmajor and cfg.decoder_impl in ("band", "bandconv"):
            # 4-D expansion (B, S, W_pad, Tp·C2): the band fold below is a
            # free bitcast (see _FcExpandWPad), bypassing the 2-D dense
            exp4, W_pad = _FcExpandWPad(cfg, dtype=dt, name="fc_expand")(fc)
            exp4 = nn.relu(exp4)
            TpC = cfg.enc_time * cfg.conv2_filters
            if cfg.decoder_impl == "bandconv":
                # both decode stages as ONE conv along W' — the (N·W, T·I)
                # intermediate never materializes (band_freq_conv_kernel)
                KC, ktaps, T, M = band_freq_conv_kernel(
                    k2c, k1c, cfg.enc_time, cfg.conv1_freq_stride
                )
                o = jax.lax.conv_general_dilated(
                    exp4.reshape(B * S, W_pad, 1, TpC),
                    KC,
                    (1, 1),
                    [(ktaps - 1, ktaps - 1), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )  # (N, Wo, 1, T·M)
                o = o.reshape(B * S, W_pad + ktaps - 1, T, M)
                d1 = _phase_merge_tail(
                    o, cfg.conv1_freq_stride, C, cfg.conv1_freq,
                    cfg.enc_freq, cfg.feat_size,
                    out_dtype=jnp.dtype(cfg.mask_dtype),
                )
                return self._finish(d1, B, S, C, cfg)
            d2f = band_decode_wmajor_rows(
                exp4.reshape(B * S * W_pad, TpC), k2c, cfg.enc_time
            )  # (B·S·W_pad, T·I)
            d2wm = d2f.reshape(B * S, W_pad, cfg.time_context, cfg.conv1_filters)
            d1 = freq_decode_wmajor(
                d2wm, k1c, cfg.conv1_freq_stride, cfg.feat_size,
                in_freq=cfg.enc_freq,
            )
            return self._finish(d1, B, S, C, cfg)
        exp = nn.Dense(S * cfg.enc_flat, name="fc_expand", dtype=dt)(fc)
        exp = nn.relu(exp)
        # fold sources into batch for the grouped transposed convs; with
        # expand_order="wmajor" the dense's columns are ordered (W', Tp, C)
        # so the w-major decode chain consumes the fold with NO transpose
        if wmajor:
            zwm = exp.reshape(B * S, cfg.enc_freq, cfg.enc_time, cfg.conv2_filters)
            z = None  # t-major view built lazily for the non-band impls
        elif cfg.expand_order == "tmajor":
            zwm = None
            z = exp.reshape(B * S, cfg.enc_time, cfg.enc_freq, cfg.conv2_filters)
        else:
            raise ValueError(f"unknown expand_order {cfg.expand_order!r}")
        if z is None and cfg.decoder_impl not in ("band", "band_pallas"):
            z = zwm.transpose(0, 2, 1, 3)  # parity impls want (N, Tp, W', C)
        if cfg.decoder_impl == "fused":
            d1 = tied_conv_transpose_fused2d(
                z, k1c, k2c, cfg.conv1_freq_stride,
                (cfg.time_context, cfg.feat_size),
            )
        elif cfg.decoder_impl == "band_pallas":
            # Mosaic band stage (inference-only: no vjp registered) — the
            # fold is consumed row-major, so neither the 100 MB relayout
            # copy nor the (T,F)-plane transpose ever materializes
            from convsep_tpu.models.decoder_pallas import band_decode_pallas

            zt = zwm.transpose(0, 2, 1, 3) if wmajor else z
            d2wm = band_decode_pallas(zt, k2c, cfg.time_context)
            d2wm = d2wm.reshape(
                B * S, cfg.enc_freq, cfg.time_context, cfg.conv1_filters
            )
            d1 = freq_decode_wmajor(d2wm, k1c, cfg.conv1_freq_stride, cfg.feat_size)
        elif cfg.decoder_impl == "band":
            # tmajor-only fallback (the wmajor band path returned above via
            # _FcExpandWPad). NOTE (decision record 2026-08-17): the fold
            # relayout does NOT disappear by contracting the band matrix
            # off the 5-D view of `exp` with dot_general (measured 8.17 vs
            # 5.40 ms/track dsd100 scan64) — the fix is the sublane-padded
            # 4-D expansion above, not reassociation.
            d2wm = band_decode_wmajor(z, k2c)
            d1 = freq_decode_wmajor(d2wm, k1c, cfg.conv1_freq_stride, cfg.feat_size)
        elif cfg.decoder_impl == "band_einsum":
            d2 = tied_conv_transpose_band(z, k2c)
            d1 = tied_conv_transpose_regular(
                d2, k1c, s1, (cfg.time_context, cfg.feat_size)
            )
        elif cfg.decoder_impl in ("conv", "conv_transpose"):
            decode = (
                tied_conv_transpose_regular
                if cfg.decoder_impl == "conv"
                else tied_conv_transpose
            )
            d2 = decode(z, k2c, (1, 1), (cfg.time_context, cfg.enc_freq))
            d1 = decode(d2, k1c, s1, (cfg.time_context, cfg.feat_size))
        elif cfg.decoder_impl == "bandconv":
            raise ValueError(
                'decoder_impl="bandconv" requires expand_order="wmajor"'
            )
        else:
            raise ValueError(
                f"unknown decoder_impl {cfg.decoder_impl!r}; have "
                "band | bandconv | band_pallas | band_einsum | fused | conv "
                "| conv_transpose"
            )
        return self._finish(d1, B, S, C, cfg)

    def _finish(self, d1: jnp.ndarray, B: int, S: int, C: int, cfg) -> jnp.ndarray:
        # (B*S, T, F, C) → collapse channels → (B, S, T, F); leading-dim
        # reshape only — no materialized transpose
        out_bias = self.param("out_bias", nn.initializers.zeros, (S,))
        # the output rides in mask_dtype (bf16 halves every downstream
        # layout pass + the Wiener kernel's y reads; f32 = exact parity)
        md = jnp.dtype(cfg.mask_dtype)
        if cfg.decoder_reduce == "all":
            # stereo-native joint model: keep per-channel source estimates
            # (B, S, T, F, C) — trailing channel broadcasts through the
            # Wiener mask exactly like the mono layouts
            y = d1.reshape(B, S, cfg.time_context, cfg.feat_size, C)
            return nn.relu(y.astype(md) + out_bias.astype(md)[:, None, None, None])
        if cfg.decoder_reduce == "first":
            d = d1[..., 0]
        elif cfg.decoder_reduce == "sum":
            d = d1.sum(axis=-1)
        else:
            raise ValueError(f"unknown decoder_reduce {cfg.decoder_reduce!r}")
        y = d.reshape(B, S, cfg.time_context, cfg.feat_size)

        return nn.relu(y.astype(md) + out_bias.astype(md)[:, None, None])

    def separate(
        self, x: jnp.ndarray, mix: jnp.ndarray, p: float = 1.0, eps: float = 1e-8
    ) -> jnp.ndarray:
        """Masked mixture estimates (B, T, F, S): forward + Wiener filter.

        `x` is the (scaled) network input; `mix` the mixture spectrogram the
        mask is applied to (magnitude during training, complex at
        separation — reference keeps mixture phase).
        """
        return wiener_filter(self(x), mix, p=p, eps=eps)
