"""Reference checkpoint converter: Theano/Lasagne pickles → flax params.

The reference checkpoints (save_model in trainCNN.py [U], SURVEY.md §5.4)
are pickles of ``lasagne.layers.get_all_param_values(network)`` — an
ordered list of numpy arrays. Conversion rules (SURVEY.md §5.4):

1. **Conv kernels**: Theano's conv2d is a TRUE convolution (kernel
   flipped); JAX convs are cross-correlations → flip both spatial axes.
   Layout: Lasagne OIHW (out, in, kh, kw) → HWIO.
2. **Dense layers**: Lasagne stores (in, out) like flax — but the
   *flatten order* feeding/leaving them differs: Lasagne flattens
   (channels, time, freq) row-major (NCHW), this model flattens
   (time, freq, channels) (NHWC). Row/column permutations fix it.
3. **Per-source expansion denses** are concatenated along the output axis
   into this model's single fused `fc_expand` (mathematically identical —
   see models/convsep.py).
4. **InverseLayer decoders are weight-tied** — they contribute no params.

The default `Layout` below encodes the reconstructed reference param order:
conv1.W, conv1.b, conv2.W, conv2.b, fc.W, fc.b, then per source
(expand.W, expand.b), then the final merge bias. Because the reference
mount was empty (SURVEY.md §0.1) the true order may differ; `Layout` is
declarative so a mismatch is a one-line fix, and every array is
shape-checked with a precise error message.

`export_reference_params` is the exact inverse — used to round-trip-test
the converter and to hand checkpoints back to the reference pipeline.
"""

from __future__ import annotations

import dataclasses
import pickle

import numpy as np

from convsep_tpu.models.convsep import ConvSepConfig


@dataclasses.dataclass(frozen=True)
class Layout:
    """Order/shape conventions of the arrays in the reference pickle.

    Because the mount was empty (SURVEY.md §0.1) the true conventions are
    [M]-confidence; `detect_layout` enumerates the plausible variants below
    and picks the one whose shapes fit the pickle.
    """

    conv_bias_separate: bool = True  # BiasLayer right after each conv
    merge_bias: bool = True  # final BiasLayer over concatenated sources
    # True: per-source (expand.W, expand.b) pairs interleaved;
    # False: all expand.W arrays first, then all expand.b arrays
    expand_interleaved: bool = True
    # conv bias stored flat (filters,) [Lasagne Conv2DLayer b] or
    # broadcastable (filters, 1, 1) [explicit BiasLayer]
    conv_bias_chw: bool = False
    # Theano conv2d is a flipped true convolution → flip kernels for JAX
    # cross-correlation. Only set False if a golden forward pass against a
    # real reference output proves the checkpoint was trained with
    # flip_filters=False (detect_layout cannot see this from shapes).
    flip_kernels: bool = True


# TRUST BOUNDARY: checkpoint pickles are externally supplied files, and
# pickle.load executes arbitrary code embedded in a malicious pickle. The
# default loader below therefore only permits numpy array reconstruction;
# anything else raises. `allow_unsafe=True` restores full pickle semantics
# for callers who trust the file's origin.
_SAFE_GLOBALS = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "scalar"),
    # protocol-2 (py2-era) pickles encode array bytes via _codecs.encode
    ("_codecs", "encode"),
}


class _NumpyOnlyUnpickler(pickle.Unpickler):
    """Unpickler restricted to numpy-array reconstruction (no code exec)."""

    def find_class(self, module, name):
        if (module, name) in _SAFE_GLOBALS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"reference checkpoint pickle requests {module}.{name}; only plain "
            f"numpy arrays are allowed. If you trust this file, re-run with "
            f"allow_unsafe=True (CLI: --unsafe-pickle)."
        )


def load_reference_pickle(path: str, allow_unsafe: bool = False) -> list[np.ndarray]:
    """Load a reference checkpoint (py2 pickles → latin1).

    Safe by default: only numpy arrays may be reconstructed (see the trust
    boundary note above)."""

    def _load(f, **kw):
        if allow_unsafe:
            return pickle.load(f, **kw)
        return _NumpyOnlyUnpickler(f, **kw).load()

    with open(path, "rb") as f:
        try:
            values = _load(f)
        except UnicodeDecodeError:
            f.seek(0)
            values = _load(f, encoding="latin1")
    if not isinstance(values, (list, tuple)):
        raise ValueError(f"expected a list of arrays in {path}, got {type(values)}")
    return [np.asarray(v) for v in values]


def _nchw_to_nhwc_perm(cfg: ConvSepConfig) -> np.ndarray:
    """perm[j] = i : our flat NHWC index j ↔ Lasagne flat NCHW index i
    over the encoder output (T', F', N2)/(N2, T', F')."""
    Tp, Fp, C = cfg.enc_time, cfg.enc_freq, cfg.conv2_filters
    i = np.arange(C * Tp * Fp).reshape(C, Tp, Fp)  # NCHW flat ids
    return i.transpose(1, 2, 0).reshape(-1)  # in NHWC order


def _nchw_to_fold_perm(cfg: ConvSepConfig) -> np.ndarray:
    """Like `_nchw_to_nhwc_perm` but for the DECODE-side fold, whose order
    is governed by cfg.expand_order: "wmajor" → (F', T', N2) (the zero-
    transpose band-GEMM layout), "tmajor" → (T', F', N2) (r1 layout)."""
    Tp, Fp, C = cfg.enc_time, cfg.enc_freq, cfg.conv2_filters
    i = np.arange(C * Tp * Fp).reshape(C, Tp, Fp)  # NCHW flat ids
    if cfg.expand_order == "wmajor":
        return i.transpose(2, 1, 0).reshape(-1)  # (F', T', C) order
    return i.transpose(1, 2, 0).reshape(-1)


def _check(arr: np.ndarray, shape: tuple[int, ...], what: str) -> np.ndarray:
    if tuple(arr.shape) != shape:
        raise ValueError(
            f"reference param {what!r} has shape {tuple(arr.shape)}, expected {shape} "
            f"— architecture hyperparameters in ConvSepConfig likely need adjusting"
        )
    return arr


def convert_reference_params(
    values: list[np.ndarray], cfg: ConvSepConfig, layout: Layout = Layout()
) -> dict:
    """Ordered reference arrays → flax params dict for ConvSep(cfg)."""
    S = cfg.num_sources
    expected = 6 + 2 * S + (1 if layout.merge_bias else 0)
    if len(values) != expected:
        raise ValueError(
            f"reference pickle has {len(values)} arrays, expected {expected} for "
            f"{S} sources (layout {layout})"
        )
    it = iter(values)

    def conv_bias(arr, n, what):
        if layout.conv_bias_chw:
            return _check(arr, (n, 1, 1), what).reshape(n)
        return _check(arr, (n,), what)

    w1 = _check(next(it), (cfg.conv1_filters, cfg.channels_in, 1, cfg.conv1_freq), "conv1.W")
    b1 = conv_bias(next(it), cfg.conv1_filters, "conv1.b")
    w2 = _check(
        next(it), (cfg.conv2_filters, cfg.conv1_filters, cfg.conv2_time_eff, 1), "conv2.W"
    )
    b2 = conv_bias(next(it), cfg.conv2_filters, "conv2.b")
    perm = _nchw_to_nhwc_perm(cfg)
    fc_w = _check(next(it), (cfg.enc_flat, cfg.bottleneck), "fc.W")[perm, :]
    fc_b = _check(next(it), (cfg.bottleneck,), "fc.b")
    exp_ws, exp_bs = [], []
    if layout.expand_interleaved:
        for s in range(S):
            exp_ws.append(_check(next(it), (cfg.bottleneck, cfg.enc_flat), f"expand{s}.W"))
            exp_bs.append(_check(next(it), (cfg.enc_flat,), f"expand{s}.b"))
    else:  # all weights, then all biases
        for s in range(S):
            exp_ws.append(_check(next(it), (cfg.bottleneck, cfg.enc_flat), f"expand{s}.W"))
        for s in range(S):
            exp_bs.append(_check(next(it), (cfg.enc_flat,), f"expand{s}.b"))
    fold_perm = _nchw_to_fold_perm(cfg)
    exp_ws = [w[:, fold_perm] for w in exp_ws]
    exp_bs = [b[fold_perm] for b in exp_bs]
    if layout.merge_bias:
        out_bias = _check(next(it), (S,), "merge.b")
    else:
        out_bias = np.zeros((S,), np.float32)

    def conv_kernel(w):  # OIHW true-conv → HWIO cross-correlation
        if layout.flip_kernels:
            w = w[:, :, ::-1, ::-1]
        return np.ascontiguousarray(w.transpose(2, 3, 1, 0))

    return {
        "params": {
            "conv1_kernel": conv_kernel(w1).astype(np.float32),
            "conv1_bias": b1.astype(np.float32),
            "conv2_kernel": conv_kernel(w2).astype(np.float32),
            "conv2_bias": b2.astype(np.float32),
            "fc": {"kernel": fc_w.astype(np.float32), "bias": fc_b.astype(np.float32)},
            "fc_expand": {
                "kernel": np.concatenate(exp_ws, axis=1).astype(np.float32),
                "bias": np.concatenate(exp_bs).astype(np.float32),
            },
            "out_bias": out_bias.astype(np.float32),
        }
    }


def export_reference_params(
    params: dict, cfg: ConvSepConfig, layout: Layout = Layout()
) -> list[np.ndarray]:
    """Inverse of `convert_reference_params` (flax → reference list)."""
    p = params["params"]
    perm = _nchw_to_nhwc_perm(cfg)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    fold_perm = _nchw_to_fold_perm(cfg)
    fold_inv = np.empty_like(fold_perm)
    fold_inv[fold_perm] = np.arange(fold_perm.size)

    def conv_kernel(k):  # HWIO → OIHW (+ spatial flip per layout)
        k = np.asarray(k).transpose(3, 2, 0, 1)
        if layout.flip_kernels:
            k = k[:, :, ::-1, ::-1]
        return np.ascontiguousarray(k)

    def conv_bias(b):
        b = np.asarray(b)
        return b.reshape(-1, 1, 1) if layout.conv_bias_chw else b

    out = [
        conv_kernel(p["conv1_kernel"]),
        conv_bias(p["conv1_bias"]),
        conv_kernel(p["conv2_kernel"]),
        conv_bias(p["conv2_bias"]),
        np.asarray(p["fc"]["kernel"])[inv, :],
        np.asarray(p["fc"]["bias"]),
    ]
    S = cfg.num_sources
    ew = np.asarray(p["fc_expand"]["kernel"]).reshape(cfg.bottleneck, S, cfg.enc_flat)
    eb = np.asarray(p["fc_expand"]["bias"]).reshape(S, cfg.enc_flat)
    ws = [np.ascontiguousarray(ew[:, s, fold_inv]) for s in range(S)]
    bs = [np.ascontiguousarray(eb[s, fold_inv]) for s in range(S)]
    if layout.expand_interleaved:
        for w, b in zip(ws, bs):
            out.extend([w, b])
    else:
        out.extend(ws)
        out.extend(bs)
    if layout.merge_bias:
        out.append(np.asarray(p["out_bias"]))
    return out


def detect_layout(values: list[np.ndarray], cfg: ConvSepConfig) -> Layout:
    """Pick the Layout variant whose shapes fit the pickle.

    Enumerates merge-bias presence × expand ordering × conv-bias shape and
    returns the (unique) variant under which every array shape-checks.
    `flip_kernels` is not shape-observable and stays at the Theano default
    (True); verify it with a golden forward pass on a real checkpoint.
    """
    fits, errors = [], []
    for merge in (True, False):
        for interleaved in (True, False):
            for chw in (False, True):
                layout = Layout(
                    merge_bias=merge, expand_interleaved=interleaved, conv_bias_chw=chw
                )
                try:
                    convert_reference_params(values, cfg, layout)
                except ValueError as e:
                    errors.append(f"{layout}: {e}")
                    continue
                fits.append(layout)
    if not fits:
        details = "\n  ".join(errors[:4])
        raise ValueError(
            f"no known reference layout fits this pickle "
            f"({len(values)} arrays, shapes {[tuple(v.shape) for v in values[:8]]}...).\n"
            f"First failures:\n  {details}"
        )
    # expand ordering is unobservable when S == 1 or all candidates collapse
    # to identical conversions; prefer the default (interleaved, flat bias)
    for preferred in (Layout(), *fits):
        if preferred in fits:
            return preferred
    return fits[0]


def convert_reference_checkpoint(
    pickle_path: str,
    cfg: ConvSepConfig,
    layout: Layout | None = None,
    allow_unsafe: bool = False,
) -> dict:
    """Load + convert a reference checkpoint file.

    With ``layout=None`` the pickle's layout is auto-detected from its
    array count/shapes (see `detect_layout`)."""
    values = load_reference_pickle(pickle_path, allow_unsafe=allow_unsafe)
    if layout is None:
        layout = detect_layout(values, cfg)
    return convert_reference_params(values, cfg, layout)
