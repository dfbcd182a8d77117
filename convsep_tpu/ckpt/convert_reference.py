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
    """Order of arrays in the reference pickle."""

    conv_bias_separate: bool = True  # BiasLayer right after each conv
    merge_bias: bool = True  # final BiasLayer over concatenated sources


def load_reference_pickle(path: str) -> list[np.ndarray]:
    """Load a reference checkpoint (py2 pickles → latin1)."""
    with open(path, "rb") as f:
        try:
            values = pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            values = pickle.load(f, encoding="latin1")
    if not isinstance(values, (list, tuple)):
        raise ValueError(f"expected a list of arrays in {path}, got {type(values)}")
    return [np.asarray(v) for v in values]


def _nchw_to_nhwc_perm(cfg: ConvSepConfig) -> np.ndarray:
    """perm[j] = i : our flat NHWC index j ↔ Lasagne flat NCHW index i
    over the encoder output (T', F', N2)/(N2, T', F')."""
    Tp, Fp, C = cfg.enc_time, cfg.enc_freq, cfg.conv2_filters
    i = np.arange(C * Tp * Fp).reshape(C, Tp, Fp)  # NCHW flat ids
    return i.transpose(1, 2, 0).reshape(-1)  # in NHWC order


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

    w1 = _check(next(it), (cfg.conv1_filters, cfg.channels_in, 1, cfg.conv1_freq), "conv1.W")
    b1 = _check(next(it), (cfg.conv1_filters,), "conv1.b")
    w2 = _check(
        next(it), (cfg.conv2_filters, cfg.conv1_filters, cfg.conv2_time_eff, 1), "conv2.W"
    )
    b2 = _check(next(it), (cfg.conv2_filters,), "conv2.b")
    perm = _nchw_to_nhwc_perm(cfg)
    fc_w = _check(next(it), (cfg.enc_flat, cfg.bottleneck), "fc.W")[perm, :]
    fc_b = _check(next(it), (cfg.bottleneck,), "fc.b")
    exp_ws, exp_bs = [], []
    for s in range(S):
        ew = _check(next(it), (cfg.bottleneck, cfg.enc_flat), f"expand{s}.W")[:, perm]
        eb = _check(next(it), (cfg.enc_flat,), f"expand{s}.b")[perm]
        exp_ws.append(ew)
        exp_bs.append(eb)
    if layout.merge_bias:
        out_bias = _check(next(it), (S,), "merge.b")
    else:
        out_bias = np.zeros((S,), np.float32)

    def conv_kernel(w):  # OIHW true-conv → HWIO cross-correlation
        return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 1, 0))

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

    def conv_kernel(k):  # HWIO → OIHW with spatial flip
        return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1)[:, :, ::-1, ::-1])

    out = [
        conv_kernel(p["conv1_kernel"]),
        np.asarray(p["conv1_bias"]),
        conv_kernel(p["conv2_kernel"]),
        np.asarray(p["conv2_bias"]),
        np.asarray(p["fc"]["kernel"])[inv, :],
        np.asarray(p["fc"]["bias"]),
    ]
    S = cfg.num_sources
    ew = np.asarray(p["fc_expand"]["kernel"]).reshape(cfg.bottleneck, S, cfg.enc_flat)
    eb = np.asarray(p["fc_expand"]["bias"]).reshape(S, cfg.enc_flat)
    for s in range(S):
        out.append(np.ascontiguousarray(ew[:, s, inv]))
        out.append(np.ascontiguousarray(eb[s, inv]))
    if layout.merge_bias:
        out.append(np.asarray(p["out_bias"]))
    return out


def convert_reference_checkpoint(
    pickle_path: str, cfg: ConvSepConfig, layout: Layout = Layout()
) -> dict:
    """Load + convert a reference checkpoint file."""
    return convert_reference_params(load_reference_pickle(pickle_path), cfg, layout)
