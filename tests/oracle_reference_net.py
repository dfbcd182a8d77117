"""Numpy oracle of the reference network's *Theano semantics*.

Independent loop-based reimplementation of `build_ca`'s forward pass as
Lasagne/Theano executed it (SURVEY.md §2.1 #5): NCHW layout, TRUE
convolutions (kernel flipped), NCHW flattening into the dense layers,
InverseLayer == gradient-of-conv with the tied kernel. Used to prove
that convert_reference_params(reference_values) + ConvSep.apply computes
the same function.
"""

from __future__ import annotations

import numpy as np


def conv2d_theano_valid(x, w, stride=(1, 1)):
    """x (B,C,H,W), w (O,C,kh,kw) → true convolution, VALID, strided."""
    flipped = w[:, :, ::-1, ::-1]
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    sh, sw = stride
    oh, ow = (H - kh) // sh + 1, (W - kw) // sw + 1
    out = np.zeros((B, O, oh, ow), dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, :, i * sh : i * sh + kh, j * sw : j * sw + kw]
            out[:, :, i, j] = np.einsum("bchw,ochw->bo", patch, flipped)
    return out


def conv2d_theano_grad_input(y, w, in_shape, stride=(1, 1)):
    """Gradient of conv2d_theano_valid w.r.t. its input (InverseLayer)."""
    B, O, oh, ow = y.shape
    flipped = w[:, :, ::-1, ::-1]
    kh, kw = w.shape[2:]
    sh, sw = stride
    out = np.zeros(in_shape, dtype=np.float64)
    for i in range(oh):
        for j in range(ow):
            out[:, :, i * sh : i * sh + kh, j * sw : j * sw + kw] += np.einsum(
                "bo,ochw->bchw", y[:, :, i, j], flipped
            )
    return out


def relu(x):
    return np.maximum(x, 0.0)


def reference_forward_np(values, x, conv1_stride=1):
    """Reference-net forward: `values` = ordered Lasagne param list
    (conv1.W, conv1.b, conv2.W, conv2.b, fc.W, fc.b, [expand_s.W,
    expand_s.b]*S, merge.b); x (B, 1|C, T, F) NCHW. Returns (B, S, T, F)."""
    w1, b1, w2, b2, fc_w, fc_b = values[:6]
    merge_b = values[-1]
    branches = values[6:-1]
    S = len(branches) // 2
    B = x.shape[0]

    h1 = conv2d_theano_valid(x, w1, (1, conv1_stride)) + b1[None, :, None, None]
    h2 = conv2d_theano_valid(h1, w2, (1, 1)) + b2[None, :, None, None]
    enc_shape = h2.shape  # (B, N2, T', F')
    flat = h2.reshape(B, -1)  # NCHW flatten
    fc = relu(flat @ fc_w + fc_b)

    outs = []
    for s in range(S):
        ew, eb = branches[2 * s], branches[2 * s + 1]
        z = relu(fc @ ew + eb).reshape(enc_shape)
        d2 = conv2d_theano_grad_input(z, w2, (B, w2.shape[1], *_conv_in_hw(enc_shape, w2, (1, 1))), (1, 1))
        d1 = conv2d_theano_grad_input(
            d2, w1, (B, w1.shape[1], d2.shape[2], _invert_width(d2.shape[3], w1.shape[3], conv1_stride, x.shape[3])), (1, conv1_stride)
        )
        outs.append(d1[:, 0])  # single input channel per branch
    y = np.stack(outs, axis=1)  # (B, S, T, F)
    return relu(y + merge_b[None, :, None, None])


def _conv_in_hw(out_shape, w, stride):
    """Input spatial dims for a VALID conv with output `out_shape`."""
    _, _, oh, ow = out_shape
    kh, kw = w.shape[2:]
    return ((oh - 1) * stride[0] + kh, (ow - 1) * stride[1] + kw)


def _invert_width(ow, kw, sw, true_w):
    """True (possibly larger) input width when stride didn't tile evenly."""
    minimal = (ow - 1) * sw + kw
    assert true_w >= minimal
    return true_w
