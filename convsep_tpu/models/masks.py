"""Generalized Wiener time-frequency soft masks.

Reference parity: the mask construction in the reference's training graph
and `separate_dsd.py` [U] (SURVEY.md §2.1 #6/#8) —
``mask_i = y_i^p / (sum_j y_j^p + eps)`` applied to the mixture
spectrogram, with mixture phase reused at resynthesis. With ``p=1`` this is
the soft mask used in the training loss; ``p=2`` is the classic Wiener
filter.

TPU-native: pure elementwise math over a trailing sources axis — XLA fuses
it into the surrounding CNN-output / iSTFT programs (SURVEY.md §2.2 #3), so
no materialization of per-source masks in HBM is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def wiener_mask(
    y: jnp.ndarray,
    p: float = 1.0,
    eps: float = 1e-8,
    axis: int = -1,
    conserve_last: bool = False,
) -> jnp.ndarray:
    """Per-source soft mask from nonnegative source estimates.

    y: nonnegative magnitudes (model outputs) with the sources axis at
    `axis` (trailing by default; the fused separation pipeline uses the
    model's native source-major layout with ``axis=0`` so no transpose is
    ever materialized). Returns masks of the same shape; along the sources
    axis the masks sum to ``sum_j y_j^p / (sum_j y_j^p + eps) <= 1``.

    ``conserve_last=True`` assigns the eps shortfall (time-frequency energy
    no source claimed, e.g. ReLU-dead bins) to the LAST source, so the
    masks sum to EXACTLY 1 and the stems sum back to the (iSTFT∘STFT)
    mixture — the classic "accompaniment = mixture − vocals" conservation,
    in closed form: ``mask_last = (y_last^p + eps) / (Σ_j y_j^p + eps)``.
    This is what makes host-side complement-fetch (ChunkedSeparator's
    ``complement_last``) exact rather than approximate.

    The RATIO always computes in float32 regardless of y's storage dtype
    — the bf16 mask tail (ConvSepConfig.mask_dtype) narrows the tensors
    between decoder and mask, and every mask consumer (this XLA chain,
    the Wiener mega-kernel, the chunk programs) must divide in f32 so
    the paths stay equal to each other (the chunked≡whole-track ≤1e-5
    contract broke when only some paths upcast, 2026-08-20).
    """
    y = y.astype(jnp.float32)
    yp = jnp.where(y > 0, y, 0.0)
    if p != 1.0:
        yp = jnp.power(yp, p)
    denom = jnp.sum(yp, axis=axis, keepdims=True) + eps
    if conserve_last:
        ix = tuple(
            -1 if i == axis % yp.ndim else slice(None) for i in range(yp.ndim)
        )
        yp = yp.at[ix].add(eps)
    return yp / denom


def wiener_filter(
    y: jnp.ndarray, mix: jnp.ndarray, p: float = 1.0, eps: float = 1e-8, axis: int = -1
) -> jnp.ndarray:
    """Masked mixture estimates: ``mask_i * mix``.

    y: nonneg estimates with sources on `axis`; mix: y's shape without the
    sources axis (real magnitude or complex spectrogram — a real mask times
    the complex mixture is exactly the reference's "masked magnitude +
    mixture phase" resynthesis). Returns y's shape with mix broadcast over
    the sources axis.
    """
    return wiener_mask(y, p=p, eps=eps, axis=axis) * jnp.expand_dims(mix, axis)
