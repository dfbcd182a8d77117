"""Separation training losses.

Reference parity: `train_auto` in examples/*/trainCNN.py [U] (SURVEY.md
§2.1 #6) — squared error of each masked estimate against its target, MINUS
weighted squared errors of each estimate against the *other* sources'
targets (cross-source dissimilarity / interference penalties, weights
alpha ≈ 0.001, beta ≈ 0.01, beta_voc ≈ 0.03 from the LVA/ICA 2017
formulation [M]).

Generalized here to an (S, S) interference-weight matrix W (zero diagonal):

    L = mean_i ||est_i - t_i||^2  -  mean_{i != j} W[i, j] ||est_i - t_j||^2

which XLA evaluates as two fused elementwise passes regardless of S.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interference_matrix(
    num_sources: int,
    alpha: float = 0.001,
    beta: float | None = None,
    beta_voc: float | None = None,
    vocals_idx: int = 0,
    other_idx: int | None = None,
) -> np.ndarray:
    """Interference-weight matrix replicating the reference's constants.

    All off-diagonal entries start at `alpha`; cross-terms whose *target* is
    the 'other' source get `beta`; cross-terms whose target is the vocals
    get `beta_voc` (DSD100 weighting, reconstructed [M] — the exact
    pairing in the reference scripts is config, not architecture).
    """
    w = np.full((num_sources, num_sources), alpha, dtype=np.float32)
    if beta is not None and other_idx is not None:
        w[:, other_idx] = beta
    if beta_voc is not None:
        w[:, vocals_idx] = beta_voc
    np.fill_diagonal(w, 0.0)
    return w


def separation_loss(
    est: jnp.ndarray,
    targets: jnp.ndarray,
    interference: np.ndarray | jnp.ndarray | None = None,
    source_axis: int = -1,
) -> jnp.ndarray:
    """Mean squared reconstruction minus weighted interference dissimilarity.

    est, targets: same shape, sources on `source_axis` (the training engine
    uses the model's native source-major (B, S, T, F) layout with
    ``source_axis=1`` — no transposes in the step). `interference`: (S, S)
    weights, zero diagonal (None → plain MSE summed over sources).
    """
    if est.shape != targets.shape:
        raise ValueError(f"est {est.shape} != targets {targets.shape}")
    ax = source_axis % est.ndim
    recon = jnp.mean(jnp.sum((est - targets) ** 2, axis=ax))
    if interference is None:
        return recon
    w = jnp.asarray(interference, dtype=est.dtype)
    # diff[..., i, j, ...] = est_i - t_j ; weighted mean over elements like recon
    diff = jnp.expand_dims(est, ax + 1) - jnp.expand_dims(targets, ax)
    w = w.reshape(w.shape + (1,) * (est.ndim - 1 - ax))
    penalty = jnp.mean(jnp.sum(w * diff**2, axis=(ax, ax + 1)))
    return recon - penalty
