"""Spectrogram segmentation: tracks ↔ fixed-size time-context windows.

Reference parity: `LargeDataset`'s track slicing (dataset.py [U], SURVEY.md
§2.1 #4): each track's (frames, bins) spectrogram is cut into
`time_context`-frame segments at step ``time_context - overlap``; the tail
is zero-padded into a final segment. Separation (separate_dsd.py [U]) uses
the non-overlapping case (step = time_context).

TPU-native: `segment_frames` also has a jnp path used *inside* jitted
separation programs — with step == time_context it is a pure reshape
(zero-cost on device); otherwise the same k-slice trick as dsp framing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def segment_count(n_frames: int, time_context: int, step: int | None = None) -> int:
    """Number of segments covering `n_frames` (tail zero-padded)."""
    if step is None:
        step = time_context
    if step <= 0 or time_context <= 0:
        raise ValueError(f"bad segmenting: T={time_context} step={step}")
    if n_frames <= time_context:
        return 1
    return int(np.ceil((n_frames - time_context) / step)) + 1


def pad_frames_to_segments(frames, time_context: int, step: int | None = None):
    """Zero-pad (..., n_frames, F) so segments tile it exactly."""
    if step is None:
        step = time_context
    n = frames.shape[-2]
    nseg = segment_count(n, time_context, step)
    total = (nseg - 1) * step + time_context
    xp = jnp if isinstance(frames, jnp.ndarray) else np
    pad = [(0, 0)] * (frames.ndim - 2) + [(0, total - n), (0, 0)]
    return xp.pad(frames, pad), nseg


def segment_frames(frames, time_context: int, step: int | None = None):
    """(..., n_frames, F) → (..., nseg, time_context, F).

    Works on numpy (host pipeline) and jnp (inside jit). Non-overlapping
    segmentation is a reshape; overlapped segmentation stacks
    ``k = ceil(T/step)`` shifted slices (no gather).
    """
    if step is None:
        step = time_context
    padded, nseg = pad_frames_to_segments(frames, time_context, step)
    lead = padded.shape[:-2]
    F = padded.shape[-1]
    xp = jnp if isinstance(padded, jnp.ndarray) else np
    if step == time_context:
        return padded.reshape(*lead, nseg, time_context, F)
    # general case: build from hop-blocks like dsp framing
    total = padded.shape[-2]
    if time_context % step == 0:
        k = time_context // step
        nb = total // step
        blocks = padded[..., : nb * step, :].reshape(*lead, nb, step, F)
        parts = [blocks[..., i : i + nseg, :, :] for i in range(k)]
        return xp.concatenate(parts, axis=-2)
    idx = np.arange(nseg)[:, None] * step + np.arange(time_context)[None, :]
    return xp.take(padded, idx.reshape(-1), axis=-2).reshape(*lead, nseg, time_context, F)


def unsegment_frames(segments, n_frames: int):
    """Inverse of non-overlapping segmentation:
    (..., nseg, T, F) → (..., n_frames, F) (truncating the zero tail)."""
    *lead, nseg, T, F = segments.shape
    flat = segments.reshape(*lead, nseg * T, F)
    return flat[..., :n_frames, :]
