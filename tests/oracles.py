"""Numpy oracles: independent reimplementation of the reference DSP math.

These deliberately mirror the reference's `transform.py` [U] loop-based
formulation (SURVEY.md §4 "Unit: DSP parity") — per-frame Python loops,
scipy-free numpy FFTs — so the jitted JAX implementations are tested
against a structurally different program computing the same function.
"""

from __future__ import annotations

import numpy as np


def sinebell_np(length: int) -> np.ndarray:
    return np.sin(np.pi * np.arange(length) / float(length))


def stft_np(data: np.ndarray, window: np.ndarray, hop: int, nfft: int) -> np.ndarray:
    """Loop-based STFT with the reference's padding conventions."""
    w = len(window)
    length = len(data)
    n_frames = int(np.ceil(length / float(hop))) + 2
    total = (n_frames - 1) * hop + w
    padded = np.concatenate(
        [np.zeros(w // 2), np.asarray(data, np.float64), np.zeros(total - w // 2 - length)]
    )
    out = np.zeros((n_frames, nfft // 2 + 1), dtype=np.complex128)
    for n in range(n_frames):
        frame = window * padded[n * hop : n * hop + w]
        out[n] = np.fft.rfft(frame, nfft)
    return out


def istft_np(
    spec: np.ndarray,
    window: np.ndarray,
    hop: int,
    length: int,
    analysis_window: np.ndarray | None = None,
    nfft: int | None = None,
) -> np.ndarray:
    """Loop-based iSTFT with window-power-normalized overlap-add."""
    if analysis_window is None:
        analysis_window = window
    w = len(window)
    if nfft is None:
        nfft = 2 * (spec.shape[-1] - 1)
    n_frames = spec.shape[0]
    total = (n_frames - 1) * hop + w
    norm = np.zeros(total)
    data = np.zeros(total)
    for n in range(n_frames):
        frame = np.fft.irfft(spec[n], nfft)[:w]
        sl = slice(n * hop, n * hop + w)
        norm[sl] += window * analysis_window
        data[sl] += window * frame
    norm[norm == 0.0] = 1.0
    data = data / norm
    return data[w // 2 : w // 2 + length]


def overlap_add_np(frames: np.ndarray, hop: int) -> np.ndarray:
    n_frames, w = frames.shape
    out = np.zeros((n_frames - 1) * hop + w, dtype=frames.dtype)
    for n in range(n_frames):
        out[n * hop : n * hop + w] += frames[n]
    return out


def wiener_np(y: np.ndarray, mix: np.ndarray, p: float = 1.0, eps: float = 1e-8) -> np.ndarray:
    """Generalized Wiener estimates: ``mix * y_i^p / (sum_j y_j^p + eps)``.

    y: (..., S) nonneg source magnitudes; mix broadcast against y[..., i].
    """
    yp = np.power(np.maximum(y, 0.0), p)
    denom = yp.sum(axis=-1, keepdims=True) + eps
    return (yp / denom) * mix[..., None]
