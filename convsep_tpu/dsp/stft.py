"""STFT analysis with reference-parity framing conventions, jit-friendly.

Reference parity (transform.py [U], SURVEY.md §2.1 #1/#2, reconstructed):

* the signal is front-padded with ``W//2`` zeros and back-padded so that
  ``num_frames = ceil(L / hop) + 2`` frames of length ``W`` at stride
  ``hop`` exactly tile the padded signal;
* each frame is multiplied by the analysis window and rFFT'd to
  ``nfft//2 + 1`` complex bins;
* magnitudes may be scaled linearly (``iscale='lin'``) or logarithmically.

TPU-native design: all shapes are static functions of the (static) signal
length, so the whole analysis chain traces into one XLA program. Framing
avoids gathers when ``W % hop == 0`` by expressing frames as ``k = W//hop``
shifted static slices of the hop-blocked signal — XLA fuses the window
multiply into the same loop and feeds the rFFT directly.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def num_frames(length: int, hop: int) -> int:
    """Number of STFT frames for a signal of `length` samples.

    Reference convention (transform.py:stft_norm [U]):
    ``ceil(length / hop) + 2`` — the +2 covers the W//2 front padding and
    the tail.
    """
    return int(math.ceil(length / float(hop))) + 2


def padded_length(length: int, win_length: int, hop: int) -> int:
    """Total padded signal length: ``(num_frames - 1) * hop + win_length``."""
    return (num_frames(length, hop) - 1) * hop + win_length


def _pad_signal(signal: jnp.ndarray, win_length: int, hop: int) -> jnp.ndarray:
    """Front-pad W//2 zeros, back-pad to `padded_length`. Static shapes."""
    length = signal.shape[-1]
    total = padded_length(length, win_length, hop)
    front = win_length // 2
    back = total - front - length
    if back < 0:
        raise ValueError(
            f"inconsistent padding: length={length} win={win_length} hop={hop}"
        )
    pad = [(0, 0)] * (signal.ndim - 1) + [(front, back)]
    return jnp.pad(signal, pad)


def frame_signal(padded: jnp.ndarray, win_length: int, hop: int, n_frames: int) -> jnp.ndarray:
    """Slice a padded signal (..., total) into (..., n_frames, win_length).

    When ``win_length % hop == 0`` this is ``k`` static slices of the
    hop-blocked signal concatenated along a new axis — no gather, fully
    fusible on TPU. Otherwise falls back to a take-based gather.
    """
    total = padded.shape[-1]
    need = (n_frames - 1) * hop + win_length
    if total < need:
        raise ValueError(f"padded length {total} < required {need}")
    if win_length % hop == 0:
        k = win_length // hop
        n_blocks = total // hop
        blocks = padded[..., : n_blocks * hop].reshape(*padded.shape[:-1], n_blocks, hop)
        # frame n = concat(blocks[n], blocks[n+1], ..., blocks[n+k-1])
        parts = [blocks[..., i : i + n_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win_length)[None, :]
    return jnp.take(padded, jnp.asarray(idx), axis=-1)


@partial(jax.jit, static_argnames=("hop", "nfft"))
def _stft_impl(signal, window, hop, nfft):
    win_length = window.shape[-1]
    nf = num_frames(signal.shape[-1], hop)
    padded = _pad_signal(signal, win_length, hop)
    frames = frame_signal(padded, win_length, hop, nf) * window
    return jnp.fft.rfft(frames, n=nfft, axis=-1)


def stft(
    signal: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    nfft: int | None = None,
) -> jnp.ndarray:
    """STFT of a (..., length) signal → (..., num_frames, nfft//2+1) complex.

    `window` is a trace-time constant (numpy, from :mod:`windows`). `hop`
    and `nfft` are static. Matches the reference framing (front pad W//2,
    ``ceil(L/hop)+2`` frames).
    """
    window = jnp.asarray(window, dtype=jnp.float32)
    if nfft is None:
        nfft = int(window.shape[-1])
    return _stft_impl(jnp.asarray(signal, jnp.float32), window, int(hop), int(nfft))


def magphase(spec: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split a complex spectrogram into float32 magnitude and phase.

    Reference parity: transformFFT.compute_file(audio, phase=True) [U]
    returns (|X|, angle(X)).
    """
    return jnp.abs(spec).astype(jnp.float32), jnp.angle(spec).astype(jnp.float32)


def scale_magnitude(mag: jnp.ndarray, iscale: str = "lin", kappa: float = 1e4) -> jnp.ndarray:
    """Optional magnitude compression (reference `iscale` knob [M]).

    'lin' is identity; 'log' is ``log10(1 + kappa * mag)``.
    """
    if iscale == "lin":
        return mag
    if iscale == "log":
        return jnp.log1p(kappa * mag) / np.log(10.0)
    raise ValueError(f"unknown iscale {iscale!r}")


def unscale_magnitude(mag: jnp.ndarray, iscale: str = "lin", kappa: float = 1e4) -> jnp.ndarray:
    """Inverse of :func:`scale_magnitude`."""
    if iscale == "lin":
        return mag
    if iscale == "log":
        return jnp.expm1(mag * np.log(10.0)) / kappa
    raise ValueError(f"unknown iscale {iscale!r}")
