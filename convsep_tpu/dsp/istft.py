"""iSTFT: windowed inverse frames + normalized overlap-add, jit-friendly.

Reference parity (transform.py:istft_norm [U], SURVEY.md §2.1 #1): each
frame is irFFT'd, truncated to the window length, multiplied by the
synthesis window, overlap-added at the hop; the result is divided by the
overlap-added product of synthesis and analysis windows (zeros → 1) and the
first W//2 samples (the analysis front padding) are dropped.

TPU-native design: overlap-add is NOT a scatter. With ``k = ceil(W/hop)``
sub-blocks per frame, output hop-block ``j`` is the sum of at most ``k``
frame sub-blocks — expressed here as ``k`` static pads + adds, which XLA
fuses into one pass with no dynamic-update-slice serialization. The
normalization sequence depends only on static shapes and is precomputed in
numpy at trace time. See dsp/pallas/istft_kernel.py for the Pallas variant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.dsp.stft import num_frames


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add (..., n_frames, win_length) → (..., (n_frames-1)*hop + W).

    Implemented as k = ceil(W/hop) shifted pad-and-adds over the
    hop-blocked output (no scatter; see module docstring).
    """
    *lead, n_frames, win_length = frames.shape
    k = _ceil_div(win_length, hop)
    pad_w = k * hop - win_length
    if pad_w:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad_w)])
    sub = frames.reshape(*lead, n_frames, k, hop)
    n_blocks = n_frames + k - 1
    out = jnp.zeros((*lead, n_blocks, hop), dtype=frames.dtype)
    for i in range(k):
        pad = [(0, 0)] * len(lead) + [(i, n_blocks - n_frames - i), (0, 0)]
        out = out + jnp.pad(sub[..., :, i, :], pad)
    out = out.reshape(*lead, n_blocks * hop)
    total = (n_frames - 1) * hop + win_length
    return out[..., :total]


def ola_norm(
    window: np.ndarray,
    analysis_window: np.ndarray,
    hop: int,
    n_frames: int,
) -> np.ndarray:
    """Overlap-added window-power normalization sequence (numpy, trace-time).

    Reference parity: istft_norm's `normalisationSeq` — OLA of
    ``window * analysis_window`` with zeros replaced by 1.
    """
    win_length = int(window.shape[-1])
    prod = np.asarray(window, np.float64) * np.asarray(analysis_window, np.float64)
    total = (n_frames - 1) * hop + win_length
    norm = np.zeros(total, dtype=np.float64)
    for n in range(n_frames):
        norm[n * hop : n * hop + win_length] += prod
    norm[norm == 0.0] = 1.0
    return norm.astype(np.float32)


@partial(jax.jit, static_argnames=("hop", "length", "nfft"))
def _istft_impl(spec, window, inv_norm, hop, length, nfft):
    win_length = window.shape[-1]
    frames = jnp.fft.irfft(spec, n=nfft, axis=-1)[..., :win_length]
    frames = frames * window
    data = overlap_add(frames, hop) * inv_norm
    front = win_length // 2
    return data[..., front : front + length].astype(jnp.float32)


def istft(
    spec: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    length: int,
    analysis_window: np.ndarray | None = None,
    nfft: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT of (..., n_frames, nfft//2+1) complex → (..., length).

    `length` is the (static) original signal length; consistency with the
    analysis framing is asserted. `analysis_window` defaults to `window`
    (reference default).
    """
    window = np.asarray(window, np.float32)
    if analysis_window is None:
        analysis_window = window
    analysis_window = np.asarray(analysis_window, np.float32)
    if nfft is None:
        nfft = 2 * (int(spec.shape[-1]) - 1)
    expect = num_frames(length, hop)
    if int(spec.shape[-2]) != expect:
        raise ValueError(
            f"spec has {spec.shape[-2]} frames but length={length}, hop={hop} "
            f"implies {expect} (reference framing)"
        )
    inv_norm = 1.0 / ola_norm(window, analysis_window, int(hop), expect)
    return _istft_impl(
        spec, jnp.asarray(window), jnp.asarray(inv_norm), int(hop), int(length), int(nfft)
    )
