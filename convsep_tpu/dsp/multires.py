"""Multi-resolution spectrogram channels (BASELINE.json config #5).

A high-res 4096-pt analysis trades time resolution for frequency
resolution; stacking magnitudes from shorter windows as extra input
channels gives the CNN both. All resolutions share the SAME hop, so the
reference frame-count formula yields identical frame grids — alignment is
exact, no resampling in time. Each extra resolution's bins are mapped onto
the main resolution's frequency axis with a precomputed linear-
interpolation matrix: one (bins_src × bins_dst) matmul on the MXU, fusing
straight into the rest of the pipeline.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs.presets import TransformConfig
from convsep_tpu.dsp.dft import stft_matmul
from convsep_tpu.dsp.stft import stft
from convsep_tpu.dsp.windows import hann, sinebell


@lru_cache(maxsize=16)
def freq_interp_matrix(bins_src: int, bins_dst: int, fs: float = 1.0) -> np.ndarray:
    """(bins_src, bins_dst) linear interpolation of one rfft bin axis onto
    another (both spanning 0..Nyquist)."""
    src = np.linspace(0.0, fs / 2, bins_src)
    dst = np.linspace(0.0, fs / 2, bins_dst)
    m = np.zeros((bins_src, bins_dst), np.float32)
    idx = np.searchsorted(src, dst, side="right") - 1
    idx = np.clip(idx, 0, bins_src - 2)
    frac = (dst - src[idx]) / (src[idx + 1] - src[idx])
    m[idx, np.arange(bins_dst)] = 1.0 - frac
    m[idx + 1, np.arange(bins_dst)] = frac
    return m


def _window(name: str, n: int) -> np.ndarray:
    return sinebell(n) if name == "sinebell" else hann(n)


def multires_channels(audio: jnp.ndarray, t: TransformConfig) -> jnp.ndarray:
    """(length,) → (n_frames, bins, len(multires)) extra magnitude channels
    aligned with the main analysis grid (same hop ⇒ same n_frames)."""
    if not t.multires:
        raise ValueError("preset has no multires sizes configured")
    chans = []
    for size in t.multires:
        win = _window(t.window, size)
        if t.fft_impl == "matmul":
            re, im = stft_matmul(audio, win, t.hop_size, size)
            mag = jnp.sqrt(re * re + im * im)
        else:
            mag = jnp.abs(stft(audio, win, t.hop_size, size))
        interp = jnp.asarray(freq_interp_matrix(size // 2 + 1, t.bins))
        chans.append(jnp.matmul(mag, interp, preferred_element_type=jnp.float32))
    return jnp.stack(chans, axis=-1)
