"""Ideal-soft-mask oracle: the upper bound a Wiener-mask separator of this
transform configuration can reach (VERDICT r1 #3: synthetic quality numbers
need an upper-bound anchor next to model SDR).

The oracle knows the true stem magnitudes: mask_i = |S_i|^p / Σ_j |S_j|^p,
applied to the complex mixture spectrogram (mixture phase, exactly like the
model's Wiener path — separate/pipeline.py), then inverse-transformed. Any
model SDR is bounded above by this; the gap model→oracle is the learnable
headroom, the gap oracle→∞ is the transform's own ceiling (mask real-ness +
phase reuse + window overlap).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from convsep_tpu.configs.presets import Preset
from convsep_tpu.dsp import istft, stft
from convsep_tpu.dsp.windows import hann, sinebell


def oracle_stems(
    mixture: np.ndarray,
    stems: np.ndarray,
    preset: Preset,
    p: float | None = None,
    eps: float | None = None,
) -> np.ndarray:
    """(L,) mixture + (S, L) true stems → (S, L) ideal-soft-mask estimates.

    Uses the preset's transform configuration (window/hop/nfft) and Wiener
    exponent so the bound matches what the model path could achieve.
    """
    t = preset.transform
    p = preset.sep.wiener_p if p is None else p
    eps = preset.sep.wiener_eps if eps is None else eps
    win = (sinebell if t.window == "sinebell" else hann)(t.frame_size)
    mixture = np.asarray(mixture, np.float32)
    stems = np.asarray(stems, np.float32)
    if stems.ndim != 2 or stems.shape[1] != mixture.shape[0]:
        raise ValueError(f"stems {stems.shape} do not match mixture {mixture.shape}")
    L = mixture.shape[0]
    spec_mix = stft(mixture, win, t.hop_size, t.nfft)  # (nf, bins) complex
    spec_stems = stft(stems, win, t.hop_size, t.nfft)  # (S, nf, bins)
    mags = jnp.abs(spec_stems) ** p
    mask = mags / (jnp.sum(mags, axis=0, keepdims=True) + eps)
    est = mask * spec_mix[None]
    return np.asarray(istft(est, win, t.hop_size, L, nfft=t.nfft))
