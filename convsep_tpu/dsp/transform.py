"""TransformFFT: the user-facing analysis/resynthesis object.

Reference parity: `Transforms` / `transformFFT` in transform.py [U]
(SURVEY.md §2.1 #2) — an object bundling frameSize/hopSize/bins/iscale
config with `compute_file` (audio → magnitude [+ phase]), `compute_inverse`
(magnitude + phase → audio) and `compute_transform` (audio → feature files
on disk). Same capabilities, TPU execution: the heavy math runs jitted on
device; file I/O stays host-side.

Boundary rule: magnitudes/phases cross the device boundary as float32
(complex device→host transfer is unimplemented on some TPU runtimes — see
.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs.presets import TransformConfig
from convsep_tpu.data.io import save_tensor
from convsep_tpu.dsp.dft import istft_matmul, stft_matmul
from convsep_tpu.dsp.istft import istft
from convsep_tpu.dsp.stft import magphase, scale_magnitude, stft, unscale_magnitude
from convsep_tpu.dsp.windows import hann, sinebell


class TransformFFT:
    """STFT feature transform with a reference-shaped API.

    >>> t = TransformFFT(TransformConfig())
    >>> mag, phase = t.compute_file(audio, phase=True)
    >>> audio_again = t.compute_inverse(mag, phase, length=len(audio))
    """

    def __init__(self, config: TransformConfig = TransformConfig()):
        self.config = config
        if config.window == "sinebell":
            self.window = sinebell(config.frame_size)
        elif config.window == "hann":
            self.window = hann(config.frame_size)
        else:
            raise ValueError(f"unknown window {config.window!r}")

    @property
    def bins(self) -> int:
        return self.config.bins

    def compute_file(
        self, audio: np.ndarray, phase: bool = False
    ) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
        """Mono audio (length,) → magnitude (frames, bins) float32
        [+ phase (frames, bins)] with the configured iscale applied."""
        audio = np.asarray(audio, np.float32)
        if audio.ndim != 1:
            raise ValueError(f"expected mono audio, got shape {audio.shape}")
        if self.config.fft_impl == "matmul":
            re, im = stft_matmul(audio, self.window, self.config.hop_size, self.config.nfft)
            mag = jnp.sqrt(re * re + im * im)
            ph = jnp.arctan2(im, re)
        else:
            spec = stft(audio, self.window, self.config.hop_size, self.config.nfft)
            mag, ph = magphase(spec)
        mag = scale_magnitude(mag, self.config.iscale)
        if phase:
            return np.asarray(mag), np.asarray(ph)
        return np.asarray(mag)

    def compute_inverse(
        self, mag: np.ndarray, phase: np.ndarray, length: int | None = None
    ) -> np.ndarray:
        """Magnitude (frames, bins) + phase → time signal (length,)."""
        mag = unscale_magnitude(jnp.asarray(mag, jnp.float32), self.config.iscale)
        phase = jnp.asarray(phase, jnp.float32)
        if length is None:
            # invert the reference frame-count formula: nf = ceil(L/hop)+2
            length = (mag.shape[-2] - 2) * self.config.hop_size
        if self.config.fft_impl == "matmul":
            return np.asarray(
                istft_matmul(
                    mag * jnp.cos(phase),
                    mag * jnp.sin(phase),
                    self.window,
                    self.config.hop_size,
                    int(length),
                    nfft=self.config.nfft,
                )
            )
        spec = mag * jnp.exp(1j * phase)
        return np.asarray(
            istft(spec, self.window, self.config.hop_size, int(length), nfft=self.config.nfft)
        )

    def compute_transform(
        self, audio: np.ndarray, out_path: str, phase: bool = False
    ) -> None:
        """Audio → feature file(s): `<out_path>.data` (+ `.phase.data`).

        `out_path` excludes the .data suffix (reference wrote sidecar
        feature files per track/stem — SURVEY.md §3.1)."""
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        if phase:
            mag, ph = self.compute_file(audio, phase=True)
            save_tensor(ph, out_path + ".phase.data")
        else:
            mag = self.compute_file(audio)
        save_tensor(mag, out_path + ".data")
