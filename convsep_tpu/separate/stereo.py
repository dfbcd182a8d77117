"""Stereo-native joint-channel separation (one forward for both ears).

The reference is mono-only: its scripts downmix or process channels
independently (separate_dsd.py [U], SURVEY.md §2.1 #8; ROADMAP r1 #4 left
the joint variant unexplored). Here a single ConvSep forward consumes BOTH
channel magnitudes as input channels (``channels_in=2``) and the tied
decoder keeps per-channel estimates (``decoder_reduce="all"``) — the
network sees inter-channel cues (panning, stereo width) the mono model
cannot, and the whole stereo track still runs as ONE fused XLA program:

    stft(L,R) → |·| → segment → CNN joint forward → per-channel Wiener
    mask × per-channel complex mixture → istft → (S, 2, length) stems

TPU notes: the channel axis rides the trailing (lane) dimension through
the CNN — the two transposes here move (2, nseg·T·F)-sized magnitudes
(a few MB), not decoder activations; STFT/iSTFT batch the channel axis
through the same MXU matmul path as mono.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs.presets import Preset
from convsep_tpu.data.segment import segment_frames, unsegment_frames
from convsep_tpu.dsp import istft, scale_magnitude, stft
from convsep_tpu.dsp.dft import istft_matmul, stft_matmul
from convsep_tpu.models.convsep import ConvSep
from convsep_tpu.models.masks import wiener_mask
from convsep_tpu.separate.pipeline import _window, bucket_length


@partial(jax.jit, static_argnames=("preset", "length", "output_dtype", "conserve_last"))
def separate_fused_stereo(
    params,
    audio: jnp.ndarray,
    preset: Preset,
    length: int,
    output_dtype: str = "float32",
    conserve_last: bool = False,
) -> jnp.ndarray:
    """audio (2, length) → stems (num_sources, 2, length), one XLA program.

    Requires a stereo preset (``channels_in=2``, ``decoder_reduce="all"``
    — see configs.presets.stereo_preset). int16 input is dequantized on
    device; ``output_dtype="int16"`` quantizes stems on device (PCM16 both
    ways halves tunnel bytes, as in the mono path).
    """
    t, m, tr = preset.transform, preset.model, preset.train
    if m.channels_in != 2 or m.decoder_reduce != "all":
        raise ValueError(
            "separate_fused_stereo needs a stereo preset "
            f"(channels_in=2, decoder_reduce='all'); got channels_in="
            f"{m.channels_in}, decoder_reduce={m.decoder_reduce!r}"
        )
    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    win = _window(preset)
    use_fft = t.fft_impl == "fft"
    if use_fft:
        spec = stft(audio, win, t.hop_size, t.nfft)  # (2, nf, bins) complex
        mag_raw = jnp.abs(spec)
    else:
        # matmul MXU path; the pallas kernels keep their mono grids, so the
        # stereo path routes "pallas" through the equivalent matmul DFT
        # analysis stays fp32-exact; dft_precision governs resynthesis only
        # (see separate/pipeline.py)
        re, im = stft_matmul(audio, win, t.hop_size, t.nfft)  # (2, nf, bins)
        mag_raw = jnp.sqrt(re * re + im * im)
    nf = mag_raw.shape[-2]
    mag = scale_magnitude(mag_raw, t.iscale) * tr.mult_factor_in  # (2, nf, F)

    segs = segment_frames(mag, m.time_context)  # (2, nseg, T, F)
    x = segs.transpose(1, 2, 3, 0)  # (nseg, T, F, 2)
    y = ConvSep(m).apply(params, x, method=ConvSep.sources)  # (nseg, S, T, F, 2)
    y_frames = unsegment_frames(y.transpose(1, 4, 0, 2, 3), nf)  # (S, 2, nf, F)
    mask = wiener_mask(
        y_frames, p=preset.sep.wiener_p, eps=preset.sep.wiener_eps, axis=0,
        conserve_last=conserve_last,
    )  # (S, 2, nf, F)
    if use_fft:
        stems = istft(mask * spec[None], win, t.hop_size, length, nfft=t.nfft)
    else:
        stems = istft_matmul(
            mask * re[None], mask * im[None], win, t.hop_size, length,
            nfft=t.nfft, precision=t.dft_precision,
        )
    if output_dtype == "int16":
        from convsep_tpu.utils.pcm import quantize_pcm16

        return quantize_pcm16(stems)
    return stems  # (S, 2, length)


class StereoSeparator:
    """Whole-track stereo separator with per-bucket compile caching.

    Accepts (length, 2) (wav convention) or (2, length) float32/int16
    arrays; returns (num_sources, length, 2) stems matching the input
    layout convention of data.io.write_wav.
    """

    def __init__(
        self,
        preset: Preset,
        params,
        output_dtype: str = "float32",
        input_dtype: str = "float32",
        conserve_last: bool = False,
        complement_last: bool = False,
    ):
        if output_dtype not in ("float32", "int16"):
            raise ValueError(f"output_dtype must be float32|int16, got {output_dtype}")
        if input_dtype not in ("float32", "int16"):
            raise ValueError(f"input_dtype must be float32|int16, got {input_dtype}")
        self.preset = preset
        self.params = params
        self.output_dtype = output_dtype
        self.input_dtype = input_dtype
        # complement_last (implies conserve_last): skip the last stem's
        # download; derive it host-side (separate/complement.py)
        if complement_last and preset.model.num_sources < 2:
            raise ValueError(
                "complement_last requires a preset with >= 2 sources "
                f"(got num_sources={preset.model.num_sources})"
            )
        self.complement_last = bool(complement_last)
        self.conserve_last = bool(conserve_last or complement_last)

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio)
        if audio.ndim != 2:
            raise ValueError(f"expected stereo audio, got shape {audio.shape}")
        if audio.shape[1] == 2 and audio.shape[0] != 2:
            audio = audio.T  # (L, 2) wav layout → (2, L)
        elif audio.shape[0] != 2:
            raise ValueError(f"expected a 2-channel axis, got shape {audio.shape}")
        if self.input_dtype == "int16" and audio.dtype != np.int16:
            from convsep_tpu.utils.pcm import quantize_pcm16_host

            audio = quantize_pcm16_host(audio)
        elif self.input_dtype == "float32":
            audio = np.asarray(audio, np.float32)
        L = audio.shape[1]
        Lb = bucket_length(L, self.preset)
        padded = np.pad(audio, ((0, 0), (0, Lb - L)))
        stems = separate_fused_stereo(
            self.params, jnp.asarray(padded), self.preset, Lb, self.output_dtype,
            self.conserve_last,
        )
        from convsep_tpu.utils.transfer import fetch_parallel

        if self.complement_last:
            from convsep_tpu.separate.complement import derive_last_stem

            S = self.preset.model.num_sources
            others = fetch_parallel(stems[: S - 1])  # (S-1, 2, Lb)
            last = derive_last_stem(
                others, padded, self.input_dtype, self.output_dtype
            )
            full = np.concatenate([others, last[None]], axis=0)
            return full[:, :, :L].transpose(0, 2, 1)
        return fetch_parallel(stems)[:, :, :L].transpose(0, 2, 1)  # (S, L, 2)
