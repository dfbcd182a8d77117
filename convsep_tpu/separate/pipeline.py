"""Fused whole-track separation: one XLA program, HBM-resident end to end.

Reference behavior being replaced (separate_dsd.py [U], SURVEY.md §3.3):
CPU STFT of the whole track, a host Python loop running the compiled
predict function per time_context segment, host numpy Wiener mask, CPU
iSTFT. Every segment crossed host↔device.

TPU-native design (BASELINE.json north star): the entire chain

    stft → |·| → scale → segment (reshape) → CNN over all segments as one
    batch → unsegment → generalized Wiener mask × complex mixture → istft

is a single jitted program per (bucketed) track length. Segments become a
batch axis (`(num_segments, T, F)` — SURVEY.md §5.7), so the CNN runs as
one large MXU-friendly batch; the mask multiplies the complex mixture
spectrogram directly (real mask × complex spec ≡ masked magnitude with
mixture phase); nothing round-trips to the host until the final float32
stems. Track lengths are padded to buckets so the number of compiled
shapes stays bounded (SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs.presets import Preset
from convsep_tpu.data.segment import segment_frames, unsegment_frames
from convsep_tpu.dsp import istft, num_frames, scale_magnitude, stft, hann
from convsep_tpu.dsp.dft import istft_wiener, stft_matmul
from convsep_tpu.dsp.windows import sinebell as _sinebell
from convsep_tpu.models.convsep import ConvSep
from convsep_tpu.models.masks import wiener_mask


def _window(preset: Preset) -> np.ndarray:
    if preset.transform.window == "sinebell":
        return _sinebell(preset.transform.frame_size)
    if preset.transform.window == "hann":
        return hann(preset.transform.frame_size)
    raise ValueError(f"unknown window {preset.transform.window!r}")


def bucket_length(length: int, preset: Preset) -> int:
    """Pad a sample count so compiled separation shapes are bucketed.

    Rounds up to a multiple of hop * time_context * segment_bucket, so the
    padded track yields a whole number of `segment_bucket` segment groups.
    """
    unit = (
        preset.transform.hop_size
        * preset.model.time_context
        * preset.sep.segment_bucket
    )
    return max(unit, int(math.ceil(length / unit)) * unit)


def _score_gate(y_frames, extra, mag, preset, src_axis: int):
    """Score-gated resynthesis (SepConfig.score_gate; SURVEY.md §3.4).

    Multiplies each source's magnitude estimate by (1−g) + g·mask_i before
    the Wiener normalization. mask_i is recovered ON DEVICE from the
    score-filtered extra channels: extra_i = mask_i·|mix|·mult (the host
    computes them from the same STFT), so extra_i / (|mix|·mult) ≈ mask_i
    up to STFT float noise. No-op unless the preset is score-informed
    (channels_in = 1+S, no multires), lin iscale, and score_gate > 0.

    Two modes (SepConfig.score_gate_mode): "mult" multiplies the estimate
    by (1−g) + g·mask_i; "blend" returns (1−g)·est_i + g·mask_i·|mix| — a
    convex combination whose g=1 end is score-mask-only separation (the
    stronger lever where the model is weaker than the score prior; pinned
    bach10 battery 2026-08-20).

    `src_axis`: 0 → y (S, nf, F), extra (nf, F, S), mag (nf, F);
                1 → y (B, S, nf, F), extra (B, nf, F, S), mag (B, nf, F).
    """
    g = preset.sep.score_gate
    m, t = preset.model, preset.transform
    if (
        g <= 0
        or extra is None
        or t.multires
        or t.iscale != "lin"
        or m.channels_in != 1 + m.num_sources
    ):
        return y_frames
    # extra_i = mask_i·|mix|·mult_factor_in; y approximates
    # mag_src·mult_factor_out — rescale the prior into output units so the
    # blend is a true convex combination (factors are equal by default)
    prior = jnp.moveaxis(extra, -1, src_axis)
    if preset.sep.score_gate_mode == "blend":
        prior = prior * (preset.train.mult_factor_out / preset.train.mult_factor_in)
        return (1.0 - g) * y_frames + g * prior
    if preset.sep.score_gate_mode != "mult":
        raise ValueError(
            f"unknown score_gate_mode {preset.sep.score_gate_mode!r}; "
            "have mult | blend"
        )
    gate = prior / ((mag[None] if src_axis == 0 else mag[:, None]) + 1e-6)
    gate = jnp.clip(gate, 0.0, 1.0)
    return y_frames * ((1.0 - g) + g * gate)


@partial(jax.jit, static_argnames=("preset", "length", "apply_fn", "output_dtype", "conserve_last"))
def separate_fused(
    params,
    audio: jnp.ndarray,
    extra: jnp.ndarray | None,
    preset: Preset,
    length: int,
    apply_fn=None,
    output_dtype: str = "float32",
    conserve_last: bool = False,
) -> jnp.ndarray:
    """audio (length,) → stems (num_sources, length), one XLA program.

    `extra`: optional (n_frames, F, C-1) score-informed channels aligned
    with the mixture frames (already scaled like the mixture input).
    `apply_fn`: model apply override (defaults to ConvSep(preset.model)).
    `output_dtype="int16"` converts stems to PCM16 ON DEVICE — exactly the
    wav output precision, at half the device→host bytes (the host link is
    the bottleneck on tunneled runtimes).
    `conserve_last`: conservative Wiener masks (masks sum to EXACTLY 1 —
    unclaimed TF energy goes to the LAST stem), so Σ stems equals the
    iSTFT∘STFT-roundtripped mixture; enables host-side complement-fetch
    of the last stem (VERDICT r3 #4 — previously chunked-only).
    """
    ny = None
    t, m, tr = preset.transform, preset.model, preset.train
    if audio.dtype == jnp.int16:
        # PCM16 ingest: wav-precision samples at HALF the host→device bytes
        # (the host link dominates e2e on tunneled runtimes); dequantized on
        # device with the exact inverse of the int16 output quantization
        audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    win = _window(preset)
    if t.fft_impl == "matmul":
        # real-valued MXU path: no complex dtype anywhere (dsp/dft.py)
        # analysis stays fp32-exact ("highest"): it is ~0.1 ms/track and
        # feeds the NETWORK INPUT, where any perturbation is amplified
        # nonlinearly (relu patterns / Wiener ratios); dft_precision
        # governs only the linear resynthesis matmuls below, so its output
        # error is bounded (~2.4e-7 rel at "high" — far below PCM16)
        nfft_ = t.nfft or t.frame_size
        from convsep_tpu.dsp.pallas.ct_stft_kernel import (
            resolve_analysis, stft_ct_pallas,
        )

        if resolve_analysis(
            t.analysis, t.masked_synthesis, nfft_, t.frame_size,
            t.hop_size, preset.sep.wiener_p, (audio,),
        ) == "ct_pallas":
            re, im, ny = stft_ct_pallas(audio, win, t.hop_size, nfft_)
            mag_raw = jnp.concatenate(
                [jnp.sqrt(re * re + im * im), jnp.abs(ny)[..., None]],
                axis=-1,
            )
        else:
            re, im = stft_matmul(audio, win, t.hop_size, t.nfft)  # (nf, bins) ×2
            mag_raw = jnp.sqrt(re * re + im * im)
        nf = re.shape[0]
    elif t.fft_impl == "pallas":
        # fused framing+window+DFT kernel (dsp/pallas) — frames never
        # materialize in HBM (SURVEY.md §2.2 #1)
        from convsep_tpu.dsp.pallas import stft_pallas

        re, im = stft_pallas(audio, win, t.hop_size, t.nfft)
        nf = re.shape[0]
        mag_raw = jnp.sqrt(re * re + im * im)
    else:
        spec = stft(audio, win, t.hop_size, t.nfft)  # (nf, bins) complex
        nf = spec.shape[0]
        mag_raw = jnp.abs(spec)
    mag = scale_magnitude(mag_raw, t.iscale) * tr.mult_factor_in

    if extra is None and t.multires:
        # multi-resolution channels computed inside the same program
        from convsep_tpu.dsp.multires import multires_channels

        extra = scale_magnitude(multires_channels(audio, t), t.iscale) * tr.mult_factor_in

    segs = segment_frames(mag, m.time_context)  # (nseg, T, F)
    if extra is not None:
        ex = segment_frames(extra.transpose(2, 0, 1), m.time_context)  # (C-1, nseg, T, F)
        x = jnp.concatenate([segs[..., None], ex.transpose(1, 2, 3, 0)], axis=-1)
    else:
        x = segs[..., None]

    if apply_fn is None:
        # native source-major forward: (nseg, S, T, F), no lane transpose
        y = ConvSep(m).apply(params, x, method=ConvSep.sources)
    else:
        y = apply_fn(params, x).transpose(0, 3, 1, 2)  # legacy (B,T,F,S) overrides
    # (nseg,S,T,F) → (S,nseg,T,F): leading-axes block copy (cheap), then a
    # free reshape to (S, nf, F) — replaces r1's materialized lane
    # transposes (reshape.80, 1.4 ms/track in the device trace)
    y_frames = unsegment_frames(y.transpose(1, 0, 2, 3), nf)  # (S, nf, F)
    y_frames = _score_gate(y_frames, extra, mag, preset, src_axis=0)
    if t.fft_impl == "pallas":
        if conserve_last:
            raise ValueError("conserve_last is not supported by the pallas mask kernel")
        # fused mask+apply (never materializes per-source masks) + fused
        # inverse-DFT/OLA kernels, sources on the batch grid axis
        from convsep_tpu.dsp.pallas import istft_pallas, wiener_apply_pallas

        est_re, est_im = wiener_apply_pallas(
            y_frames, re, im, p=preset.sep.wiener_p, eps=preset.sep.wiener_eps
        )
        stems = istft_pallas(est_re, est_im, win, t.hop_size, length, nfft=t.nfft)
    elif t.fft_impl == "matmul":
        # masked resynthesis in ONE call: on TPU the fused Wiener+iSTFT
        # mega-kernel (qualifying shapes) never materializes the masked
        # spectra; elsewhere the XLA wiener_mask·(re, im) chain. PCM16
        # output quantizes inside the synthesis either way.
        return istft_wiener(
            y_frames, re, im, win, t.hop_size, length, nfft=t.nfft,
            precision=t.dft_precision, algorithm=t.masked_synthesis,
            output_dtype=output_dtype,
            p=preset.sep.wiener_p, eps=preset.sep.wiener_eps,
            conserve_last=conserve_last, ny=ny,
        )
    else:
        mask = wiener_mask(
            y_frames.astype(jnp.float32), p=preset.sep.wiener_p,
            eps=preset.sep.wiener_eps, axis=0,
            conserve_last=conserve_last,
        )  # (S, nf, bins); real mask ⇒ mixture phase kept
        est_spec = mask * spec[None]  # (S, nf, bins) complex
        stems = istft(est_spec, win, t.hop_size, length, nfft=t.nfft)
    if output_dtype == "int16":
        from convsep_tpu.utils.pcm import quantize_pcm16

        return quantize_pcm16(stems)
    return stems


@partial(jax.jit, static_argnames=("preset", "length", "apply_fn", "output_dtype", "conserve_last"))
def separate_fused_batch(
    params,
    tracks: jnp.ndarray,
    extra: jnp.ndarray | None,
    preset: Preset,
    length: int,
    apply_fn=None,
    output_dtype: str = "float32",
    conserve_last: bool = False,
) -> jnp.ndarray:
    """tracks (B, length) → stems (B, num_sources, length): the fused
    pipeline with a NATIVE batch axis — same math as
    ``vmap(separate_fused)`` (CPU-equality tested) but no pallas batching
    rule and no vmap-driven layout choices.

    Why this exists (trace 2026-08-19, highres4096 vmap8): under vmap XLA
    kept intermediates source-major, so the program paid a while-loop
    (track, source)-transpose assembly + an extra relayout of the iSTFT
    output — ~11 ms of a 70 ms batch. With the batch axis native, the
    iSTFT kernel grid is simply B·S tracks-major and the stems come out in
    their storage order.

    `extra`: (B, n_frames, F, C-1) per-track or (n_frames, F, C-1)
    broadcast to every track. fft_impl="pallas" presets fall back to the
    vmapped path in :func:`convsep_tpu.separate.stream.separate_batch`
    (those kernels bake single-track shape assumptions).
    """
    from convsep_tpu.models.convsep import precompose_collapsed

    t, m, tr = preset.transform, preset.model, preset.train
    if t.fft_impl == "pallas":
        raise ValueError("separate_fused_batch: use separate_batch for fft_impl='pallas'")
    # inside the jit: the collapsed-encoder composition compiles as a fixed
    # prefix of the program (one GEMM chain over the params), not an eager
    # per-call dispatch storm
    params = precompose_collapsed(params, m)
    B = tracks.shape[0]
    if tracks.dtype == jnp.int16:
        tracks = tracks.astype(jnp.float32) * (1.0 / 32768.0)
    win = _window(preset)
    ny = None
    if t.fft_impl == "matmul":
        nfft_ = t.nfft or t.frame_size
        from convsep_tpu.dsp.pallas.ct_stft_kernel import (
            resolve_analysis, stft_ct_pallas,
        )

        if resolve_analysis(
            t.analysis, t.masked_synthesis, nfft_, t.frame_size,
            t.hop_size, preset.sep.wiener_p, (tracks,),
        ) == "ct_pallas":
            # fused framing+window+factored-DFT kernel: the (B, nf, W)
            # frames tensor never exists, spectra arrive Nyquist-separate
            # so the downstream Wiener mega-kernel reads them concat-free
            re, im, ny = stft_ct_pallas(tracks, win, t.hop_size, nfft_)
            mag_raw = jnp.concatenate(
                [jnp.sqrt(re * re + im * im), jnp.abs(ny)[..., None]],
                axis=-1,
            )
        else:
            re, im = stft_matmul(tracks, win, t.hop_size, t.nfft)  # (B, nf, bins)
            mag_raw = jnp.sqrt(re * re + im * im)
        nf = re.shape[1]
    else:
        spec = stft(tracks, win, t.hop_size, t.nfft)
        nf = spec.shape[1]
        mag_raw = jnp.abs(spec)
    mag = scale_magnitude(mag_raw, t.iscale) * tr.mult_factor_in

    if extra is None and t.multires:
        from convsep_tpu.dsp.multires import multires_channels

        extra = scale_magnitude(multires_channels(tracks, t), t.iscale) * tr.mult_factor_in
    if extra is not None and extra.ndim == 3:
        extra = jnp.broadcast_to(extra, (B, *extra.shape))

    segs = segment_frames(mag, m.time_context)  # (B, nseg, T, F)
    nseg = segs.shape[1]
    if extra is not None:
        ex = segment_frames(
            extra.transpose(0, 3, 1, 2), m.time_context
        )  # (B, C-1, nseg, T, F)
        x = jnp.concatenate([segs[..., None], ex.transpose(0, 2, 3, 4, 1)], axis=-1)
    else:
        x = segs[..., None]
    x = x.reshape(B * nseg, *x.shape[2:])  # (B·nseg, T, F, C)

    if apply_fn is None:
        y = ConvSep(m).apply(params, x, method=ConvSep.sources)  # (B·nseg, S, T, F)
    else:
        y = apply_fn(params, x).transpose(0, 3, 1, 2)
    S = y.shape[1]
    y = y.reshape(B, nseg, S, *y.shape[2:]).transpose(0, 2, 1, 3, 4)
    y_frames = unsegment_frames(y, nf)  # (B, S, nf, F)
    y_frames = _score_gate(y_frames, extra, mag, preset, src_axis=1)

    if t.fft_impl == "matmul":
        # fused Wiener+iSTFT on TPU (masked spectra never materialize);
        # XLA mask·(re, im) chain elsewhere — identical math
        return istft_wiener(
            y_frames, re, im, win, t.hop_size, length, nfft=t.nfft,
            precision=t.dft_precision, algorithm=t.masked_synthesis,
            output_dtype=output_dtype,
            p=preset.sep.wiener_p, eps=preset.sep.wiener_eps,
            conserve_last=conserve_last, ny=ny,
        )
    mask = wiener_mask(
        y_frames.astype(jnp.float32), p=preset.sep.wiener_p,
        eps=preset.sep.wiener_eps, axis=1,
        conserve_last=conserve_last,
    )  # (B, S, nf, bins)
    stems = istft(mask * spec[:, None], win, t.hop_size, length, nfft=t.nfft)
    if output_dtype == "int16":
        from convsep_tpu.utils.pcm import quantize_pcm16

        return quantize_pcm16(stems)
    return stems


class Separator:
    """Whole-track separator with per-bucket compile caching.

    >>> sep = Separator(preset, params)
    >>> stems = sep(audio)           # (num_sources, len(audio)) float32
    """

    def __init__(
        self,
        preset: Preset,
        params,
        apply_fn=None,
        output_dtype: str = "float32",
        input_dtype: str = "float32",
        conserve_last: bool = False,
        complement_last: bool = False,
    ):
        if apply_fn is None:
            # one-time fc_expand prep for the fused Mosaic decode — the raw
            # leaf costs ~8 ms of relayout/pad HBM passes per dispatch
            # (models.convsep.prepare_inference; no-op for other decoders)
            from convsep_tpu.models.convsep import prepare_inference

            params = prepare_inference(preset.model, params)
        self.preset = preset
        self.params = params
        self.apply_fn = apply_fn
        if output_dtype not in ("float32", "int16"):
            raise ValueError(f"output_dtype must be float32|int16, got {output_dtype}")
        if input_dtype not in ("float32", "int16"):
            raise ValueError(f"input_dtype must be float32|int16, got {input_dtype}")
        self.output_dtype = output_dtype
        self.input_dtype = input_dtype
        # complement_last (implies conserve_last): conservative Wiener masks
        # on device (Σ masks = 1) + the last stem derived HOST-side as
        # mixture − Σ others — (S−1)/S of the plain download bytes
        # (separate/complement.py; VERDICT r3 #4: previously chunked-only)
        if complement_last and preset.model.num_sources < 2:
            raise ValueError(
                "complement_last requires a preset with >= 2 sources "
                f"(got num_sources={preset.model.num_sources})"
            )
        if (complement_last or conserve_last) and preset.transform.fft_impl == "pallas":
            raise ValueError("conserve_last is not supported by the pallas mask kernel")
        self.complement_last = bool(complement_last)
        self.conserve_last = bool(conserve_last or complement_last)

    def _prepare(self, audio: np.ndarray) -> np.ndarray:
        """Cast per input_dtype: int16 halves the upload; PCM16 wavs
        round-trip exactly (the device dequantizes by 1/32768)."""
        if self.input_dtype == "int16":
            if audio.dtype == np.int16:
                return audio
            from convsep_tpu.utils.pcm import quantize_pcm16_host

            return quantize_pcm16_host(audio)
        return np.asarray(audio, np.float32)

    def __call__(self, audio: np.ndarray, extra: np.ndarray | None = None) -> np.ndarray:
        """→ (num_sources, len) stems; float32 in [-1,1] or PCM int16 per
        `output_dtype` (int16 halves the device→host transfer)."""
        audio = self._prepare(audio)
        if audio.ndim != 1:
            raise ValueError(f"expected mono (length,) audio, got {audio.shape}")
        L = len(audio)
        Lb = bucket_length(L, self.preset)
        padded = np.pad(audio, (0, Lb - L))
        if extra is not None:
            nf = num_frames(Lb, self.preset.transform.hop_size)
            extra = np.asarray(extra, np.float32)
            if extra.shape[0] < nf:
                extra = np.pad(extra, ((0, nf - extra.shape[0]), (0, 0), (0, 0)))
            extra = jnp.asarray(extra[:nf])
        stems = separate_fused(
            self.params,
            jnp.asarray(padded),
            extra,
            self.preset,
            Lb,
            self.apply_fn,
            self.output_dtype,
            self.conserve_last,
        )
        from convsep_tpu.utils.transfer import fetch_parallel

        if self.complement_last:
            # fetch S−1 stems; the last is mixture − Σ others on the host
            from convsep_tpu.separate.complement import derive_last_stem

            S = self.preset.model.num_sources
            others = fetch_parallel(stems[: S - 1])
            last = derive_last_stem(
                others, padded, self.input_dtype, self.output_dtype
            )
            return np.concatenate([others, last[None]], axis=0)[:, :L]
        # per-stem concurrent fetch: the tunneled link is per-RPC-stream
        # limited (~27 MB/s single vs ~37 MB/s x4, BASELINE.md)
        return fetch_parallel(stems)[:, :L]
