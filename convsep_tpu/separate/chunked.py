"""Chunked single-track streaming separation: fixed-size chunks through the
fused program with a device-resident OLA carry across chunk seams.

Reference behavior being replaced (separate_dsd.py [U], SURVEY.md §3.3):
the reference's host Python loop ran the predict function per time_context
segment — a genuine online/low-latency mode, but every segment crossed
host↔device. The whole-track fused program (separate/pipeline.py) removed
the loop but must upload the full mixture and download full stems around
ONE dispatch, so a single track's transfers cannot overlap its own compute
(VERDICT r1 missing-#2: single-track e2e ~94× vs the >100× target).

TPU-native design: the track is cut into chunks of ``chunk_segments``
whole time-context windows (so CNN segment boundaries are identical to the
whole-track program's — the model sees byte-identical inputs) and ONE
compiled chunk program runs per chunk:

    frames → DFT (MXU matmul) → CNN → Wiener mask → inverse DFT →
    local overlap-add → + spill carry → normalize → PCM16 stems chunk

The only cross-chunk coupling is the iSTFT overlap-add spill: the last
``W - hop`` unnormalized OLA samples of chunk *i* are returned as a small
device array and consumed by chunk *i+1* — the time-domain analog of
``distributed/halo.py::halo_overlap_add``'s seam exchange, carried on ONE
device instead of across a mesh. Chunk uploads, compute, and stem
downloads all overlap (async dispatch + a fetch thread pool), so a single
track streams at near the device-transfer floor. Chunked output equals the
whole-track program's output to float tolerance (tests/test_chunked.py).

The window-power normalization sequence is position-dependent only in the
first chunk's ramp-up and the last chunk's tail, so the per-chunk
normalization slice is a device INPUT (three cached arrays: first / middle
/ last) and every middle chunk reuses one compiled program + one constant.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs.presets import Preset
from convsep_tpu.dsp.dft import (
    _dft_frames_factored,
    _forward_mats,
    _idft_frames_factored,
    _inverse_mats,
    _key,
    _use_factored,
)
from convsep_tpu.dsp.istft import ola_norm, overlap_add
from convsep_tpu.dsp.stft import frame_signal, num_frames, scale_magnitude
from convsep_tpu.models.convsep import ConvSep
from convsep_tpu.models.masks import wiener_mask
from convsep_tpu.separate.pipeline import _window


def _multires_extra_chunk(audio_slice: jnp.ndarray, preset: Preset, Fc: int) -> jnp.ndarray:
    """(Fc*hop + W - hop,) padded-coordinate chunk slice → (Fc, bins, n_res)
    multi-resolution extra channels, byte-identical to the whole-track
    `dsp/multires.py::multires_channels` grid.

    All resolutions share the main hop, and every extra window W2 is
    smaller than the main W, so resolution W2's frame n starts at
    n*hop - W2//2 in track coordinates = n*hop + (W - W2)//2 inside the
    main slice (front pad W//2) — the chunk slice already contains all the
    context each resolution needs, and the chunk-edge zeros reproduce the
    whole-track front/tail padding exactly (tests/test_multires.py).
    """
    from convsep_tpu.dsp.multires import _window as _mr_window, freq_interp_matrix

    t, tr = preset.transform, preset.train
    W, hop = t.frame_size, t.hop_size
    chans = []
    for size in t.multires:
        if size > W:
            raise ValueError(
                f"multires size {size} exceeds the main frame size {W}"
            )
        win2 = _mr_window(t.window, size)
        off = (W - size) // 2
        view = jax.lax.dynamic_slice_in_dim(
            audio_slice, off, (Fc - 1) * hop + size, axis=-1
        )
        frames2 = frame_signal(view, size, hop, Fc)  # (Fc, size)
        if t.fft_impl == "fft":
            mag2 = jnp.abs(jnp.fft.rfft(frames2 * jnp.asarray(win2, jnp.float32), n=size))
        elif _use_factored("auto", size):
            re2, im2 = _dft_frames_factored(
                frames2 * jnp.asarray(win2, jnp.float32),
                size,
                size // 2 + 1,
                jax.lax.Precision.HIGHEST,
            )
            mag2 = jnp.sqrt(re2 * re2 + im2 * im2)
        else:
            cos2, sin2 = _forward_mats(size, size, _key(win2))
            hp = dict(
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            re2 = jnp.matmul(frames2, jnp.asarray(cos2), **hp)
            im2 = jnp.matmul(frames2, jnp.asarray(sin2), **hp)
            mag2 = jnp.sqrt(re2 * re2 + im2 * im2)
        interp = jnp.asarray(freq_interp_matrix(size // 2 + 1, t.bins))
        chans.append(jnp.matmul(mag2, interp, preferred_element_type=jnp.float32))
    out = jnp.stack(chans, axis=-1)  # (Fc, bins, n_res)
    return scale_magnitude(out, t.iscale) * tr.mult_factor_in


@partial(jax.jit, static_argnames=("preset", "chunk_segments", "output_dtype", "conserve_last"), donate_argnums=(2,))
def separate_chunk(
    params,
    audio_slice: jnp.ndarray,
    spill: jnp.ndarray,
    inv_norm_slice: jnp.ndarray,
    preset: Preset,
    chunk_segments: int,
    output_dtype: str = "float32",
    extra: jnp.ndarray | None = None,
    conserve_last: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One chunk of the fused pipeline with OLA carry.

    audio_slice: (Fc*hop + W - hop,) padded-coordinate samples covering the
    chunk's Fc = chunk_segments * time_context frames (already includes the
    track's W//2 front pad — the host slices one padded buffer).
    spill: (S, W - hop) unnormalized OLA tail carried from the previous
    chunk (zeros for the first). inv_norm_slice: (Fc*hop,) reciprocal
    window-power normalization for this chunk's output span.
    extra: optional (Fc, F, C-1) score-informed channels for this chunk's
    frames (already scaled like the mixture input, SURVEY.md §3.4).

    → (stems_chunk (S, Fc*hop), new_spill (S, W - hop)).
    """
    t, m, tr = preset.transform, preset.model, preset.train
    W, hop, T = t.frame_size, t.hop_size, m.time_context
    Fc = T * chunk_segments
    nfft = t.nfft or W
    S = m.num_sources
    if audio_slice.dtype == jnp.int16:
        audio_slice = audio_slice.astype(jnp.float32) * (1.0 / 32768.0)
    win = _window(preset)
    frames = frame_signal(audio_slice, W, hop, Fc)  # (Fc, W)
    factored = _use_factored("auto", nfft) and nfft == W
    if t.fft_impl == "fft":
        spec = jnp.fft.rfft(frames * jnp.asarray(win, jnp.float32), n=nfft)
        re, im = jnp.real(spec), jnp.imag(spec)
    elif factored:
        # Cooley–Tukey two-pass DFT (dsp/dft.py): 16–32× fewer MACs and no
        # (W, bins) matrix constants in the chunk program at 2048+ points
        fw = frames * jnp.asarray(win, jnp.float32)
        re, im = _dft_frames_factored(
            fw, nfft, t.bins, jax.lax.Precision.HIGHEST
        )
    else:  # matmul-DFT path (dsp/dft.py conventions, incl. HIGHEST precision)
        cos_m, sin_m = _forward_mats(nfft, W, _key(win))
        re = jnp.matmul(
            frames, jnp.asarray(cos_m),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        im = jnp.matmul(
            frames, jnp.asarray(sin_m),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
    mag = scale_magnitude(jnp.sqrt(re * re + im * im), t.iscale) * tr.mult_factor_in
    x = mag.reshape(chunk_segments, T, m.feat_size)[..., None]
    if extra is None and t.multires:
        # multi-res conditioning computed in-program from the same slice
        extra = _multires_extra_chunk(audio_slice, preset, Fc)
    if extra is not None:
        x = jnp.concatenate(
            [x, extra.reshape(chunk_segments, T, m.feat_size, -1)], axis=-1
        )
    y = ConvSep(m).apply(params, x, method=ConvSep.sources)  # (cs, S, T, F)
    y_frames = y.transpose(1, 0, 2, 3).reshape(S, Fc, m.feat_size)
    from convsep_tpu.separate.pipeline import _score_gate

    y_frames = _score_gate(y_frames, extra, mag, preset, src_axis=0)
    mask = wiener_mask(
        y_frames, p=preset.sep.wiener_p, eps=preset.sep.wiener_eps, axis=0,
        conserve_last=conserve_last,
    )
    est_re, est_im = mask * re[None], mask * im[None]
    if t.fft_impl == "fft":
        fr = jnp.fft.irfft(est_re + 1j * est_im, n=nfft, axis=-1)[..., :W]
        fr = fr * jnp.asarray(win, jnp.float32)
    elif factored:
        from convsep_tpu.dsp.dft import _PRECISIONS

        fr = _idft_frames_factored(est_re, est_im, nfft, _PRECISIONS[t.dft_precision])
        fr = fr[..., :W] * jnp.asarray(win / float(nfft), jnp.float32)
    else:
        from convsep_tpu.dsp.dft import _PRECISIONS

        inv_a, inv_b = _inverse_mats(nfft, W, _key(win))
        rp = _PRECISIONS[t.dft_precision]  # resynthesis-side precision knob
        fr = jnp.matmul(
            est_re, jnp.asarray(inv_a),
            preferred_element_type=jnp.float32, precision=rp,
        ) + jnp.matmul(
            est_im, jnp.asarray(inv_b),
            preferred_element_type=jnp.float32, precision=rp,
        )
    ola = overlap_add(fr, hop)  # (S, Fc*hop + W - hop), unnormalized
    margin = W - hop
    head = ola[..., :margin] + spill
    out = jnp.concatenate([head, ola[..., margin : Fc * hop]], axis=-1)
    out = out * inv_norm_slice
    new_spill = ola[..., Fc * hop :]
    if output_dtype == "int16":
        from convsep_tpu.utils.pcm import quantize_pcm16

        out = quantize_pcm16(out)
    return out, new_spill


@partial(jax.jit, static_argnames=("preset", "chunk_segments", "output_dtype", "conserve_last"), donate_argnums=(2,))
def separate_chunk_stereo(
    params,
    audio_slice: jnp.ndarray,
    spill: jnp.ndarray,
    inv_norm_slice: jnp.ndarray,
    preset: Preset,
    chunk_segments: int,
    output_dtype: str = "float32",
    conserve_last: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stereo-native chunk: (2, Fc*hop + W - hop) slice + (S, 2, W - hop)
    spill → ((S, 2, Fc*hop) stems chunk, new spill). Same OLA-carry design
    as `separate_chunk` with the joint-channel model of separate/stereo.py.
    """
    t, m, tr = preset.transform, preset.model, preset.train
    if m.channels_in != 2 or m.decoder_reduce != "all":
        raise ValueError("separate_chunk_stereo needs a stereo preset")
    W, hop, T = t.frame_size, t.hop_size, m.time_context
    Fc = T * chunk_segments
    nfft = t.nfft or W
    S = m.num_sources
    if audio_slice.dtype == jnp.int16:
        audio_slice = audio_slice.astype(jnp.float32) * (1.0 / 32768.0)
    win = _window(preset)
    frames = frame_signal(audio_slice, W, hop, Fc)  # (2, Fc, W)
    factored = _use_factored("auto", nfft) and nfft == W
    if factored:
        re, im = _dft_frames_factored(
            frames * jnp.asarray(win, jnp.float32),
            nfft,
            t.bins,
            jax.lax.Precision.HIGHEST,
        )  # (2, Fc, bins)
    else:
        cos_m, sin_m = _forward_mats(nfft, W, _key(win))
        hp = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        re = jnp.matmul(frames, jnp.asarray(cos_m), **hp)  # (2, Fc, bins)
        im = jnp.matmul(frames, jnp.asarray(sin_m), **hp)
    mag = scale_magnitude(jnp.sqrt(re * re + im * im), t.iscale) * tr.mult_factor_in
    x = mag.reshape(2, chunk_segments, T, m.feat_size).transpose(1, 2, 3, 0)
    y = ConvSep(m).apply(params, x, method=ConvSep.sources)  # (cs, S, T, F, 2)
    y_frames = y.transpose(1, 4, 0, 2, 3).reshape(S, 2, Fc, m.feat_size)
    mask = wiener_mask(
        y_frames, p=preset.sep.wiener_p, eps=preset.sep.wiener_eps, axis=0,
        conserve_last=conserve_last,
    )
    from convsep_tpu.dsp.dft import _PRECISIONS

    if factored:
        fr = _idft_frames_factored(
            mask * re[None], mask * im[None], nfft, _PRECISIONS[t.dft_precision]
        )[..., :W] * jnp.asarray(win / float(nfft), jnp.float32)  # (S, 2, Fc, W)
    else:
        inv_a, inv_b = _inverse_mats(nfft, W, _key(win))
        rp = dict(preferred_element_type=jnp.float32, precision=_PRECISIONS[t.dft_precision])
        fr = jnp.matmul(mask * re[None], jnp.asarray(inv_a), **rp) + jnp.matmul(
            mask * im[None], jnp.asarray(inv_b), **rp
        )  # (S, 2, Fc, W)
    ola = overlap_add(fr, hop)
    margin = W - hop
    head = ola[..., :margin] + spill
    out = jnp.concatenate([head, ola[..., margin : Fc * hop]], axis=-1)
    out = out * inv_norm_slice
    new_spill = ola[..., Fc * hop :]
    if output_dtype == "int16":
        from convsep_tpu.utils.pcm import quantize_pcm16

        out = quantize_pcm16(out)
    return out, new_spill


def inv_norm_slice(
    preset: Preset, chunk_segments: int, i: int, nc: int, nf: int, cache: dict
) -> jnp.ndarray:
    """Device inv-norm slice for chunk i of nc (nf true frames).

    Middle chunks all see the steady-state periodic sequence; only the
    first (ramp-up) and last (tail) differ — three cached arrays cover any
    track length. Shared by ChunkedSeparator and OnlineSeparator so both
    paths use byte-identical normalization.
    """
    t = preset.transform
    W, hop = t.frame_size, t.hop_size
    Fc = preset.model.time_context * chunk_segments
    span = Fc * hop
    if i == 0 and nc == 1:
        key = ("only", nf)
    elif i == 0:
        key = "first"
    elif i == nc - 1:
        key = ("last", nf, nc)
    else:
        key = "mid"
    cached = cache.get(key)
    if cached is not None:
        return cached
    win = _window(preset)
    norm = ola_norm(win, win, hop, nf)  # ((nf-1)*hop + W,)
    total = nc * span
    if len(norm) < total:
        norm = np.concatenate([norm, np.ones(total - len(norm), np.float32)])
    inv = jnp.asarray(1.0 / norm[i * span : (i + 1) * span])
    if key in ("first", "mid") or len(cache) < 64:
        cache[key] = inv
    return inv


class ChunkedSeparator:
    """Stream ONE track through the fused program in chunks.

    >>> cs = ChunkedSeparator(preset, params)
    >>> stems = cs(audio)            # (num_sources, len(audio))

    Equality with the whole-track Separator is exact up to float
    reassociation (≤2e-5 — still under the 3e-5 PCM16 quantization step;
    the bf16 mask tail widened the old ≤1e-5 bound a hair); the win is
    pipelining — a track's uploads,
    compute, and stem downloads overlap each other, and the compiled chunk
    program is track-length independent (no per-length recompiles at all,
    unlike the bucketed whole-track program).
    """

    def __init__(
        self,
        preset: Preset,
        params,
        chunk_segments: int = 32,
        output_dtype: str = "float32",
        input_dtype: str = "float32",
        fetch_streams: int = 4,
        complement_last: bool = False,
        conserve_last: bool = False,
    ):
        t, m = preset.transform, preset.model
        self._stereo = m.decoder_reduce == "all"
        if self._stereo:
            if m.channels_in != 2 or t.multires:
                raise ValueError(f"unsupported stereo preset {preset.name!r}")
            self._n_extra = 0
        elif t.multires:
            # multi-res conditioning is computed inside the chunk program
            # from the same audio slice (all resolutions share the hop and
            # use smaller windows) — no host-side extras to slice
            if any(size > t.frame_size for size in t.multires):
                raise ValueError(
                    "chunked separation requires multires sizes <= the main "
                    f"frame size (got {t.multires} vs {t.frame_size})"
                )
            self._n_extra = 0
        else:
            # channels_in > 1 → score-informed preset: the caller supplies
            # (n_frames, F, channels_in-1) conditioning via `extra`
            self._n_extra = m.channels_in - 1
        if t.frame_size % t.hop_size != 0:
            raise ValueError("chunked separation requires W % hop == 0")
        if 4 * t.hop_size < t.frame_size:
            raise ValueError(
                "chunked separation requires hop >= W/4 (spill fits one seam)"
            )
        if output_dtype not in ("float32", "int16"):
            raise ValueError(f"output_dtype must be float32|int16, got {output_dtype}")
        if input_dtype not in ("float32", "int16"):
            raise ValueError(f"input_dtype must be float32|int16, got {input_dtype}")
        self.preset = preset
        # collapsed-encoder weights are composed ONCE here, not per
        # chunk dispatch (models/convsep.py::precompose_collapsed)
        from convsep_tpu.models.convsep import precompose_collapsed, prepare_inference

        self.params = prepare_inference(m, precompose_collapsed(params, m))
        self.chunk_segments = int(chunk_segments)
        self.output_dtype = output_dtype
        self.input_dtype = input_dtype
        # conserve_last: conservative Wiener masks on device — masks sum to
        # EXACTLY 1 (masks.py::wiener_mask conserve_last), so the stems sum
        # back to the (istft∘stft-roundtripped) mixture; the TF energy no
        # source claimed (ReLU-dead bins) goes to the LAST stem — the
        # classic "accompaniment = mixture − vocals" conservation.
        # complement_last (implies conserve_last): additionally SKIP the
        # last stem's device→host stream and derive it on the host as
        # mixture − Σ(other stems) — exact under conservative masks, up to
        # iSTFT-roundtrip float error (~1e-7) and, in int16 mode, the other
        # stems' round-to-nearest quantization (≤(S−1)/2 LSB before the
        # derived stem's own final rounding; utils/pcm.py). Cuts download
        # bytes by 1/S (1/2 for ikala-class presets) on transfer-bound links.
        if complement_last and m.num_sources < 2:
            # S=1 is degenerate (the "derived last stem" would be the
            # roundtripped mixture with zero fetched stems to subtract) and
            # np.stack([]) downstream would raise an opaque ValueError
            raise ValueError(
                "complement_last requires a preset with >= 2 sources "
                f"(got num_sources={m.num_sources})"
            )
        self.complement_last = bool(complement_last)
        self.conserve_last = bool(conserve_last or complement_last)
        self._pool = ThreadPoolExecutor(
            max_workers=fetch_streams, thread_name_prefix="convsep-chunk-fetch"
        )
        self._norm_cache: dict = {}

    # -- normalization slices ------------------------------------------------
    def _inv_norm_dev(self, i: int, nc: int, nf: int) -> jnp.ndarray:
        return inv_norm_slice(
            self.preset, self.chunk_segments, i, nc, nf, self._norm_cache
        )

    # -- complement-last stem derivation --------------------------------------
    def _derive_last(
        self, others: np.ndarray, padded: np.ndarray, i: int, span: int
    ) -> np.ndarray:
        """last stem for chunk i = mixture slice − Σ fetched stems (host).

        `others` is ((S−1)[, 2], span) in the output dtype; `padded` is the
        mixture in padded STFT coordinates (the chunk program's input), so
        the slice [i·span, (i+1)·span) aligns sample-for-sample with the
        emitted chunk."""
        from convsep_tpu.separate.complement import derive_last_stem

        return derive_last_stem(
            others,
            padded[..., i * span : i * span + span],
            self.input_dtype,
            self.output_dtype,
        )

    # -- streaming -----------------------------------------------------------
    def __call__(self, audio: np.ndarray, extra=None) -> np.ndarray:
        """mono (length,) mixture → (num_sources, length) stems; for stereo
        presets (2, length) or (length, 2) → (num_sources, length, 2) stems
        (StereoSeparator's wav-friendly layout).

        `extra`: (n_frames, F, channels_in-1) score-informed channels
        (required iff the preset has channels_in > 1); sliced per chunk and
        streamed alongside the audio chunks."""
        if self._n_extra == 0:
            if extra is not None:
                raise ValueError(
                    f"preset {self.preset.name!r} takes no extra channels"
                )
        elif extra is None:
            raise ValueError(
                f"preset {self.preset.name!r} needs (n_frames, F, "
                f"{self._n_extra}) extra score channels"
            )
        audio = np.asarray(audio)
        if self._stereo:
            if audio.ndim != 2:
                raise ValueError(f"expected stereo audio, got {audio.shape}")
            if audio.shape[1] == 2 and audio.shape[0] != 2:
                audio = audio.T  # (L, 2) wav layout → (2, L)
            elif audio.shape[0] != 2:
                raise ValueError(f"expected a 2-channel axis, got {audio.shape}")
        elif audio.ndim != 1:
            raise ValueError(f"expected mono (length,) audio, got {audio.shape}")
        t, m = self.preset.transform, self.preset.model
        W, hop, T = t.frame_size, t.hop_size, m.time_context
        S = m.num_sources
        Fc = T * self.chunk_segments
        L = int(audio.shape[-1])
        nf = num_frames(L, hop)
        nc = max(1, math.ceil(nf / Fc))
        if self.input_dtype == "int16":
            if audio.dtype != np.int16:
                from convsep_tpu.utils.pcm import quantize_pcm16_host

                audio = quantize_pcm16_host(audio)
            dt = np.int16
        else:
            audio = np.asarray(audio, np.float32)
            dt = np.float32
        # one padded buffer in STFT "padded coordinates": W//2 front zeros +
        # audio + zero tail out to the last chunk's framing margin
        lead = (2,) if self._stereo else ()
        padded = np.zeros(lead + (nc * Fc * hop + (W - hop),), dt)
        padded[..., W // 2 : W // 2 + L] = audio
        ex_padded = None
        if self._n_extra:
            extra = np.asarray(extra, np.float32)
            if extra.shape[1:] != (m.feat_size, self._n_extra):
                raise ValueError(
                    f"extra must be (n_frames, {m.feat_size}, {self._n_extra}),"
                    f" got {extra.shape}"
                )
            ex_padded = np.zeros((nc * Fc, m.feat_size, self._n_extra), np.float32)
            n = min(nf, extra.shape[0])
            ex_padded[:n] = extra[:n]

        spill_shape = (S, 2, W - hop) if self._stereo else (S, W - hop)
        spill = jnp.zeros(spill_shape, jnp.float32)
        chunk_fn = separate_chunk_stereo if self._stereo else separate_chunk
        futs = []
        span = Fc * hop
        for i in range(nc):
            dev = jnp.asarray(padded[..., i * span : i * span + span + (W - hop)])
            kw = {}
            if ex_padded is not None:
                kw["extra"] = jnp.asarray(ex_padded[i * Fc : (i + 1) * Fc])
            out, spill = chunk_fn(
                self.params,
                dev,
                spill,
                self._inv_norm_dev(i, nc, nf),
                self.preset,
                self.chunk_segments,
                self.output_dtype,
                conserve_last=self.conserve_last,
                **kw,
            )
            # fetch immediately on the pool: downloads of chunk i overlap
            # the (async-dispatched) compute of chunks > i
            n_fetch = S - 1 if self.complement_last else S
            futs.append(
                [self._pool.submit(np.asarray, out[s]) for s in range(n_fetch)]
            )
        parts = []
        for i, fs in enumerate(futs):
            got = np.stack([f.result() for f in fs], 0)
            if self.complement_last:
                got = np.concatenate(
                    [got, self._derive_last(got, padded, i, span)[None]], 0
                )
            parts.append(got)
        full = np.concatenate(parts, axis=-1)  # (S[, 2], nc*Fc*hop), padded coords
        full = full[..., W // 2 : W // 2 + L]
        return full.transpose(0, 2, 1) if self._stereo else full
