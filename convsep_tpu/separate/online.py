"""Push-based online separation: feed sample blocks, pop finished stems.

The reference's per-segment host loop (separate_dsd.py [U], SURVEY.md §3.3)
was the closest it had to an online mode — it still required the whole
track up front. This is the genuine live-streaming capability: arbitrary-
size sample blocks go in as they arrive (a capture callback, a socket, a
decoder), and separated stems come out with a fixed, known latency of
``latency_samples`` (one chunk span + one analysis window).

    >>> osep = OnlineSeparator(preset, params, chunk_segments=8)
    >>> for block in capture():          # any block sizes, any cadence
    ...     play(osep.push(block))       # (S, n_new) newly finished stems
    >>> play(osep.flush())               # drain the tail after end-of-stream

Design: the same compiled chunk program as `ChunkedSeparator` (one fused
frames→DFT→CNN→mask→iDFT→OLA dispatch per chunk, device-resident spill
carry across seams), driven by a rolling host buffer instead of a
pre-sliced track. A chunk is dispatched as soon as enough samples exist
that its output can no longer be affected by future pushes — the
window-power normalization for such a chunk is provably in steady state,
so the emitted samples are bit-identical to what `ChunkedSeparator` /
the whole-track `Separator` would produce for the completed track
(tests/test_online.py pins this for random push sizes).

Chunk latency is `chunk_segments * time_context * hop` samples (the span)
plus one window: dsd100's preset at chunk_segments=4 is ~0.72 s of audio —
set `chunk_segments` by the latency budget; throughput prefers it large.
"""

from __future__ import annotations

import math
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs.presets import Preset
from convsep_tpu.dsp.stft import num_frames
from convsep_tpu.separate.chunked import (
    inv_norm_slice,
    separate_chunk,
    separate_chunk_stereo,
)


class OnlineSeparator:
    """Streaming push/flush separation with bounded latency.

    push(samples) → (S, n_new) [stereo: (S, 2, n_new)] newly finished stem
    samples (often length 0 until a chunk boundary passes); flush() → the
    final tail. Concatenating every return value yields exactly the
    whole-track separation of the concatenated pushes.

    Score-informed presets (channels_in > 1, no multires) stream too: pass
    conditioning frames via push(samples, extra=...) — the aligned score is
    known ahead of playback, so the pusher computes channels for upcoming
    frames (data/features.py::score_channels) and feeds them at its own
    cadence; a chunk dispatches once both its samples and its frames are in.
    """

    def __init__(
        self,
        preset: Preset,
        params,
        chunk_segments: int = 8,
        output_dtype: str = "float32",
        input_dtype: str = "float32",
        fetch_streams: int = 4,
        complement_last: bool = False,
        conserve_last: bool = False,
        max_pending: int = 0,
    ):
        """`fetch_streams`/`max_pending`/`complement_last` (VERDICT r4 #4):
        the r4 online path fetched each chunk's stems synchronously inside
        push() — chunk k's download serialized against chunk k+1's compute,
        the exact overlap ChunkedSeparator already had. Stem fetches now
        ride a thread pool; `max_pending` chunks may stay in flight across
        push() calls (0 = emit synchronously, the strict-latency default —
        every finished chunk's stems return from the SAME push; k > 0 =
        serving mode: a chunk's emission may slide to a later push while
        its download overlaps the next chunk's compute, bounded by k
        chunks). `complement_last` (implies conserve_last) skips the last
        stem's download and derives it host-side as mixture − Σ others —
        (S−1)/S of the transfer bytes, same contract as ChunkedSeparator."""
        t, m = preset.transform, preset.model
        self._stereo = m.decoder_reduce == "all"
        self._n_extra = 0
        if self._stereo:
            if m.channels_in != 2 or t.multires:
                raise ValueError(f"unsupported stereo preset {preset.name!r}")
        elif t.multires:
            # multi-res channels are computed inside the chunk program from
            # the pushed audio itself (separate_chunk), so online streaming
            # needs no external conditioning source
            if any(size > t.frame_size for size in t.multires):
                raise ValueError(
                    "online separation requires multires sizes <= the main "
                    f"frame size (got {t.multires} vs {t.frame_size})"
                )
        elif m.channels_in != 1:
            # score-informed preset (VERDICT r2 #7): conditioning frames
            # arrive through push(extra=...) alongside the samples — the
            # aligned score is known ahead of playback, so the pusher can
            # compute channels for any frame range (score/masks.py)
            self._n_extra = m.channels_in - 1
        if t.frame_size % t.hop_size != 0:
            raise ValueError("online separation requires W % hop == 0")
        if 4 * t.hop_size < t.frame_size:
            raise ValueError(
                "online separation requires hop >= W/4 (spill fits one seam)"
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
        if complement_last and m.num_sources < 2:
            raise ValueError(
                "complement_last requires a preset with >= 2 sources "
                f"(got num_sources={m.num_sources})"
            )
        self.complement_last = bool(complement_last)
        self.conserve_last = bool(conserve_last or complement_last)
        self.max_pending = int(max_pending)
        self._pool = ThreadPoolExecutor(
            max_workers=int(fetch_streams), thread_name_prefix="convsep-online-fetch"
        )
        self._W, self._hop = t.frame_size, t.hop_size
        self._span = m.time_context * self.chunk_segments * t.hop_size
        self._norm_cache: dict = {}
        self.reset()

    # -- stream geometry -----------------------------------------------------
    @property
    def latency_samples(self) -> int:
        """Samples that must arrive past a chunk's start before that chunk's
        output is emitted (worst-case algorithmic latency)."""
        return self._span + self._W

    @property
    def chunk_samples(self) -> int:
        """Output granularity: stems are emitted `chunk_samples` at a time."""
        return self._span

    def reset(self) -> None:
        """Forget all stream state; the next push starts a new track."""
        S = self.preset.model.num_sources
        dt = np.int16 if self.input_dtype == "int16" else np.float32
        lead = (2,) if self._stereo else ()
        # rolling buffer in padded STFT coordinates: starts at the current
        # chunk's origin; chunk 0's origin includes the W//2 front pad
        self._buf = np.zeros(lead + (self._W // 2,), dt)
        self._chunk = 0  # next chunk index to dispatch
        self._pushed = 0  # true samples received
        spill_shape = (S, 2, self._W - self._hop) if self._stereo else (S, self._W - self._hop)
        self._spill = jnp.zeros(spill_shape, jnp.float32)
        self._exbuf = np.zeros(
            (0, self.preset.model.feat_size, self._n_extra), np.float32
        )
        self._pending: deque = deque()  # (chunk_idx, [stem futures], mix_slice)
        self._finished = False

    # -- internals -----------------------------------------------------------
    def _append(self, samples: np.ndarray) -> None:
        samples = np.asarray(samples)
        if self._stereo:
            if samples.ndim != 2 or samples.shape[0] != 2:
                raise ValueError(f"stereo push must be (2, n), got {samples.shape}")
        elif samples.ndim != 1:
            raise ValueError(f"mono push must be (n,), got {samples.shape}")
        if self.input_dtype == "int16":
            if samples.dtype != np.int16:
                from convsep_tpu.utils.pcm import quantize_pcm16_host

                samples = quantize_pcm16_host(samples)
        else:
            samples = np.asarray(samples, np.float32)
        self._pushed += samples.shape[-1]
        self._buf = np.concatenate([self._buf, samples], axis=-1)

    def _dispatch(self, norm: jnp.ndarray) -> None:
        """Dispatch the chunk program on the buffer's first span (ASYNC —
        XLA returns immediately), submit its stem downloads to the fetch
        pool, queue the pending entry, and advance the stream."""
        W, hop, span = self._W, self._hop, self._span
        dev = jnp.asarray(self._buf[..., : span + (W - hop)])
        chunk_fn = separate_chunk_stereo if self._stereo else separate_chunk
        kw = {}
        if self._n_extra:
            Fc = span // hop
            kw["extra"] = jnp.asarray(self._exbuf[:Fc])
            self._exbuf = self._exbuf[Fc:]
        out, self._spill = chunk_fn(
            self.params,
            dev,
            self._spill,
            norm,
            self.preset,
            self.chunk_segments,
            self.output_dtype,
            conserve_last=self.conserve_last,
            **kw,
        )
        S = self.preset.model.num_sources
        n_fetch = S - 1 if self.complement_last else S
        futs = [self._pool.submit(np.asarray, out[s]) for s in range(n_fetch)]
        # host copy of the mixture span for complement derivation (padded
        # coords, aligned sample-for-sample with the chunk's stems)
        mix = self._buf[..., :span].copy() if self.complement_last else None
        self._pending.append((self._chunk, futs, mix))
        self._buf = self._buf[..., span:]
        self._chunk += 1

    def _gather_oldest(self) -> np.ndarray:
        """Resolve the oldest in-flight chunk → (S[, 2], n) host samples."""
        idx, futs, mix = self._pending.popleft()
        got = np.stack([f.result() for f in futs], 0)
        if self.complement_last:
            from convsep_tpu.separate.complement import derive_last_stem

            last = derive_last_stem(
                got, mix, self.input_dtype, self.output_dtype
            )
            got = np.concatenate([got, last[None]], 0)
        if idx == 0:  # drop the W//2 front pad from the first chunk
            got = got[..., self._W // 2 :]
        return got

    def _drain(self, keep: int) -> list:
        """Gather pending chunks (oldest first) until ≤ `keep` in flight."""
        outs = []
        while len(self._pending) > keep:
            outs.append(self._gather_oldest())
        return outs

    def _steady_norm(self, i: int) -> jnp.ndarray:
        # a synthetic frame count ≥ two chunks past i puts both the head
        # ramp and the (absent) tail ramp outside chunk i's norm slice, so
        # the slice equals the final track's for ANY eventual length
        Fc = self._span // self._hop
        nf_big = (i + 2) * Fc + 2 * (self._W // self._hop) + 4
        return inv_norm_slice(
            self.preset, self.chunk_segments, i, i + 2, nf_big, self._norm_cache
        )

    def _empty(self) -> np.ndarray:
        S = self.preset.model.num_sources
        dt = np.int16 if self.output_dtype == "int16" else np.float32
        shape = (S, 2, 0) if self._stereo else (S, 0)
        return np.zeros(shape, dt)

    # -- public API ----------------------------------------------------------
    def push(self, samples: np.ndarray, extra: np.ndarray | None = None) -> np.ndarray:
        """Feed a block; return stems finished by it ((S[, 2], n_new)).

        `extra`: score-informed presets only — (k, F, channels_in-1)
        conditioning frames for the NEXT k analysis frames of the stream,
        at the same scaling as the chunked/whole-track paths (pushed at
        the caller's cadence; a chunk dispatches once both its samples and
        its frames have arrived)."""
        if self._finished:
            raise RuntimeError("flush() already called; reset() to start a new track")
        if extra is not None:
            if not self._n_extra:
                raise ValueError(
                    f"preset {self.preset.name!r} takes no extra channels"
                )
            extra = np.asarray(extra, np.float32)
            F = self.preset.model.feat_size
            if extra.ndim != 3 or extra.shape[1:] != (F, self._n_extra):
                raise ValueError(
                    f"extra must be (k, {F}, {self._n_extra}), got {extra.shape}"
                )
            self._exbuf = np.concatenate([self._exbuf, extra], axis=0)
        self._append(samples)
        outs = []
        # dispatch every chunk that future pushes can no longer affect:
        # its audio slice is complete AND its norm is past ramp-up with at
        # least one more chunk guaranteed to follow (so it can't be "last");
        # score-informed streams additionally need the chunk's conditioning
        # frames to have arrived
        Fc = self._span // self._hop
        # dispatch FIRST (async — every ready chunk's compute is in flight
        # before any download blocks), then drain to the pending bound:
        # max_pending=0 keeps the strict contract (a finished chunk's stems
        # return from the same push); >0 overlaps chunk k's download with
        # chunk k+1's compute across pushes (VERDICT r4 #4)
        while self._buf.shape[-1] >= self._span + self._W and (
            not self._n_extra or self._exbuf.shape[0] >= Fc
        ):
            self._dispatch(self._steady_norm(self._chunk))
        outs = self._drain(self.max_pending)
        return np.concatenate(outs, axis=-1) if outs else self._empty()

    def flush(self) -> np.ndarray:
        """End of stream: separate the remaining tail and return it."""
        if self._finished:
            raise RuntimeError("flush() already called")
        self._finished = True
        L = self._pushed
        hop, W, span = self._hop, self._W, self._span
        Fc = span // hop
        nf = num_frames(L, hop)
        nc = max(1, math.ceil(nf / Fc))
        done = self._chunk
        if done >= nc:  # pathological: stream ended exactly on emitted chunks
            outs = self._drain(0)
            if not outs:
                return self._empty()
            emitted = max(0, (done - len(outs)) * span - W // 2)
            tail = np.concatenate(outs, axis=-1)
            return tail[..., : max(0, L - emitted)]
        # zero-pad the buffer out to the remaining chunks' framing margin
        need = (nc - done) * span + (W - hop)
        pad = need - self._buf.shape[-1]
        if pad > 0:
            z = np.zeros(self._buf.shape[:-1] + (pad,), self._buf.dtype)
            self._buf = np.concatenate([self._buf, z], axis=-1)
        if self._n_extra:
            # missing tail conditioning frames are zeros — matching
            # ChunkedSeparator's zero-padded ex_padded for short extras
            Fc_ = span // hop
            need_f = (nc - done) * Fc_
            if self._exbuf.shape[0] < need_f:
                z = np.zeros(
                    (need_f - self._exbuf.shape[0],) + self._exbuf.shape[1:],
                    np.float32,
                )
                self._exbuf = np.concatenate([self._exbuf, z], axis=0)
        already = done - len(self._pending)  # chunks actually RETURNED
        for i in range(done, nc):
            norm = inv_norm_slice(
                self.preset, self.chunk_segments, i, nc, nf, self._norm_cache
            )
            self._dispatch(norm)
        tail = np.concatenate(self._drain(0), axis=-1)
        emitted = max(0, already * span - W // 2)  # true samples already returned
        return tail[..., : L - emitted]
