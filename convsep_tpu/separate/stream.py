"""Batched multi-track streaming separation, sharded over the mesh.

BASELINE.json config #4: many tracks at once through the fused
STFT→CNN→mask→iSTFT program. Tracks are bucketed to one length, stacked on
a leading batch axis, and the batch axis is sharded over the mesh's `data`
axis — each chip separates its tracks locally; no cross-chip traffic at
all (embarrassingly parallel), so throughput scales linearly over ICI-
connected chips. The host side overlaps prefetch (device_put of the next
batch) with device compute.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs.presets import Preset
from convsep_tpu.distributed.mesh import batch_sharding, replicated
from convsep_tpu.separate.pipeline import bucket_length, separate_fused


def separate_batch(
    params,
    tracks: jnp.ndarray,
    preset: Preset,
    length: int,
    apply_fn=None,
    output_dtype: str = "float32",
    extra: jnp.ndarray | None = None,
    conserve_last: bool = False,
) -> jnp.ndarray:
    """(B, length) mixtures → (B, S, length) stems; one XLA program.

    Dispatches to :func:`separate_fused_batch` (native batch axis — no
    vmap batching rule, no vmap-driven layout transposes; see its
    docstring for the trace that motivated it). fft_impl="pallas" presets
    take the vmapped path (:func:`separate_batch_vmap`), whose kernels
    assume single-track shapes.

    `extra`: score-informed channels — (B, n_frames, F, C-1) per-track, or
    (n_frames, F, C-1) broadcast to every track.
    `conserve_last`: conservative Wiener masks (Σ masks = 1) so the caller
    may complement-fetch the last stem host-side (separate/complement.py).
    """
    from convsep_tpu.separate.pipeline import separate_fused_batch

    if preset.transform.fft_impl == "pallas":
        return separate_batch_vmap(
            params, tracks, preset, length, apply_fn, output_dtype, extra,
            conserve_last,
        )
    return separate_fused_batch(
        params, tracks, extra, preset, length, apply_fn, output_dtype,
        conserve_last,
    )


@partial(jax.jit, static_argnames=("preset", "length", "apply_fn", "output_dtype", "conserve_last"))
def separate_batch_vmap(
    params,
    tracks: jnp.ndarray,
    preset: Preset,
    length: int,
    apply_fn=None,
    output_dtype: str = "float32",
    extra: jnp.ndarray | None = None,
    conserve_last: bool = False,
) -> jnp.ndarray:
    """vmap-of-single-track variant of :func:`separate_batch` — kept for
    fft_impl="pallas" presets and as the A/B reference for the native-batch
    path.

    `extra` MUST be passed as a traced argument (composed-encoder weights
    hoisted out of the vmap) rather than closed over in a hand-rolled
    vmap: a closed-over concrete array becomes a ~40 MB HLO literal AND
    the collapsed-encoder composition replicates under the vmap — the
    bach10 vmap8 program ground the remote compile server to a broken pipe
    twice that way (2026-08-17/18).
    """
    from convsep_tpu.models.convsep import precompose_collapsed

    params = precompose_collapsed(params, preset.model)
    single = lambda a, ex: separate_fused(  # noqa: E731
        params, a, ex, preset, length, apply_fn, output_dtype, conserve_last
    )
    if extra is None:
        return jax.vmap(lambda a: single(a, None))(tracks)
    ex_axis = None if extra.ndim == 3 else 0
    return jax.vmap(single, in_axes=(0, ex_axis))(tracks, extra)


@partial(jax.jit, static_argnames=("preset", "length", "apply_fn", "output_dtype", "group", "conserve_last"))
def separate_batch_scan(
    params,
    tracks: jnp.ndarray,
    preset: Preset,
    length: int,
    apply_fn=None,
    output_dtype: str = "float32",
    group: int | None = None,
    extra: jnp.ndarray | None = None,
    conserve_last: bool = False,
) -> jnp.ndarray:
    """(B, length) → (B, S, length) like separate_batch, but tracks run
    in GROUPS of `group` sequentially inside one dispatch (`lax.map` of a
    vmapped group body).

    Near-single-track working-set memory (the full-vmap variant's peak
    scales with B — B=32 OOMs a v5e) and the loop body compiles once, so
    compile time stays near single-track cost. `group` > 1 was built to
    amortize the expansion GEMM's weight streaming over several tracks,
    but measured SLOWER on the v5e (dsd100 scan64 bandconv: group=1
    3.47 ms/track, group=2 3.60, group=4 3.91, 2026-08-17 — the vmapped
    body's ×k intermediates cost more bandwidth than the re-read weights),
    so the default stays 1; the knob is kept for topologies with slower
    HBM-resident weight reuse. Prefer this on one chip; use
    `separate_batch` (vmap) when the batch axis is sharded over a mesh.

    The collapsed-encoder composition is precomposed HERE, outside the
    `lax.map` body — XLA does not hoist it out of the while loop
    (models/convsep.py::precompose_collapsed).
    """
    from convsep_tpu.models.convsep import precompose_collapsed

    params = precompose_collapsed(params, preset.model)
    B = tracks.shape[0]
    if group is None:
        group = 1
    if extra is not None:
        # score-informed tracks: loop body closes over the TRACED extra
        # (shared, ndim 3) or maps over per-track channels (ndim 4);
        # grouping is not worth a third compiled shape here (group=1 wins
        # on the v5e anyway — see the decision record above)
        fused = lambda a, ex: separate_fused(  # noqa: E731
            params, a, ex, preset, length, apply_fn, output_dtype, conserve_last
        )
        if extra.ndim == 3:
            return jax.lax.map(lambda a: fused(a, extra), tracks)
        return jax.lax.map(lambda ae: fused(*ae), (tracks, extra))
    single = lambda a: separate_fused(  # noqa: E731
        params, a, None, preset, length, apply_fn, output_dtype, conserve_last
    )
    if group == 1 or B % group:
        return jax.lax.map(single, tracks)
    grouped = tracks.reshape(B // group, group, tracks.shape[-1])
    out = jax.lax.map(jax.vmap(single), grouped)
    return out.reshape(B, *out.shape[2:])



@partial(jax.jit, static_argnames=("preset", "length", "output_dtype", "conserve_last"))
def separate_batch_scan_stereo(
    params,
    tracks: jnp.ndarray,
    preset: Preset,
    length: int,
    output_dtype: str = "float32",
    conserve_last: bool = False,
) -> jnp.ndarray:
    """(B, 2, length) → (B, S, 2, length) with tracks run sequentially in
    one dispatch (`lax.map`) — the stereo analog of `separate_batch_scan`:
    single-track working-set memory, loop body compiled once."""
    from convsep_tpu.models.convsep import precompose_collapsed
    from convsep_tpu.separate.stereo import separate_fused_stereo

    params = precompose_collapsed(params, preset.model)
    return jax.lax.map(
        lambda a: separate_fused_stereo(
            params, a, preset, length, output_dtype, conserve_last
        ),
        tracks,
    )


@partial(jax.jit, static_argnames=("preset", "length", "output_dtype", "conserve_last"))
def separate_batch_stereo(
    params,
    tracks: jnp.ndarray,
    preset: Preset,
    length: int,
    output_dtype: str = "float32",
    conserve_last: bool = False,
) -> jnp.ndarray:
    """(B, 2, length) stereo mixtures → (B, S, 2, length); one XLA program.

    vmap of the fused joint-channel program (separate/stereo.py) — with the
    batch sharded over the mesh every stage partitions, as in the mono path.
    """
    from convsep_tpu.models.convsep import precompose_collapsed
    from convsep_tpu.separate.stereo import separate_fused_stereo

    params = precompose_collapsed(params, preset.model)
    return jax.vmap(
        lambda a: separate_fused_stereo(
            params, a, preset, length, output_dtype, conserve_last
        )
    )(tracks)


class StreamSeparator:
    """Stream many tracks through mesh-sharded fused separation.

    >>> ss = StreamSeparator(preset, params, mesh=make_mesh())
    >>> for stems_batch in ss.stream(track_iterator, batch_size=8): ...
    """

    def __init__(
        self,
        preset: Preset,
        params,
        mesh=None,
        apply_fn=None,
        output_dtype: str = "float32",
        input_dtype: str = "float32",
        conserve_last: bool = False,
        complement_last: bool = False,
    ):
        if apply_fn is None:
            from convsep_tpu.models.convsep import prepare_inference

            params = prepare_inference(preset.model, params)
        self.preset = preset
        self.mesh = mesh
        if apply_fn is not None and preset.model.decoder_reduce == "all":
            # the stereo path routes through separate_fused_stereo, which has
            # no apply override — failing loud beats silently dropping it
            raise ValueError("apply_fn overrides are not supported by stereo presets")
        self.apply_fn = apply_fn
        self.output_dtype = output_dtype
        self.input_dtype = input_dtype
        # complement_last (implies conserve_last): skip the last stem's
        # device→host stream and derive it host-side as mixture − Σ others
        # (separate/complement.py) — (S−1)/S of the plain download bytes.
        # Wired here in r4 (VERDICT r3 #4: previously chunked-only).
        if complement_last and preset.model.num_sources < 2:
            raise ValueError(
                "complement_last requires a preset with >= 2 sources "
                f"(got num_sources={preset.model.num_sources})"
            )
        if (complement_last or conserve_last) and preset.transform.fft_impl == "pallas":
            raise ValueError("conserve_last is not supported by the pallas mask kernel")
        self.complement_last = bool(complement_last)
        self.conserve_last = bool(conserve_last or complement_last)
        if mesh is not None:
            params = jax.device_put(params, replicated(mesh))
        self.params = params

    @property
    def _stereo(self) -> bool:
        # joint-channel presets take (2, L) tracks and yield (S, 2, L) stems
        return self.preset.model.decoder_reduce == "all"

    def _bucket(self, batch: Sequence[np.ndarray]) -> tuple[np.ndarray, list[int]]:
        lengths = [t.shape[-1] for t in batch]
        Lb = bucket_length(max(lengths), self.preset)
        n = len(batch)
        if self.mesh is not None:  # batch axis must divide the batch mesh axes
            d = self.mesh.shape["data"] * self.mesh.shape.get("dcn", 1)
            n = -(-n // d) * d
        dt = np.int16 if self.input_dtype == "int16" else np.float32
        shape = (n, 2, Lb) if self._stereo else (n, Lb)
        stacked = np.zeros(shape, dt)
        for i, t in enumerate(batch):
            if self._stereo and t.ndim != 2:
                raise ValueError(f"stereo preset expects (2, L) tracks, got {t.shape}")
            if dt == np.int16 and t.dtype != np.int16:
                from convsep_tpu.utils.pcm import quantize_pcm16_host

                t = quantize_pcm16_host(t)
            stacked[i, ..., : t.shape[-1]] = t
        return stacked, lengths

    def _batch_fn(self):
        # vmap partitions across a sharded mesh batch axis; on one device
        # lax.map wins (single-track memory, body compiled once) — EXCEPT
        # for 2048+-point presets, where XLA's loop pass takes ~42 min to
        # compile the body (vs ~2 min unrolled vmap; bach10 vmap8 measured
        # 1481× — 2026-08-18) and the per-track working set is small enough
        # to vmap
        cl = self.conserve_last
        if self._stereo:
            return lambda params, dev, preset, length, apply_fn, output_dtype, extra=None: (
                separate_batch_stereo(params, dev, preset, length, output_dtype, cl)
            )
        if self.mesh is not None or self.preset.transform.frame_size >= 2048:
            return lambda params, dev, preset, length, apply_fn, output_dtype, extra=None: (
                separate_batch(
                    params, dev, preset, length, apply_fn, output_dtype, extra, cl
                )
            )
        return lambda params, dev, preset, length, apply_fn, output_dtype, extra=None: (
            separate_batch_scan(
                params, dev, preset, length, apply_fn, output_dtype, extra=extra,
                conserve_last=cl,
            )
        )

    def _bucket_extras(
        self, extras: Sequence[np.ndarray], n: int, Lb: int
    ) -> np.ndarray:
        """Per-track score channels → (n, nf(Lb), F, C-1), frame-padded."""
        if self._stereo:
            raise ValueError("score-informed extras are mono-preset only")
        from convsep_tpu.dsp.stft import num_frames

        nf = num_frames(Lb, self.preset.transform.hop_size)
        first = np.asarray(extras[0], np.float32)
        out = np.zeros((n, nf, *first.shape[1:]), np.float32)
        for i, e in enumerate(extras):
            e = np.asarray(e, np.float32)[:nf]
            out[i, : e.shape[0]] = e
        return out

    def _fetch_stems(self, out_dev, stacked: np.ndarray) -> np.ndarray:
        """Device stems batch → host ((B, S[, 2], L)); with complement_last
        the last stem never crosses the link — it is derived host-side per
        track from the bucketed mixture (separate/complement.py)."""
        from convsep_tpu.utils.transfer import fetch_parallel

        S = self.preset.model.num_sources
        if not self.complement_last:
            # (B, S, L) → fetch B*S stems concurrently (per-RPC-stream
            # limited link); device-side reshape is free
            flat = fetch_parallel(out_dev.reshape(-1, out_dev.shape[-1]))
            return flat.reshape(out_dev.shape)
        from convsep_tpu.separate.complement import derive_last_stem

        others_dev = out_dev[:, : S - 1]
        flat = fetch_parallel(others_dev.reshape(-1, others_dev.shape[-1]))
        others = flat.reshape(others_dev.shape)  # (B, S-1[, 2], L)
        last = np.stack(
            [
                derive_last_stem(
                    others[i], stacked[i], self.input_dtype, self.output_dtype
                )
                for i in range(others.shape[0])
            ]
        )
        return np.concatenate([others, last[:, None]], axis=1)

    def separate_many(
        self,
        tracks: Sequence[np.ndarray],
        extras: Sequence[np.ndarray] | None = None,
    ) -> list[np.ndarray]:
        """Separate a list of mono tracks → list of (S, len_i) stems.

        `extras`: optional per-track score-informed channels, one
        (n_frames_i, F, C-1) array per track (same scaling as the
        Separator path: already × mult_factor_in)."""
        stacked, lengths = self._bucket(tracks)
        sharding = (
            batch_sharding(self.mesh, stacked.ndim) if self.mesh is not None else None
        )
        dev = jax.device_put(jnp.asarray(stacked), sharding)
        extra = None
        if extras is not None:
            if len(extras) != len(tracks):
                raise ValueError(f"{len(extras)} extras for {len(tracks)} tracks")
            ex = self._bucket_extras(extras, stacked.shape[0], stacked.shape[-1])
            extra = jax.device_put(
                jnp.asarray(ex),
                batch_sharding(self.mesh, ex.ndim) if self.mesh is not None else None,
            )
        out_dev = self._batch_fn()(
            self.params, dev, self.preset, stacked.shape[-1], self.apply_fn,
            self.output_dtype, extra,
        )
        out = self._fetch_stems(out_dev, stacked)
        return [out[i, ..., : lengths[i]] for i in range(len(tracks))]

    def stream(
        self,
        tracks: Iterator[np.ndarray],
        batch_size: int,
        extras: Iterator[np.ndarray] | None = None,
    ) -> Iterator[list[np.ndarray]]:
        """Batched streaming with host→device prefetch overlap.

        `extras`: optional iterator of per-track score channels, parallel
        to `tracks` (see separate_many)."""
        in_ndim = 3 if self._stereo else 2
        sharding = (
            batch_sharding(self.mesh, in_ndim) if self.mesh is not None else None
        )
        ex_sharding = (
            batch_sharding(self.mesh, 4) if self.mesh is not None else None
        )

        def batches():
            buf, exbuf = [], []
            src = zip(tracks, extras) if extras is not None else ((t, None) for t in tracks)
            for t, e in src:
                # keep int16 as-is: _bucket would re-quantize a float32 copy
                # of PCM16 VALUES (×32768 → saturation); float conversion is
                # only for float-ish inputs
                t = np.asarray(t)
                buf.append(t if t.dtype == np.int16 else np.asarray(t, np.float32))
                exbuf.append(e)
                if len(buf) == batch_size:
                    yield self._bucket(buf), exbuf
                    buf, exbuf = [], []
            if buf:
                yield self._bucket(buf), exbuf

        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=2)
        _END = object()

        def producer():
            try:
                for (stacked, lengths), exbuf in batches():
                    extra = None
                    if exbuf and exbuf[0] is not None:
                        ex = self._bucket_extras(
                            exbuf, stacked.shape[0], stacked.shape[-1]
                        )
                        extra = jax.device_put(jnp.asarray(ex), ex_sharding)
                    q.put((jax.device_put(jnp.asarray(stacked), sharding),
                           lengths, extra, stacked))
                q.put(_END)
            except Exception as e:
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        # dispatch batch k+1 BEFORE fetching batch k's stems: jax dispatch
        # is async, so the k+1 compute runs under k's device→host transfer
        # (on tunneled links the transfer dominates — VERDICT r1 #8)
        def _fetch(prev_out, prev_lengths, prev_stacked):
            prev = self._fetch_stems(prev_out, prev_stacked)
            return [prev[i, ..., : prev_lengths[i]] for i in range(len(prev_lengths))]

        pending: tuple | None = None
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, Exception):
                raise item
            dev, lengths, extra, stacked = item
            out_dev = self._batch_fn()(
                self.params, dev, self.preset, dev.shape[-1], self.apply_fn,
                self.output_dtype, extra,
            )
            if pending is not None:
                yield _fetch(*pending)
            pending = (out_dev, lengths, stacked)
        if pending is not None:
            yield _fetch(*pending)
