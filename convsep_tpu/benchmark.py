"""Benchmark harness: RTF (audio-seconds separated per wall-second per chip).

Headline (BASELINE.md): full-track 4-stem DSD100-config separation through
the fused STFT→CNN→mask→iSTFT program, target >100× real time per chip.

Two RTFs are reported from ONE compiled program:

* **device RTF** (the headline `value`): wall time of the fused program
  measured with a tiny-slice fetch as the barrier — the HBM-resident
  pipeline of the north star. (`block_until_ready` is a no-op on tunneled
  runtimes, so a dependent fetch is the only sound barrier; the tiny fetch
  adds one RPC ≈ constant.)
* **e2e RTF**: includes host→device upload of the mixture and PCM16
  device→host download of the stems. On this sandbox the tunnel moves
  ~27 MB/s, so e2e here is transfer-bound, not framework-bound (a
  production host PCIe link is ~400× faster); reported in `detail`.
"""

from __future__ import annotations

import sys
import time


def _progress(msg: str) -> None:
    """Stage timestamps on stderr (the JSON contract owns stdout)."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _retry(fn, attempts: int = 3, sleep_s: float = 20.0):
    """Retry a compile+warm thunk through transient remote-compile-server
    failures ('response body closed before all bytes were read' killed the
    whole r3 bench once; the identical request succeeded on retry). Only
    used around compile phases — never around timed measurement loops."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — jax wraps RPC errors variously
            if i == attempts - 1:
                raise
            _progress(f"compile attempt {i + 1} failed ({type(e).__name__}); retrying")
            time.sleep(sleep_s)


def link_probe(mb: float = 8.0) -> dict:
    """Measure the host↔device link IN-RUN (VERDICT r2 #2): tunnel-day
    variance becomes data instead of an excuse. Returns MB/s for upload,
    single-stream download, and 4-stream parallel download (the stem-fetch
    configuration). Uses random float32 payloads (incompressible, in case
    the transport compresses) and a dependent tiny fetch as the upload
    barrier — the same barrier discipline as the RTF sections."""
    import numpy as _np

    n = int(mb * 1e6 / 4)
    host = _np.random.default_rng(0).random(n).astype(_np.float32)
    dev = jnp.asarray(host)
    _np.asarray(dev[:8])  # warm the transfer path + any layout setup
    t0 = time.perf_counter()
    dev = jnp.asarray(host + _np.float32(1.0))
    _np.asarray(dev[:8])
    up = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = _np.asarray(dev)
    down = time.perf_counter() - t0
    dev4 = dev.reshape(4, -1)
    _np.asarray(dev4[0, :8])
    t0 = time.perf_counter()
    _ = fetch_parallel(dev4)
    down4 = time.perf_counter() - t0
    return {
        "payload_mb": mb,
        "up_mb_s": round(mb / up, 1),
        "down_mb_s": round(mb / down, 1),
        "down4_mb_s": round(mb / down4, 1),
    }


import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs import get_preset
from convsep_tpu.utils.flops import mfu as compute_mfu
from convsep_tpu.utils.transfer import fetch_parallel
from convsep_tpu.data.synth import sine_mixture
from convsep_tpu.models.convsep import ConvSep
from convsep_tpu.separate.pipeline import bucket_length, separate_fused


def preset_matrix(
    preset_names: tuple[str, ...] = (
        "ikala",
        "highres4096",
        "multires4096",
        "bach10",
        "ikala-stereo",
    ),
    seconds: float = 30.0,
    batch: int = 8,
    seed: int = 0,
    time_budget_s: float = 1500.0,
) -> dict:
    """Batched-scan RTF per preset (VERDICT r1 #9: the driver's BENCH must
    carry the whole preset matrix, not just dsd100).

    One compiled single-track fused program per preset; sustained RTF is
    measured by async-dispatching `batch` tracks and fetching one barrier
    slice per output (dispatch overhead overlaps compute, as in production
    streaming). A `lax.map` wrapper is deliberately NOT used here: XLA's
    loop pass takes ~42 min to compile the 4096-pt body on this backend
    (vs 134 s unwrapped — measured 2026-08-16), while pipelined dispatch
    measures the same device throughput from the already-compiled program.
    Score-informed presets (bach10) get zero-valued extra channels — the
    conditioning content doesn't change the op schedule, so the RTF is
    representative. Presets that would start after `time_budget_s` of
    total bench wall time are recorded as skipped instead of risking a
    driver timeout (warm-cache reruns fit the budget easily).
    """
    from convsep_tpu.dsp import num_frames

    out: dict[str, object] = {}
    for name in preset_names:
        if time.monotonic() - _T0 > time_budget_s:
            out[name] = "skipped: bench time budget (cold compile); rerun is warm"
            continue
        _progress(f"matrix: {name}")
        preset = get_preset(name)
        cfg = preset.model
        params = ConvSep(cfg).init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
        )
        fs = preset.transform.fs
        L = int(seconds * fs)
        _, mix = sine_mixture(cfg.num_sources, L, fs=fs, seed=seed)
        Lb = bucket_length(L, preset)
        audio_sec = Lb / fs
        host = np.pad(mix, (0, Lb - L)).astype(np.float32)
        stereo = cfg.decoder_reduce == "all"
        if stereo:  # joint-channel preset: (2, L) input, one program per ear pair
            host = np.stack([host, 0.5 * host])
        tracks = [jnp.asarray(host + np.float32(i) * 1e-6) for i in range(batch)]
        # extra channels the transform does NOT synthesize itself
        # (multires presets compute theirs in-program from the audio)
        n_extra = 0 if stereo else cfg.channels_in - 1 - len(preset.transform.multires)
        extra = None
        if n_extra > 0:
            nf = num_frames(Lb, preset.transform.hop_size)
            extra = jnp.zeros((nf, cfg.feat_size, n_extra), jnp.float32)

        if stereo:
            from convsep_tpu.separate.stereo import separate_fused_stereo

            def fused(a, params=params, preset=preset, Lb=Lb):
                return separate_fused_stereo(params, a, preset, Lb, "int16")

        else:

            def fused(a, params=params, extra=extra, preset=preset, Lb=Lb):
                return separate_fused(params, a, extra, preset, Lb, None, "int16")

        try:
            outs = [fused(a) for a in tracks]  # compile + warm the queue path
            _ = [np.asarray(o[..., :8]) for o in outs]
            t0 = time.perf_counter()
            outs = [fused(a) for a in tracks]
            _ = [np.asarray(o[..., :8]) for o in outs]
            per_track = (time.perf_counter() - t0) / batch
            best = per_track
            out[name] = {
                "rtf_pipelined": round(audio_sec / per_track, 2),
                "per_track_s": round(per_track, 4),
                "n_stems": cfg.num_sources,
                "channels_in": cfg.channels_in,
                "frame_size": preset.transform.frame_size,
                # achieved TFLOP/s + fraction of bf16 peak at this per-track
                # time (VERDICT r1 #4: every preset row carries tflops+mfu)
                **compute_mfu(preset, Lb, per_track, jax.devices()[0].device_kind),
            }
        except Exception as e:  # record, don't kill the headline bench
            out[name] = f"failed: {type(e).__name__}: {e}"
            continue
        del outs  # 16 live (S, L) outputs would squat HBM under the vmap run
        # batched single-dispatch (vmap): compiles in minutes where lax.map's
        # loop pass takes ~42 min on 4096-pt bodies; measured 902x vs 542x
        # pipelined for highres4096 (2026-08-17). Score-informed presets
        # (bach10) vmap the fused program over tracks with the conditioning
        # channels shared — the op schedule is the same as per-track extras.
        if time.monotonic() - _T0 <= time_budget_s:
            from convsep_tpu.separate.stream import (
                separate_batch,
                separate_batch_stereo,
            )

            try:
                stacked = jnp.stack(tracks)
                if stereo:
                    fb = lambda b: separate_batch_stereo(params, b, preset, Lb, "int16")  # noqa: E731
                else:
                    # extra rides through separate_batch as a traced argument
                    # (ndim-3 broadcast): hand-rolled jit(vmap(...)) closures
                    # embedded it as a ~40 MB HLO literal AND replicated the
                    # collapsed-encoder composition under the vmap — the
                    # bach10 vmap8 compile ground the remote compile server
                    # to a broken pipe both ways (2026-08-17/18)
                    fb = lambda b: separate_batch(  # noqa: E731
                        params, b, preset, Lb, None, "int16", extra
                    )
                np.asarray(fb(stacked)[..., :8])
                # min-of-reps: the first post-compile dispatch can still pay
                # an executable-load / queue tail (a 10× outlier was measured
                # on bach10 vmap8, 2026-08-18) — the min is the steady state
                per_b = min(
                    _timed(lambda r=r: np.asarray(
                        fb(stacked + jnp.float32(r * 1e-7))[..., :8]
                    ))
                    for r in range(3)
                ) / batch
                out[name]["rtf_batched_vmap"] = round(audio_sec / per_b, 2)
                if per_b < best:  # mfu tracks the best sustained time
                    best = per_b
                    out[name].update(
                        compute_mfu(preset, Lb, per_b, jax.devices()[0].device_kind)
                    )
            except Exception as e:
                out[name]["rtf_batched_vmap"] = f"failed: {type(e).__name__}: {str(e)[:160]}"
        # batch-16/32 single dispatch (native batch axis, r3): the ~30 ms
        # dispatch-RPC floor amortizes over 2–4× the tracks — highres4096
        # measured 12.25 → 9.14 → 8.22 ms/track going 8 → 16 → 32
        # (2026-08-19, fused Mosaic decode at 32). Mono presets only (the
        # stereo program doubles the working set).
        if not stereo:
            from convsep_tpu.separate.stream import separate_batch

            for nb in (16, 32):
                if time.monotonic() - _T0 > time_budget_s:
                    break
                try:
                    stackednb = jnp.concatenate(
                        [jnp.stack(tracks) + jnp.float32(i * 2e-6)
                         for i in range(nb // batch)]
                    )
                    fbnb = lambda b: separate_batch(  # noqa: E731
                        params, b, preset, Lb, None, "int16", extra
                    )
                    np.asarray(fbnb(stackednb)[..., :8])
                    pernb = min(
                        _timed(lambda r=r: np.asarray(
                            fbnb(stackednb + jnp.float32(r * 1e-7))[..., :8]
                        ))
                        for r in range(3)
                    ) / nb
                    out[name][f"rtf_batched_b{nb}"] = round(audio_sec / pernb, 2)
                    if pernb < best:
                        best = pernb
                        out[name].update(
                            compute_mfu(preset, Lb, pernb,
                                        jax.devices()[0].device_kind)
                        )
                    del stackednb
                except Exception as e:
                    out[name][f"rtf_batched_b{nb}"] = (
                        f"failed: {type(e).__name__}: {str(e)[:160]}"
                    )
        # lax.map B=48 single dispatch — the HEADLINE methodology (dsd100's
        # 45xx× row is lax.map B=64), so ikala-class presets get an
        # apples-to-apples batched number (VERDICT r1 #1). Restricted to
        # 1024-pt presets: XLA's loop pass takes ~42 min on 4096-pt bodies.
        if (
            preset.transform.frame_size < 2048
            and cfg.channels_in - len(preset.transform.multires) <= 2
            and time.monotonic() - _T0 <= time_budget_s
        ):
            from convsep_tpu.separate.stream import (
                separate_batch_scan,
                separate_batch_scan_stereo,
            )

            try:
                Bs = 48
                stacked = jnp.concatenate(
                    [jnp.stack(tracks)] * (Bs // len(tracks))
                ) + jnp.arange(Bs, dtype=jnp.float32)[
                    (...,) + (None,) * (1 + int(stereo))
                ] * 1e-7
                if stereo:
                    fsc = lambda b: separate_batch_scan_stereo(  # noqa: E731
                        params, b, preset, Lb, "int16"
                    )
                else:
                    fsc = lambda b: separate_batch_scan(  # noqa: E731
                        params, b, preset, Lb, None, "int16"
                    )
                np.asarray(fsc(stacked)[..., :8])
                per_s = min(
                    _timed(lambda r=r: np.asarray(
                        fsc(stacked + jnp.float32(r * 1e-7))[..., :8]
                    ))
                    for r in range(2)
                ) / Bs
                out[name]["rtf_batched_scan48"] = round(audio_sec / per_s, 2)
                if per_s < best:
                    best = per_s
                    out[name].update(
                        compute_mfu(preset, Lb, per_s, jax.devices()[0].device_kind)
                    )
            except Exception as e:
                out[name]["rtf_batched_scan48"] = f"failed: {type(e).__name__}: {str(e)[:160]}"
    return out


def run_benchmark(
    preset_name: str = "dsd100",
    seconds: float = 30.0,
    runs: int = 9,
    seed: int = 0,
    matrix: bool = False,  # bench.py (the driver) opts in; programmatic
    # callers shouldn't silently pay the multi-preset compile cost
    time_budget_s: float = 1500.0,
) -> dict:
    preset = get_preset(preset_name)
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    if cfg.channels_in > 1:
        raise ValueError("benchmark presets must be single-channel input")
    fs = preset.transform.fs
    L = int(seconds * fs)
    _, mix = sine_mixture(cfg.num_sources, L, fs=fs, seed=seed)
    Lb = bucket_length(L, preset)
    host_audio = np.pad(mix, (0, Lb - L)).astype(np.float32)
    audio_sec = Lb / fs

    def fused(a):
        return separate_fused(params, a, None, preset, Lb, None, "int16")

    _progress(f"headline: {preset_name} compile")
    # compile + warm up
    t0 = time.perf_counter()
    dev_audio = jnp.asarray(host_audio)
    _retry(lambda: np.asarray(fused(dev_audio)[:, :8]))
    compile_s = time.perf_counter() - t0

    # e2e uses PCM16 both ways: wav-precision int16 upload (dequantized on
    # device) + int16 stems — the minimum bytes the tunnel must move
    _progress("headline: int16-ingest variant compile")
    from convsep_tpu.utils.pcm import quantize_pcm16_host

    host_pcm16 = quantize_pcm16_host(host_audio)
    # compile the int16-ingest variant
    _retry(lambda: np.asarray(fused(jnp.asarray(host_pcm16))[:, :8]))

    _progress("headline: link probe")
    probe = link_probe()

    _progress("headline: e2e timing runs")
    t_compute, t_fetch, t_e2e = [], [], []
    for _ in range(runs):
        # e2e: upload → fused program → tiny barrier → full PCM16 download
        t0 = time.perf_counter()
        dev_audio = jnp.asarray(host_pcm16)
        stems = fused(dev_audio)
        np.asarray(stems[:, :8])  # dependent tiny fetch = compute barrier
        t1 = time.perf_counter()
        out = fetch_parallel(stems)  # per-stem concurrent RPC streams
        t2 = time.perf_counter()
        t_compute.append(t1 - t0)
        t_fetch.append(t2 - t1)
        t_e2e.append(t2 - t0)
    # min over runs (timeit practice): the shared tunnel adds heavy-tailed
    # scheduling noise; the minimum is the reproducible device capability.
    min_c = float(np.min(t_compute))
    med_c = float(np.median(t_compute))
    med_e = float(np.median(t_e2e))
    rtf_e2e = audio_sec / med_e

    # streaming e2e throughput: StreamSeparator overlaps upload/compute with
    # the previous batch's stem download — per-track wall approaches the
    # tunnel-bandwidth floor (docs/TRANSFER_CEILING.md). Measured HERE,
    # before the pipelined/batched sections queue hundreds of MB of device
    # outputs whose deallocation RPCs stall the tunnel mid-measurement
    # (observed 61x in isolation vs 12-72x when measured after them).
    from convsep_tpu.separate.stream import StreamSeparator

    _progress("headline: streaming e2e")
    ss = StreamSeparator(preset, params, output_dtype="int16", input_dtype="int16")
    ktracks = [host_pcm16 + np.int16(i % 3) for i in range(6)]
    _retry(lambda: list(ss.stream(iter(ktracks[:2]), batch_size=2)))  # warm (same shapes)
    import gc

    gc.collect()  # settle deallocation RPCs before timing
    # best of 3 passes: single passes are exposed to one-off tunnel stalls
    stream_per_track = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_done = sum(len(b) for b in ss.stream(iter(ktracks), batch_size=2))
        stream_per_track.append((time.perf_counter() - t0) / n_done)
    rtf_e2e_stream = audio_sec / min(stream_per_track)

    # chunked single-track streaming (VERDICT r1 #2): fixed-size chunks with
    # an on-device OLA carry — a single track's uploads/compute/downloads
    # overlap EACH OTHER, unlike the one-dispatch whole-track path above.
    # Plain and complement-fetch variants are timed in ALTERNATING passes
    # (VERDICT r2 #2): in r2 they ran as separate back-to-back sections and
    # the complement mode — which moves strictly fewer bytes — measured 2×
    # slower, consistent with queued deallocation RPCs from the earlier
    # section poisoning the later one. Interleaving makes the two modes
    # share each rep's tunnel conditions so the comparison is fair.
    from convsep_tpu.separate.chunked import ChunkedSeparator

    _progress("headline: chunked single-track streaming (plain/complement interleaved)")
    chunked_bytes: dict[str, float] = {}
    try:
        cs = ChunkedSeparator(
            preset, params, chunk_segments=32, output_dtype="int16", input_dtype="int16"
        )
        csc = ChunkedSeparator(
            preset, params, chunk_segments=32, output_dtype="int16",
            input_dtype="int16", complement_last=True,
        )
        cs(host_pcm16)  # compile + warm (plain program)
        csc(host_pcm16)  # compile + warm (conserve-mask program)
        import math as _math

        from convsep_tpu.dsp import num_frames as _nframes

        _nf = _nframes(Lb, preset.transform.hop_size)
        _Fc = cfg.time_context * 32
        _nc = max(1, _math.ceil(_nf / _Fc))
        _span = _Fc * preset.transform.hop_size
        _S = cfg.num_sources
        chunked_bytes = {
            "up_mb": round((_nc * _span + preset.transform.frame_size
                            - preset.transform.hop_size) * 2 / 1e6, 2),
            "down_mb_plain": round(_S * _nc * _span * 2 / 1e6, 2),
            "down_mb_complement": round((_S - 1) * _nc * _span * 2 / 1e6, 2),
            "n_chunks": _nc,
        }
        import gc as _gc

        _gc.collect()  # settle deallocation RPCs before timing
        chunk_times, comp_times = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            cs(host_pcm16)
            chunk_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            csc(host_pcm16)
            comp_times.append(time.perf_counter() - t0)
        rtf_e2e_chunked = audio_sec / float(np.min(chunk_times))
        rtf_e2e_chunked_comp = audio_sec / float(np.min(comp_times))
        chunked_bytes["plain_median_s"] = round(float(np.median(chunk_times)), 3)
        chunked_bytes["complement_median_s"] = round(float(np.median(comp_times)), 3)
    except Exception as e:
        rtf_e2e_chunked = f"failed: {type(e).__name__}"
        rtf_e2e_chunked_comp = f"failed: {type(e).__name__}"

    # online push/flush mode (VERDICT r2 #7): the one serving mode with no
    # BENCH row until r3. Reports, per chunk_segments: steady-state RTF
    # (full track pushed in capture-sized blocks, flush included),
    # algorithmic latency (samples that must arrive before a chunk can
    # emit), and measured per-chunk processing latency (wall time of the
    # push that completes a chunk: upload + compute + synchronous fetch).
    online_detail: dict[str, object] = {}
    if matrix and time.monotonic() - _T0 <= time_budget_s:
        from convsep_tpu.separate.online import OnlineSeparator

        _progress("headline: online push/flush (cs=4/8/32)")
        for cs_seg in (4, 8, 32):
            try:
                osep = OnlineSeparator(
                    preset, params, chunk_segments=cs_seg,
                    output_dtype="int16", input_dtype="int16",
                )
                osep.push(host_pcm16)
                osep.flush()  # compile + warm all chunk variants
                span = osep.chunk_samples
                # steady-state: 16k-sample blocks (~0.37 s of capture)
                block = 16384
                steady = []
                for _ in range(3):
                    osep.reset()
                    t0 = time.perf_counter()
                    for p in range(0, len(host_pcm16), block):
                        osep.push(host_pcm16[p : p + block])
                    osep.flush()
                    steady.append(time.perf_counter() - t0)
                # per-chunk processing latency: prime past the first chunk,
                # then time pushes that each complete exactly one chunk
                osep.reset()
                osep.push(host_pcm16[: osep.latency_samples])
                lat = []
                pos = osep.latency_samples
                for _ in range(4):
                    t0 = time.perf_counter()
                    out = osep.push(host_pcm16[pos : pos + span])
                    lat.append(time.perf_counter() - t0)
                    pos += span
                    if out.shape[-1] == 0:
                        break
                online_detail[f"cs{cs_seg}"] = {
                    "rtf_steady": round(audio_sec / min(steady), 2),
                    "latency_algo_s": round(osep.latency_samples / fs, 4),
                    "latency_proc_ms": round(1e3 * float(np.median(lat)), 1),
                }
            except Exception as e:
                online_detail[f"cs{cs_seg}"] = f"failed: {type(e).__name__}: {str(e)[:120]}"

    # sustained throughput: K tracks dispatched async (device queue keeps the
    # chip busy), one dependent tiny fetch per output at the end — per-call
    # RPC/upload overheads overlap with compute, as in production streaming.
    _progress("headline: sustained pipelined")
    K = 8
    inputs = [jnp.asarray(host_audio + np.float32(i) * 1e-6) for i in range(K)]
    outs = [fused(a) for a in inputs]  # warm the queue path
    _ = [np.asarray(o[..., :8]) for o in outs]
    t0 = time.perf_counter()
    outs = [fused(a) for a in inputs]
    _ = [np.asarray(o[..., :8]) for o in outs]
    per_track = (time.perf_counter() - t0) / K
    rtf_sustained = audio_sec / per_track

    # batched sustained: B tracks in ONE program dispatch (StreamSeparator's
    # production path, BASELINE config #4) — per-dispatch overhead amortized
    # across the whole batch. lax.map (sequential-in-dispatch) keeps memory
    # at single-track working set and compiles the body once.
    from convsep_tpu.separate.stream import separate_batch_scan

    # lax.map keeps the working set at single-track size, so B only
    # amortizes the per-dispatch tunnel RPC (~30 ms here): B=64 measured
    # ~0.5 ms/track of dispatch overhead vs ~2 ms at B=16
    _progress("headline: batched lax.map compile+run")
    B = 64
    batch = jnp.stack([jnp.asarray(host_audio + np.float32(i) * 1e-6) for i in range(B)])

    def fused_batch(tracks):
        return separate_batch_scan(params, tracks, preset, Lb, None, "int16")

    _retry(lambda: np.asarray(fused_batch(batch)[:, :, :8]))
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out_b = fused_batch(batch)
        np.asarray(out_b[:, :, :8])
    per_track_b = (time.perf_counter() - t0) / (B * reps)
    rtf_batched = audio_sec / per_track_b

    # same program with the Pallas DSP kernels (fft_impl="pallas"), smaller
    # B / fewer reps — recorded for the matmul-vs-pallas decision (the
    # committed profile: docs/PALLAS_PROFILE.md; matmul is default because
    # it wins on this backend)
    import dataclasses

    _progress("headline: pallas variant compile+run")
    pl_preset = dataclasses.replace(
        preset, transform=dataclasses.replace(preset.transform, fft_impl="pallas")
    )
    Bp = 8
    batch_p = batch[:Bp]

    def fused_batch_pallas(tracks):
        return separate_batch_scan(params, tracks, pl_preset, Lb, None, "int16")

    try:
        out_p = fused_batch_pallas(batch_p)
        np.asarray(out_p[:, :, :8])
        t0 = time.perf_counter()
        out_p = fused_batch_pallas(batch_p)
        np.asarray(out_p[:, :, :8])
        rtf_batched_pallas = audio_sec / ((time.perf_counter() - t0) / Bp)
    except Exception as e:  # record the failure rather than killing the bench
        rtf_batched_pallas = f"failed: {type(e).__name__}"

    # bf16 MXU variant (params stay fp32; activations/matmuls bf16): on the
    # v5e fp32 matmuls execute as multi-pass bf16, so this is the
    # native-speed path — measured batched (vmap) so dispatch overhead
    # doesn't dilute the device-time difference. Quality impact is
    # quantified separately (tools/quality_loop.py --compute-dtype).
    import dataclasses as _dc

    from convsep_tpu.separate.stream import separate_batch as _sb

    _progress("headline: bf16 compute variant (vmap B=8)")
    bf_preset = _dc.replace(
        preset, model=_dc.replace(preset.model, compute_dtype="bfloat16")
    )
    try:
        # min-of-reps per variant (NOT a 2-rep mean): the first post-compile
        # dispatch can pay a ~10× executable-load/queue outlier, and a mean
        # of two bakes it in — this is exactly what produced the phantom
        # "bf16 5× slower than f32" rows in BENCH_r02/r03a. Traced in
        # isolation (2026-08-19): bf16 6.95 ms/track vs f32 7.48 — parity,
        # as expected when the precision-pinned DFT matmuls dominate.
        stacked8 = jnp.stack([jnp.asarray(host_audio + np.float32(i) * 1e-6) for i in range(8)])
        fbf = lambda b: _sb(params, b, bf_preset, Lb, None, "int16")  # noqa: E731
        _retry(lambda: np.asarray(fbf(stacked8)[..., :8]))
        per_bf = min(
            _timed(lambda r=r: np.asarray(
                fbf(stacked8 + jnp.float32(r * 1e-7))[..., :8]
            ))
            for r in range(3)
        ) / 8
        rtf_bf16 = audio_sec / per_bf
        # fp32 vmap B=8 comparator under the same harness
        ff32 = lambda b: _sb(params, b, preset, Lb, None, "int16")  # noqa: E731
        _retry(lambda: np.asarray(ff32(stacked8)[..., :8]))
        per_f32 = min(
            _timed(lambda r=r: np.asarray(
                ff32(stacked8 + jnp.float32(r * 1e-7))[..., :8]
            ))
            for r in range(3)
        ) / 8
        rtf_f32_vmap8 = audio_sec / per_f32
    except Exception as e:
        rtf_bf16 = f"failed: {type(e).__name__}"
        rtf_f32_vmap8 = None

    # training throughput (SURVEY.md §3.5): the donated-buffer jitted train
    # step at the reference-parity batch (32 segments) and at a production
    # throughput batch (256) — audio-seconds of training data consumed per
    # wall-second. Recorded every round so train-step regressions are as
    # visible as separation ones.
    train_detail: dict[str, object] = {}
    if matrix and time.monotonic() - _T0 <= time_budget_s:
        _progress("train: step throughput (B=32, B=256)")
        try:
            from convsep_tpu.train.loop import create_train_state, make_train_step

            state, opt = create_train_state(preset, seed)
            train_step = make_train_step(preset, opt)
            rng_np = np.random.default_rng(seed)
            seg_sec = (
                preset.train.time_context * preset.transform.hop_size / fs
            )
            for Bt in (32, 256):
                x = jnp.asarray(
                    rng_np.normal(
                        size=(Bt, cfg.time_context, cfg.feat_size, cfg.channels_in)
                    ).astype(np.float32)
                )
                yt = jnp.asarray(
                    rng_np.normal(
                        size=(Bt, cfg.num_sources, cfg.time_context, cfg.feat_size)
                    ).astype(np.float32)
                )
                state, m = train_step(state, x, yt)
                _ = float(m["loss"])  # compile + warm
                reps = 20
                t0 = time.perf_counter()
                for _ in range(reps):
                    state, m = train_step(state, x, yt)
                _ = float(m["loss"])
                dt_step = (time.perf_counter() - t0) / reps
                train_detail[f"b{Bt}"] = {
                    "ms_per_step": round(dt_step * 1e3, 2),
                    "rtf_train": round(Bt * seg_sec / dt_step, 1),
                }
            # bf16 adadelta-state variant at the parity batch: the step is
            # HBM-bound on the accumulator streams, so narrowed state is
            # the one training knob left (measured 9.05 → 7.71 ms, loss
            # trajectory ≤2e-5 rel over 200 steps, 2026-08-19)
            import dataclasses as _dc

            p16 = _dc.replace(
                preset,
                train=_dc.replace(
                    preset.train, optimizer_state_dtype="bfloat16"
                ),
            )
            state16, opt16 = create_train_state(p16, seed)
            step16 = make_train_step(p16, opt16)
            x = jnp.asarray(
                rng_np.normal(
                    size=(32, cfg.time_context, cfg.feat_size, cfg.channels_in)
                ).astype(np.float32)
            )
            yt = jnp.asarray(
                rng_np.normal(
                    size=(32, cfg.num_sources, cfg.time_context, cfg.feat_size)
                ).astype(np.float32)
            )
            state16, m = step16(state16, x, yt)
            _ = float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(20):
                state16, m = step16(state16, x, yt)
            _ = float(m["loss"])
            dt_step = (time.perf_counter() - t0) / 20
            train_detail["b32_state_bf16"] = {
                "ms_per_step": round(dt_step * 1e3, 2),
                "rtf_train": round(32 * seg_sec / dt_step, 1),
            }
        except Exception as e:
            train_detail["error"] = f"{type(e).__name__}: {str(e)[:160]}"

    # full preset matrix (VERDICT r1 #9) — every preset's batched RTF is in
    # the driver-recorded BENCH, not just the headline preset's
    presets_detail = (
        preset_matrix(seconds=seconds, seed=seed, time_budget_s=time_budget_s)
        if matrix
        else {}
    )
    _progress("post link probe")
    probe_post = link_probe()  # quantifies in-run tunnel drift
    probe["post_down4_mb_s"] = probe_post["down4_mb_s"]
    probe["post_up_mb_s"] = probe_post["up_mb_s"]
    _progress("done")

    # headline = the batched streaming path (production config #4); labeled
    # as such (VERDICT r1 weak-#4) — single-call / pipelined RTFs in detail
    rtf_device = rtf_batched
    return {
        "metric": f"RTF audio-sec/sec/chip ({preset_name} {cfg.num_sources}-stem fused separation, batched streaming, HBM-resident)",
        "value": round(rtf_device, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf_device / 100.0, 3),  # target: >100x (BASELINE.md)
        "detail": {
            "preset": preset_name,
            "track_seconds": seconds,
            "bucketed_seconds": audio_sec,
            "device_min_s": min_c,
            "device_median_s": med_c,
            "rtf_device_median": round(audio_sec / med_c, 2),
            "rtf_single_call_min": round(audio_sec / min_c, 2),
            "rtf_sustained_pipelined": round(rtf_sustained, 2),
            "sustained_per_track_s": round(per_track, 4),
            "rtf_sustained_batched": round(rtf_batched, 2),
            "batched_per_track_s": round(per_track_b, 4),
            "batch_size": B,
            # analytic FLOPs + achieved TFLOP/s at the headline per-track
            # time (utils/flops.py; VERDICT r1 #4)
            **compute_mfu(preset, Lb, per_track_b, jax.devices()[0].device_kind),
            "rtf_batched_bf16_vmap8": (
                round(rtf_bf16, 2) if isinstance(rtf_bf16, float) else rtf_bf16
            ),
            "rtf_batched_f32_vmap8": (
                round(rtf_f32_vmap8, 2) if isinstance(rtf_f32_vmap8, float) else None
            ),
            "rtf_batched_pallas_impl": (
                round(rtf_batched_pallas, 2)
                if isinstance(rtf_batched_pallas, float)
                else rtf_batched_pallas
            ),
            "e2e_median_s": med_e,
            "rtf_e2e_incl_transfers": round(rtf_e2e, 2),
            "rtf_e2e_streaming": round(rtf_e2e_stream, 2),
            "rtf_e2e_streaming_single": (
                round(rtf_e2e_chunked, 2)
                if isinstance(rtf_e2e_chunked, float)
                else rtf_e2e_chunked
            ),
            "rtf_e2e_streaming_single_complement": (
                round(rtf_e2e_chunked_comp, 2)
                if isinstance(rtf_e2e_chunked_comp, float)
                else rtf_e2e_chunked_comp
            ),
            "stem_fetch_median_s": float(np.median(t_fetch)),
            "stems_dtype": "int16 (PCM16, quantized on device)",
            # in-run tunnel bandwidth (VERDICT r2 #2): the scalar is the
            # 4-stream parallel download MB/s — the stem-fetch floor
            "link_mb_s": probe["down4_mb_s"],
            "link_probe": probe,
            "chunked_bytes": chunked_bytes,
            "online": online_detail,
            "train": train_detail,
            "presets": presets_detail,
            "compile_plus_first_run_s": round(compile_s, 2),
            "device": str(jax.devices()[0]),
            "n_stems": cfg.num_sources,
            "finite": bool(np.isfinite(out).all()),
        },
    }
