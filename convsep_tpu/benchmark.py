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

Round-4 structure (VERDICT r3 #1: two consecutive rounds lost the driver
headline to late-stage crashes — r2 to stdout overflow, r3 to a
RESOURCE_EXHAUSTED in the preset matrix after ~3 GB of un-freed earlier
sections). The run is now a sequence of SECTIONS, each:

* **isolated** — a section failure is recorded under
  ``detail["section_errors"]`` and the run continues; the exceptions the
  section-isolation design exists for (eager param init, track uploads
  under memory pressure) are INSIDE the guarded bodies;
* **emitted** — ``on_section`` fires with the full partial result after
  every section, so the caller (bench.py) persists BENCH_DETAIL.json
  incrementally and can still print a compact headline if the process
  dies mid-run;
* **memory-scoped** — device buffers a section allocates are freed
  eagerly (``jax.Array.delete()``) in ``finally`` blocks before the next
  section runs, and the preset matrix preflights each preset's parameter
  bytes analytically (``utils/flops.model_param_count`` —
  ``device.memory_stats()`` is None on the axon runtime) and records a
  skip instead of OOMing the process.
"""

from __future__ import annotations

import dataclasses
import gc
import math
import os
import sys
import time

_T0 = time.monotonic()


def _progress(msg: str) -> None:
    """Stage timestamps on stderr (the JSON contract owns stdout)."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _resolve_analysis_record(preset) -> str:
    if preset.transform.fft_impl != "matmul":
        return "n/a"
    from convsep_tpu.dsp.pallas.ct_stft_kernel import resolve_analysis

    t = preset.transform
    return resolve_analysis(
        t.analysis, t.masked_synthesis, t.nfft or t.frame_size,
        t.frame_size, t.hop_size, preset.sep.wiener_p,
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs import get_preset
from convsep_tpu.data.synth import sine_mixture
from convsep_tpu.models.convsep import (
    ConvSep,
    prepare_inference,
    resolve_decoder_impl,
)
from convsep_tpu.separate.pipeline import bucket_length, separate_fused
from convsep_tpu.utils import transfer as _transfer
from convsep_tpu.utils.flops import mfu as compute_mfu
from convsep_tpu.utils.flops import model_param_count
from convsep_tpu.utils.transfer import fetch_parallel


def _free(*trees) -> None:
    """Eagerly release every device buffer in the given pytrees.

    Rebinding a name allocates-new-before-freeing-old, and Python GC frees
    device buffers only when the deallocation RPC eventually runs — both
    patterns let dead buffers squat HBM across sections, which is what
    OOMed the r3 bench (VERDICT r3 weak-#1). ``delete()`` is idempotent
    and safe on donated/consumed arrays.
    """
    for t in trees:
        if t is None:
            continue
        for leaf in jax.tree.leaves(t):
            if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                leaf.delete()


_TRANSIENT_MARKERS = (
    "response body",
    "broken pipe",
    "connection reset",
    "connection closed",
    "unavailable",
    "deadline exceeded",
    "socket closed",
    "stream removed",
)


def _is_transient(e: Exception) -> bool:
    """Only remote-transport flakes are worth retrying (ADVICE r3 /
    VERDICT r3 weak-#3): deterministic failures — shape errors, OOM —
    must re-raise immediately. RESOURCE_EXHAUSTED in particular is NOT
    transient, and retrying it can worsen fragmentation."""
    if isinstance(e, (ValueError, TypeError, KeyError, AttributeError)):
        return False
    msg = str(e).lower()
    if "resource_exhausted" in msg or "resource exhausted" in msg:
        return False
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _retry(fn, attempts: int = 3, sleep_s: float = 20.0):
    """Retry a compile+warm thunk through transient remote-compile-server
    failures ('response body closed before all bytes were read' killed the
    whole r3 bench once; the identical request succeeded on retry). Only
    used around compile phases — never around timed measurement loops."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — jax wraps RPC errors variously
            if i == attempts - 1 or not _is_transient(e):
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
    n = int(mb * 1e6 / 4)
    host = np.random.default_rng(0).random(n).astype(np.float32)
    dev = jnp.asarray(host)
    np.asarray(dev[:8])  # warm the transfer path + any layout setup
    t0 = time.perf_counter()
    dev = jnp.asarray(host + np.float32(1.0))
    np.asarray(dev[:8])
    up = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(dev)
    down = time.perf_counter() - t0
    dev4 = dev.reshape(4, -1)
    np.asarray(dev4[0, :8])
    t0 = time.perf_counter()
    _ = fetch_parallel(dev4, max_streams=4)
    down4 = time.perf_counter() - t0
    _free(dev, dev4)
    return {
        "payload_mb": mb,
        "up_mb_s": round(mb / up, 1),
        "down_mb_s": round(mb / down, 1),
        "down4_mb_s": round(mb / down4, 1),
    }


def _hbm_budget_bytes() -> float:
    """Usable-HBM planning figure for allocation preflights.

    ``device.memory_stats()`` is None on the axon runtime, so this is a
    conservative static budget (v5e has 16 GB; leave headroom for compiled
    executables, DFT constants, and allocator fragmentation), overridable
    via CONVSEP_BENCH_HBM_GB for other parts.
    """
    return float(os.environ.get("CONVSEP_BENCH_HBM_GB", "10")) * 1e9


def _matrix_one(
    preset, name: str, seconds: float, batch: int, seed: int, deadline: float
) -> dict | str:
    """All rows for one preset. Every device allocation — the eager param
    init and the track uploads included (VERDICT r3 weak-#7: those are the
    allocations that actually fail under memory pressure) — happens inside
    the guarded body; the ``finally`` frees everything this preset touched
    before the next preset runs."""
    from convsep_tpu.dsp import num_frames
    from convsep_tpu.dsp.dft import resolve_masked_synthesis

    cfg = preset.model
    stereo = cfg.decoder_reduce == "all"
    fs = preset.transform.fs
    L = int(seconds * fs)
    _, mix = sine_mixture(cfg.num_sources, L, fs=fs, seed=seed)
    Lb = bucket_length(L, preset)
    audio_sec = Lb / fs
    host = np.pad(mix, (0, Lb - L)).astype(np.float32)
    if stereo:  # joint-channel preset: (2, L) input, one program per ear pair
        host = np.stack([host, 0.5 * host])

    params = tracks = extra = None
    out: dict = {}
    try:
        params = ConvSep(cfg).init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
        )
        # one-time fused-decode operand prep (r4): moves ~8 ms/dispatch of
        # relayout/pad passes off the measured path, exactly as the
        # Separator classes do (models.convsep.prepare_inference)
        params = prepare_inference(cfg, params)
        tracks = [jnp.asarray(host + np.float32(i) * 1e-6) for i in range(batch)]
        # extra channels the transform does NOT synthesize itself
        # (multires presets compute theirs in-program from the audio)
        n_extra = 0 if stereo else cfg.channels_in - 1 - len(preset.transform.multires)
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

        outs = [fused(a) for a in tracks]  # compile + warm the queue path
        _ = [np.asarray(o[..., :8]) for o in outs]
        t0 = time.perf_counter()
        outs2 = [fused(a) for a in tracks]
        _ = [np.asarray(o[..., :8]) for o in outs2]
        per_track = (time.perf_counter() - t0) / batch
        best = per_track
        out = {
            "rtf_pipelined": round(audio_sec / per_track, 2),
            "per_track_s": round(per_track, 4),
            "n_stems": cfg.num_sources,
            "channels_in": cfg.channels_in,
            "frame_size": preset.transform.frame_size,
            # which decoder implementation the preset's rows actually ran
            # (VERDICT r3 #3: auto-resolution must be RECORDED, not assumed)
            "decoder": resolve_decoder_impl(cfg),
            # masked-resynthesis routing actually engaged (dft.istft_wiener
            # auto envelope — recorded via the same resolver the dispatch
            # uses, never assumed)
            "masked_synthesis": resolve_masked_synthesis(
                preset.transform.masked_synthesis,
                preset.transform.nfft or preset.transform.frame_size,
                preset.transform.frame_size,
                preset.transform.hop_size,
                preset.sep.wiener_p,
            ) if preset.transform.fft_impl == "matmul" else "n/a",
            # mask-tail dtype (ConvSepConfig.mask_dtype): bf16 halves the
            # decode-output family + the Wiener kernel's y reads
            "mask_dtype": cfg.mask_dtype,
            # forward-analysis routing actually engaged (ct_pallas = the
            # fused factored forward-STFT kernel; recorded via the same
            # resolver the pipeline dispatch uses)
            "analysis": _resolve_analysis_record(preset),
            "params_mb": round(4 * model_param_count(cfg) / 1e6, 1),
            # achieved TFLOP/s + fraction of bf16 peak at this per-track
            # time (VERDICT r1 #4: every preset row carries tflops+mfu)
            **compute_mfu(preset, Lb, per_track, jax.devices()[0].device_kind),
        }
        # 16 live (S, L) outputs would squat HBM under the batched runs
        _free(outs, outs2)
        del outs, outs2

        # batched single-dispatch (vmap): compiles in minutes where lax.map's
        # loop pass takes ~42 min on 4096-pt bodies; measured 902x vs 542x
        # pipelined for highres4096 (2026-08-17). Score-informed presets
        # (bach10) vmap the fused program over tracks with the conditioning
        # channels shared — the op schedule is the same as per-track extras.
        if time.monotonic() < deadline:
            from convsep_tpu.separate.stream import (
                separate_batch,
                separate_batch_stereo,
            )

            stacked = None
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
                out["rtf_batched_vmap"] = round(audio_sec / per_b, 2)
                if per_b < best:  # mfu tracks the best sustained time
                    best = per_b
                    out.update(
                        compute_mfu(preset, Lb, per_b, jax.devices()[0].device_kind)
                    )
            except Exception as e:
                out["rtf_batched_vmap"] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            finally:
                _free(stacked)

        # batch-16/32 single dispatch (native batch axis, r3): the ~30 ms
        # dispatch-RPC floor amortizes over 2–4× the tracks — highres4096
        # measured 12.25 → 9.14 → 8.22 ms/track going 8 → 16 → 32
        # (2026-08-19, fused Mosaic decode at 32). Mono presets only (the
        # stereo program doubles the working set).
        if not stereo:
            from convsep_tpu.separate.stream import separate_batch

            for nb in (16, 32):
                if time.monotonic() > deadline:
                    break
                stackednb = None
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
                    out[f"rtf_batched_b{nb}"] = round(audio_sec / pernb, 2)
                    if pernb < best:
                        best = pernb
                        out.update(
                            compute_mfu(preset, Lb, pernb,
                                        jax.devices()[0].device_kind)
                        )
                except Exception as e:
                    if "remote_compile" in str(e) and "HTTP 500" in str(e):
                        # the rig's remote-compile helper dies (subprocess
                        # exit 1) on this program size — reproduced twice on
                        # bach10 b32 (2026-08-19, runs 1+2). An infra limit,
                        # not an HBM or program failure. VERDICT r4 #3:
                        # probe the EFFECTIVE batch anyway with a
                        # compile-size-bounded program — lax.map over two
                        # half-batches (one map-body compile at nb/2, all
                        # nb tracks + outputs device-resident).
                        try:
                            from convsep_tpu.separate.pipeline import (
                                separate_fused_batch,
                            )

                            half = nb // 2
                            mapped = jax.jit(
                                lambda p, t3: jax.lax.map(
                                    lambda tb: separate_fused_batch(
                                        p, tb, extra, preset, Lb, None,
                                        "int16",
                                    ),
                                    t3,
                                )
                            )
                            t3 = stackednb.reshape(2, half, -1)
                            np.asarray(mapped(params, t3)[0, 0, 0, :8])
                            pernb = min(
                                _timed(lambda r=r: np.asarray(mapped(
                                    params,
                                    t3 + jnp.float32(r * 1e-7),
                                )[0, 0, 0, :8]))
                                for r in range(3)
                            ) / nb
                            out[f"rtf_batched_b{nb}"] = round(
                                audio_sec / pernb, 2
                            )
                            out[f"rtf_batched_b{nb}_mode"] = (
                                f"lax_map_2x{half} (compile-server ceiling "
                                "at the single-dispatch size)"
                            )
                            if pernb < best:
                                best = pernb
                                out.update(compute_mfu(
                                    preset, Lb, pernb,
                                    jax.devices()[0].device_kind,
                                ))
                        except Exception as e2:
                            out[f"rtf_batched_b{nb}"] = (
                                "skipped: remote-compile helper cannot build "
                                "this program size (HTTP 500) and the "
                                f"lax.map fallback failed: "
                                f"{type(e2).__name__}: {str(e2)[:100]}"
                            )
                    else:
                        out[f"rtf_batched_b{nb}"] = (
                            f"failed: {type(e).__name__}: {str(e)[:160]}"
                        )
                finally:
                    _free(stackednb)

        # lax.map B=48 single dispatch — the HEADLINE methodology (dsd100's
        # 45xx× row is lax.map B=64), so ikala-class presets get an
        # apples-to-apples batched number (VERDICT r1 #1). Restricted to
        # 1024-pt presets: XLA's loop pass takes ~42 min on 4096-pt bodies.
        if (
            preset.transform.frame_size < 2048
            and cfg.channels_in - len(preset.transform.multires) <= 2
            and time.monotonic() < deadline
        ):
            from convsep_tpu.separate.stream import (
                separate_batch_scan,
                separate_batch_scan_stereo,
            )

            stacked = None
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
                out["rtf_batched_scan48"] = round(audio_sec / per_s, 2)
                if per_s < best:
                    out.update(
                        compute_mfu(preset, Lb, per_s, jax.devices()[0].device_kind)
                    )
            except Exception as e:
                out["rtf_batched_scan48"] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            finally:
                _free(stacked)

        # on-device Wiener mega-kernel equality (VERDICT r4 #2): for the
        # preset where the kernel carries the headline (highres4096),
        # compare int16 stems of masked_synthesis=ct_pallas (XLA wiener →
        # plain ct kernel) vs the engaged mega-kernel on a small batch —
        # recorded, not asserted (≤1 LSB expected)
        if (
            name == "highres4096"
            and out.get("masked_synthesis") == "ct_pallas_wiener"
            and time.monotonic() < deadline
        ):
            from convsep_tpu.separate.stream import separate_batch

            stacked = None
            try:
                stacked = jnp.stack(tracks[:4])
                outs = {}
                for ms in ("ct_pallas", "ct_pallas_wiener"):
                    pm = dataclasses.replace(
                        preset, transform=dataclasses.replace(
                            preset.transform, masked_synthesis=ms
                        )
                    )
                    o = separate_batch(params, stacked, pm, Lb, None, "int16")
                    outs[ms] = np.asarray(o).astype(np.int32)
                    _free(o)
                d = np.abs(outs["ct_pallas"] - outs["ct_pallas_wiener"])
                out["wiener_kernel_equality"] = {
                    "max_lsb": int(d.max()),
                    "mean_lsb": round(float(d.mean()), 5),
                }
            except Exception as e:
                out["wiener_kernel_equality"] = (
                    f"failed: {type(e).__name__}: {str(e)[:120]}"
                )
            finally:
                _free(stacked)
    except Exception as e:  # record, don't kill the bench (incl. init OOM)
        msg = f"failed: {type(e).__name__}: {str(e)[:160]}"
        return {**out, "error": msg} if out else msg
    finally:
        _free(params, tracks, extra)
    return out


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
    out: dict | None = None,
    emit=None,
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

    ``out`` (mutated in place) + ``emit`` let the caller persist partial
    results after every preset (VERDICT r3 #1c).
    """
    results: dict[str, object] = out if out is not None else {}
    deadline = _T0 + time_budget_s
    budget = _hbm_budget_bytes()
    for name in preset_names:
        if time.monotonic() > deadline:
            results[name] = "skipped: bench time budget (cold compile); rerun is warm"
            if emit:
                emit()
            continue
        _progress(f"matrix: {name}")
        preset = get_preset(name)
        cfg = preset.model
        # analytic HBM preflight (VERDICT r3 #1b): params + the peak
        # transient working set of the b32 row (8 warm tracks + a 32-track
        # stack + int16 outputs + 2× activation slack), vs the static
        # budget — memory_stats() is None on axon so this is the only
        # preflight available. With the per-section frees the chip is
        # near-empty here, so a static budget is meaningful.
        Lb = bucket_length(int(seconds * preset.transform.fs), preset)
        nch = 2 if cfg.decoder_reduce == "all" else 1
        track_bytes = 4 * Lb * nch
        out_bytes = 2 * cfg.num_sources * Lb * nch
        need = (
            4 * model_param_count(cfg)
            + (batch + 2 * 32) * track_bytes
            + 2 * 32 * out_bytes
        )
        if need > budget:
            results[name] = (
                f"skipped: hbm preflight ({need / 1e9:.2f} GB needed > "
                f"{budget / 1e9:.1f} GB budget)"
            )
            if emit:
                emit()
            continue
        results[name] = _matrix_one(preset, name, seconds, batch, seed, deadline)
        # drop this preset's compiled executables (and their device
        # constants) before the next preset's params land; the persistent
        # compilation cache keeps reruns warm
        jax.clear_caches()
        gc.collect()
        if emit:
            emit()
    return results


def hbm_watermark(
    preset_name: str = "dsd100",
    seconds: float = 30.0,
    seed: int = 0,
    start_batch: int = 64,
    max_batch: int = 512,
    deadline: float | None = None,
) -> dict:
    """Largest separation dispatch that compiles+runs — a true HBM probe.

    VERDICT r3 #8: an HBM regression should show up as this number moving
    between rounds, not as a dead bench. Doubles the batch from
    ``start_batch`` until failure, ``max_batch``, or the deadline; buffers
    are freed between probes and the failing size's error is recorded.

    VERDICT r4 #3: when the COMPILE SERVER binds first (the remote helper
    dies at a program size well below device memory — "HTTP 500" at
    dsd100 b128, r4), the probe switches to a compile-size-bounded
    program: ``lax.map`` over K sub-batches of the largest batch that
    still compiles. The map body compiles once regardless of K while all
    K·b inputs + outputs stay device-resident — so the doubling continues
    against HBM, not against the helper's program-size ceiling, and
    ``limit`` reports which wall was actually hit (``hbm`` |
    ``compile-server`` | ``max_batch reached``). Runs LAST in the bench:
    a probe that intentionally approaches OOM must not precede any
    measurement.
    """
    from convsep_tpu.separate.stream import separate_batch

    preset = get_preset(preset_name)
    cfg = preset.model
    fs = preset.transform.fs
    L = int(seconds * fs)
    _, mix = sine_mixture(cfg.num_sources, L, fs=fs, seed=seed)
    Lb = bucket_length(L, preset)
    host = np.pad(mix, (0, Lb - L)).astype(np.float32)

    params = tracks = None
    tried: dict[str, str] = {}
    ok = 0
    try:
        params = ConvSep(cfg).init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
        )
        # upload 8 tracks once; tile on-device per probe (the tunnel is
        # ~27 MB/s — a 256-track host upload alone would take ~50 s)
        tracks = [jnp.asarray(host + np.float32(i) * 1e-6) for i in range(8)]
        b = start_batch
        limit = "max_batch reached"
        while b <= max_batch:
            if deadline is not None and time.monotonic() > deadline:
                tried[str(b)] = "skipped: time budget"
                limit = "time budget"
                break
            stacked = outb = None
            try:
                stacked = jnp.concatenate(
                    [jnp.stack(tracks)] * (b // 8)
                ) + jnp.arange(b, dtype=jnp.float32)[:, None] * 1e-7
                outb = separate_batch(params, stacked, preset, Lb, None, "int16")
                np.asarray(outb[..., :8])
                tried[str(b)] = "ok"
                ok = b
            except Exception as e:
                tried[str(b)] = f"failed: {type(e).__name__}: {str(e)[:120]}"
                msg = str(e)
                if "remote_compile" in msg and "HTTP 500" in msg:
                    limit = "compile-server"  # helper subprocess dies at this
                    # program size (not a chip limit) — seen at b128 2026-08-19
                elif "RESOURCE_EXHAUSTED" in msg or "resource exhausted" in msg.lower():
                    limit = "hbm"
                else:
                    limit = "other"
                break
            finally:
                _free(stacked, outb)
            b *= 2
        if limit == "compile-server" and ok:
            # the helper died on PROGRAM size, not chip memory — continue
            # the probe with a compile-size-bounded program: lax.map over
            # K sub-batches of the proven size (one map-body compile, all
            # K·b_sub tracks resident) so the doubling measures HBM
            from convsep_tpu.separate.pipeline import separate_fused_batch

            b_sub = ok
            mapped = jax.jit(
                lambda p, t4: jax.lax.map(
                    lambda tb: separate_fused_batch(
                        p, tb, None, preset, Lb, None, "int16"
                    ),
                    t4,
                ),
                static_argnums=(),
            )
            K = 2
            while K * b_sub <= max_batch:
                B = K * b_sub
                if deadline is not None and time.monotonic() > deadline:
                    tried[f"{B}(map{K}x{b_sub})"] = "skipped: time budget"
                    limit = "time budget"
                    break
                stacked = outb = None
                try:
                    stacked = (
                        jnp.concatenate([jnp.stack(tracks)] * (B // 8))
                        + jnp.arange(B, dtype=jnp.float32)[:, None] * 1e-7
                    ).reshape(K, b_sub, -1)
                    outb = mapped(params, stacked)
                    np.asarray(outb[0, 0, 0, :8])
                    np.asarray(outb[-1, -1, -1, :8])
                    tried[f"{B}(map{K}x{b_sub})"] = "ok"
                    ok = B
                    limit = "max_batch reached"
                except Exception as e:
                    tried[f"{B}(map{K}x{b_sub})"] = (
                        f"failed: {type(e).__name__}: {str(e)[:120]}"
                    )
                    msg = str(e)
                    if "RESOURCE_EXHAUSTED" in msg or "resource exhausted" in msg.lower():
                        limit = "hbm"
                    elif "remote_compile" in msg and "HTTP 500" in msg:
                        limit = "compile-server"
                    else:
                        limit = "other"
                    break
                finally:
                    _free(stacked, outb)
                K *= 2
    finally:
        _free(params, tracks)
        jax.clear_caches()
        gc.collect()
    return {"preset": preset_name, "max_ok_batch": ok, "tried": tried,
            "limit": limit}


def run_benchmark(
    preset_name: str = "dsd100",
    seconds: float = 30.0,
    runs: int = 9,
    seed: int = 0,
    matrix: bool = False,  # bench.py (the driver) opts in; programmatic
    # callers shouldn't silently pay the multi-preset compile cost
    time_budget_s: float = 1500.0,
    on_section=None,
) -> dict:
    preset = get_preset(preset_name)
    cfg = preset.model
    if cfg.channels_in > 1:
        raise ValueError("benchmark presets must be single-channel input")
    fs = preset.transform.fs
    L = int(seconds * fs)
    _, mix = sine_mixture(cfg.num_sources, L, fs=fs, seed=seed)
    Lb = bucket_length(L, preset)
    host_audio = np.pad(mix, (0, Lb - L)).astype(np.float32)
    audio_sec = Lb / fs
    deadline = _T0 + time_budget_s

    detail: dict = {
        "preset": preset_name,
        "track_seconds": seconds,
        "bucketed_seconds": audio_sec,
        "n_stems": cfg.num_sources,
        "stems_dtype": "int16 (PCM16, quantized on device)",
    }
    result: dict = {
        "metric": (
            f"RTF audio-sec/sec/chip ({preset_name} {cfg.num_sources}-stem "
            "fused separation, batched streaming, HBM-resident)"
        ),
        "value": None,
        "unit": "x realtime",
        "vs_baseline": None,
        "detail": detail,
    }

    def _emit(name: str) -> None:
        # headline = the batched streaming path (production config #4,
        # VERDICT r1 weak-#4); if that section failed, fall back to the
        # best-known sustained figure so the driver ALWAYS gets a number
        for key in (
            "rtf_sustained_batched",
            "rtf_sustained_pipelined",
            "rtf_device_median",
        ):
            v = detail.get(key)
            if isinstance(v, (int, float)):
                result["value"] = round(v, 2)
                # target: >100x (BASELINE.md operational table)
                result["vs_baseline"] = round(v / 100.0, 3)
                detail["headline_key"] = key
                break
        if on_section is not None:
            on_section(result, name)

    def _section(name: str, fn, gate: bool = True) -> None:
        if not gate:
            return
        if time.monotonic() > deadline:
            detail.setdefault("section_errors", {})[name] = "skipped: time budget"
            _emit(name)
            return
        _progress(f"section: {name}")
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — isolate; record; continue
            detail.setdefault("section_errors", {})[name] = (
                f"{type(e).__name__}: {str(e)[:200]}"
            )
            _progress(f"section {name} FAILED: {type(e).__name__}: {str(e)[:120]}")
        _emit(name)

    _emit("init")

    # ---- spine: params + fused program compile. Unguarded by design —
    # nothing downstream can run without it; bench.py's top-level catch
    # turns a spine failure into a compact error line.
    _progress(f"headline: {preset_name} compile")
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )

    def fused(a):
        return separate_fused(params, a, None, preset, Lb, None, "int16")

    t0 = time.perf_counter()
    dev_audio = jnp.asarray(host_audio)
    _retry(lambda: np.asarray(fused(dev_audio)[:, :8]))
    detail["compile_plus_first_run_s"] = round(time.perf_counter() - t0, 2)
    detail["device"] = str(jax.devices()[0])
    _free(dev_audio)

    # e2e uses PCM16 both ways: wav-precision int16 upload (dequantized on
    # device) + int16 stems — the minimum bytes the tunnel must move
    from convsep_tpu.utils.pcm import quantize_pcm16_host

    host_pcm16 = quantize_pcm16_host(host_audio)
    _retry(lambda: np.asarray(fused(jnp.asarray(host_pcm16))[:, :8]))
    _emit("compile")

    # ---- link probe: measure the tunnel, then pick the fetch stream mode
    # from the measurement (VERDICT r3 #4: r3's probe saw 4-stream at
    # 5.9 MB/s vs single-stream 35.3 in the same run — the split must be
    # chosen per run).
    def _sec_probe():
        probe = link_probe()
        streams = 4 if probe["down4_mb_s"] >= probe["down_mb_s"] else 1
        _transfer.configure_streams(streams)
        probe["fetch_streams"] = streams
        detail["link_probe"] = probe
        # the scalar is the stem-fetch floor: the chosen mode's MB/s
        detail["link_mb_s"] = max(probe["down4_mb_s"], probe["down_mb_s"])

    _section("link-probe", _sec_probe)

    # ---- e2e single-dispatch: upload → fused program → barrier → fetch
    def _sec_e2e():
        t_compute, t_fetch, t_e2e = [], [], []
        stems = None
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                dev = jnp.asarray(host_pcm16)
                _free(stems)
                stems = fused(dev)
                np.asarray(stems[:, :8])  # dependent tiny fetch = compute barrier
                t1 = time.perf_counter()
                out = fetch_parallel(stems)  # per-stem concurrent RPC streams
                t2 = time.perf_counter()
                _free(dev)
                t_compute.append(t1 - t0)
                t_fetch.append(t2 - t1)
                t_e2e.append(t2 - t0)
            detail["finite"] = bool(np.isfinite(out).all())
        finally:
            _free(stems)
        # min over runs (timeit practice): the shared tunnel adds
        # heavy-tailed scheduling noise; the minimum is the reproducible
        # device capability.
        min_c = float(np.min(t_compute))
        med_c = float(np.median(t_compute))
        med_e = float(np.median(t_e2e))
        detail["device_min_s"] = min_c
        detail["device_median_s"] = med_c
        detail["rtf_device_median"] = round(audio_sec / med_c, 2)
        detail["rtf_single_call_min"] = round(audio_sec / min_c, 2)
        detail["e2e_median_s"] = med_e
        detail["rtf_e2e_incl_transfers"] = round(audio_sec / med_e, 2)
        detail["stem_fetch_median_s"] = float(np.median(t_fetch))

    _section("e2e", _sec_e2e)

    # ---- streaming e2e throughput: StreamSeparator overlaps
    # upload/compute with the previous batch's stem download — per-track
    # wall approaches the tunnel-bandwidth floor (docs/TRANSFER_CEILING.md).
    # Measured BEFORE the pipelined/batched sections queue hundreds of MB
    # of device outputs whose deallocation RPCs stall the tunnel
    # mid-measurement (observed 61x in isolation vs 12-72x after them).
    def _sec_streaming():
        from convsep_tpu.separate.stream import StreamSeparator

        ss = StreamSeparator(preset, params, output_dtype="int16", input_dtype="int16")
        # complement-fetch variant (VERDICT r3 #4: wired into StreamSeparator
        # in r4): the last stem never crosses the link — (S−1)/S of the bytes
        ssc = StreamSeparator(
            preset, params, output_dtype="int16", input_dtype="int16",
            complement_last=True,
        )
        ktracks = [host_pcm16 + np.int16(i % 3) for i in range(6)]
        _retry(lambda: list(ss.stream(iter(ktracks[:2]), batch_size=2)))  # warm
        _retry(lambda: list(ssc.stream(iter(ktracks[:2]), batch_size=2)))
        gc.collect()  # settle deallocation RPCs before timing
        # best of 3 passes, plain/complement INTERLEAVED so both modes share
        # each rep's tunnel conditions (the r2 back-to-back layout let queued
        # deallocations poison whichever section ran second)
        per_track, per_track_c = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            n_done = sum(len(b) for b in ss.stream(iter(ktracks), batch_size=2))
            per_track.append((time.perf_counter() - t0) / n_done)
            t0 = time.perf_counter()
            n_done = sum(len(b) for b in ssc.stream(iter(ktracks), batch_size=2))
            per_track_c.append((time.perf_counter() - t0) / n_done)
        detail["rtf_e2e_streaming"] = round(audio_sec / min(per_track), 2)
        detail["rtf_e2e_streaming_complement"] = round(audio_sec / min(per_track_c), 2)

    _section("streaming", _sec_streaming)

    # ---- chunked single-track streaming (VERDICT r1 #2): fixed-size
    # chunks with an on-device OLA carry — a single track's uploads/
    # compute/downloads overlap EACH OTHER. Plain and complement-fetch
    # variants timed in ALTERNATING passes (VERDICT r2 #2) so both modes
    # share each rep's tunnel conditions.
    def _sec_chunked():
        from convsep_tpu.dsp import num_frames as _nframes
        from convsep_tpu.separate.chunked import ChunkedSeparator

        cs = ChunkedSeparator(
            preset, params, chunk_segments=32, output_dtype="int16", input_dtype="int16"
        )
        csc = ChunkedSeparator(
            preset, params, chunk_segments=32, output_dtype="int16",
            input_dtype="int16", complement_last=True,
        )
        cs(host_pcm16)  # compile + warm (plain program)
        csc(host_pcm16)  # compile + warm (conserve-mask program)
        _nf = _nframes(Lb, preset.transform.hop_size)
        _Fc = cfg.time_context * 32
        _nc = max(1, math.ceil(_nf / _Fc))
        _span = _Fc * preset.transform.hop_size
        _S = cfg.num_sources
        detail["chunked_bytes"] = {
            "up_mb": round((_nc * _span + preset.transform.frame_size
                            - preset.transform.hop_size) * 2 / 1e6, 2),
            "down_mb_plain": round(_S * _nc * _span * 2 / 1e6, 2),
            "down_mb_complement": round((_S - 1) * _nc * _span * 2 / 1e6, 2),
            "n_chunks": _nc,
        }
        gc.collect()  # settle deallocation RPCs before timing
        chunk_times, comp_times = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            cs(host_pcm16)
            chunk_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            csc(host_pcm16)
            comp_times.append(time.perf_counter() - t0)
        detail["rtf_e2e_streaming_single"] = round(
            audio_sec / float(np.min(chunk_times)), 2
        )
        detail["rtf_e2e_streaming_single_complement"] = round(
            audio_sec / float(np.min(comp_times)), 2
        )
        detail["chunked_bytes"]["plain_median_s"] = round(
            float(np.median(chunk_times)), 3
        )
        detail["chunked_bytes"]["complement_median_s"] = round(
            float(np.median(comp_times)), 3
        )

    _section("chunked", _sec_chunked)

    # ---- online push/flush mode (VERDICT r2 #7). Per chunk_segments:
    # steady-state RTF (full track pushed in capture-sized blocks, flush
    # included), algorithmic latency (samples that must arrive before a
    # chunk can emit), and per-chunk processing latency.
    def _sec_online():
        from convsep_tpu.separate.online import OnlineSeparator

        online_detail: dict[str, object] = {}
        detail["online"] = online_detail
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
                del osep
                # serving mode (VERDICT r4 #4): complement-fetch + bounded
                # pipelining — chunk k's download overlaps chunk k+1's
                # compute; emission may slide ≤ max_pending chunks
                osep = OnlineSeparator(
                    preset, params, chunk_segments=cs_seg,
                    output_dtype="int16", input_dtype="int16",
                    complement_last=preset.model.num_sources >= 2,
                    max_pending=2,
                )
                osep.push(host_pcm16)
                osep.flush()
                steady = []
                for _ in range(3):
                    osep.reset()
                    t0 = time.perf_counter()
                    for p in range(0, len(host_pcm16), block):
                        osep.push(host_pcm16[p : p + block])
                    osep.flush()
                    steady.append(time.perf_counter() - t0)
                online_detail[f"cs{cs_seg}_serving"] = {
                    "rtf_steady": round(audio_sec / min(steady), 2),
                    "complement_last": preset.model.num_sources >= 2,
                    "max_pending": 2,
                }
                del osep
            except Exception as e:
                online_detail[f"cs{cs_seg}"] = (
                    f"failed: {type(e).__name__}: {str(e)[:120]}"
                )

    _section("online", _sec_online, gate=matrix)

    # ---- sustained throughput: K tracks dispatched async (device queue
    # keeps the chip busy), one dependent tiny fetch per output at the end
    # — per-call RPC/upload overheads overlap with compute.
    def _sec_pipelined():
        K = 8
        inputs = outs = outs2 = None
        try:
            inputs = [jnp.asarray(host_audio + np.float32(i) * 1e-6) for i in range(K)]
            outs = [fused(a) for a in inputs]  # warm the queue path
            _ = [np.asarray(o[..., :8]) for o in outs]
            t0 = time.perf_counter()
            outs2 = [fused(a) for a in inputs]
            _ = [np.asarray(o[..., :8]) for o in outs2]
            per_track = (time.perf_counter() - t0) / K
            detail["rtf_sustained_pipelined"] = round(audio_sec / per_track, 2)
            detail["sustained_per_track_s"] = round(per_track, 4)
        finally:
            _free(inputs, outs, outs2)

    _section("pipelined", _sec_pipelined)

    # ---- batched sustained (THE HEADLINE): B tracks in ONE program
    # dispatch (StreamSeparator's production path, BASELINE config #4).
    # lax.map (sequential-in-dispatch) keeps memory at single-track
    # working set and compiles the body once; B=64 measured ~0.5 ms/track
    # of dispatch overhead vs ~2 ms at B=16.
    def _sec_batched():
        from convsep_tpu.separate.stream import separate_batch_scan

        B = 64
        batch = out_b = None
        try:
            batch = jnp.stack(
                [jnp.asarray(host_audio + np.float32(i) * 1e-6) for i in range(B)]
            )

            def fused_batch(tracks):
                return separate_batch_scan(params, tracks, preset, Lb, None, "int16")

            _retry(lambda: np.asarray(fused_batch(batch)[:, :, :8]))
            reps = 2
            t0 = time.perf_counter()
            for _ in range(reps):
                _free(out_b)
                out_b = fused_batch(batch)
                np.asarray(out_b[:, :, :8])
            per_track_b = (time.perf_counter() - t0) / (B * reps)
            detail["rtf_sustained_batched"] = round(audio_sec / per_track_b, 2)
            detail["batched_per_track_s"] = round(per_track_b, 4)
            detail["batch_size"] = B
            # analytic FLOPs + achieved TFLOP/s at the headline per-track
            # time (utils/flops.py; VERDICT r1 #4)
            detail.update(
                compute_mfu(preset, Lb, per_track_b, jax.devices()[0].device_kind)
            )
        finally:
            _free(batch, out_b)

    _section("batched", _sec_batched)

    # ---- same program with the Pallas DSP kernels (fft_impl="pallas") —
    # recorded for the matmul-vs-pallas decision (docs/PALLAS_PROFILE.md;
    # matmul is default because it wins on this backend)
    def _sec_pallas():
        from convsep_tpu.separate.stream import separate_batch_scan

        pl_preset = dataclasses.replace(
            preset, transform=dataclasses.replace(preset.transform, fft_impl="pallas")
        )
        Bp = 8
        batch_p = out_p = None
        try:
            batch_p = jnp.stack(
                [jnp.asarray(host_audio + np.float32(i) * 1e-6) for i in range(Bp)]
            )

            def fused_batch_pallas(tracks):
                return separate_batch_scan(params, tracks, pl_preset, Lb, None, "int16")

            out_p = fused_batch_pallas(batch_p)
            np.asarray(out_p[:, :, :8])
            t0 = time.perf_counter()
            _free(out_p)
            out_p = fused_batch_pallas(batch_p)
            np.asarray(out_p[:, :, :8])
            detail["rtf_batched_pallas_impl"] = round(
                audio_sec / ((time.perf_counter() - t0) / Bp), 2
            )
        finally:
            _free(batch_p, out_p)

    _section("pallas-impl", _sec_pallas)

    # ---- bf16 MXU variant (params stay fp32; activations/matmuls bf16):
    # on the v5e fp32 matmuls execute as multi-pass bf16, so this is the
    # native-speed path — measured batched (vmap) so dispatch overhead
    # doesn't dilute the device-time difference. min-of-reps per variant
    # (NOT a 2-rep mean): the first post-compile dispatch can pay a ~10×
    # executable-load outlier — this produced the phantom "bf16 5× slower"
    # rows in BENCH_r02/r03a. Quality impact is quantified separately
    # (tools/quality_loop.py --compute-dtype).
    def _sec_bf16():
        from convsep_tpu.separate.stream import separate_batch as _sb

        bf_preset = dataclasses.replace(
            preset, model=dataclasses.replace(preset.model, compute_dtype="bfloat16")
        )
        stacked8 = None
        try:
            stacked8 = jnp.stack(
                [jnp.asarray(host_audio + np.float32(i) * 1e-6) for i in range(8)]
            )
            fbf = lambda b: _sb(params, b, bf_preset, Lb, None, "int16")  # noqa: E731
            _retry(lambda: np.asarray(fbf(stacked8)[..., :8]))
            per_bf = min(
                _timed(lambda r=r: np.asarray(
                    fbf(stacked8 + jnp.float32(r * 1e-7))[..., :8]
                ))
                for r in range(3)
            ) / 8
            detail["rtf_batched_bf16_vmap8"] = round(audio_sec / per_bf, 2)
            # fp32 vmap B=8 comparator under the same harness
            ff32 = lambda b: _sb(params, b, preset, Lb, None, "int16")  # noqa: E731
            _retry(lambda: np.asarray(ff32(stacked8)[..., :8]))
            per_f32 = min(
                _timed(lambda r=r: np.asarray(
                    ff32(stacked8 + jnp.float32(r * 1e-7))[..., :8]
                ))
                for r in range(3)
            ) / 8
            detail["rtf_batched_f32_vmap8"] = round(audio_sec / per_f32, 2)
        finally:
            _free(stacked8)

    _section("bf16", _sec_bf16)

    # ---- training throughput (SURVEY.md §3.5): the donated-buffer jitted
    # train step at the reference-parity batch (32 segments) and a
    # production batch (256) — audio-seconds of training data consumed per
    # wall-second. All train state is freed before the preset matrix runs
    # (VERDICT r3 #1a: r3 left ~1.7 GB of optimizer state live under it).
    def _sec_train():
        from convsep_tpu.train.loop import create_train_state, make_train_step

        train_detail: dict[str, object] = {}
        detail["train"] = train_detail
        rng_np = np.random.default_rng(seed)
        seg_sec = preset.train.time_context * preset.transform.hop_size / fs
        state = state16 = x = yt = None
        try:
            state, opt = create_train_state(preset, seed)
            train_step = make_train_step(preset, opt)
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
                _free(x, yt)
            _free(state)
            state = None
            # bf16 adadelta-state variant at the parity batch: the step is
            # HBM-bound on the accumulator streams, so narrowed state is
            # the one training knob left (measured 9.05 → 7.71 ms, loss
            # trajectory ≤2e-5 rel over 200 steps, 2026-08-19)
            p16 = dataclasses.replace(
                preset,
                train=dataclasses.replace(preset.train, optimizer_state_dtype="bfloat16"),
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
        finally:
            _free(state, state16, x, yt)

    _section("train", _sec_train, gate=matrix)

    # ---- full preset matrix (VERDICT r1 #9). The headline params and all
    # compiled headline executables are dropped first: the matrix presets
    # bring their own 0.6–1.4 GB param sets (VERDICT r3 #1a).
    def _sec_matrix():
        _free(params)
        jax.clear_caches()
        gc.collect()
        presets_out: dict[str, object] = {}
        detail["presets"] = presets_out
        preset_matrix(
            seconds=seconds,
            seed=seed,
            time_budget_s=time_budget_s,
            out=presets_out,
            emit=lambda: _emit("matrix"),
        )

    _section("matrix", _sec_matrix, gate=matrix)

    # ---- post link probe: quantifies in-run tunnel drift
    def _sec_post_probe():
        probe_post = link_probe()
        probe = detail.get("link_probe", {})
        probe["post_down4_mb_s"] = probe_post["down4_mb_s"]
        probe["post_up_mb_s"] = probe_post["up_mb_s"]
        detail["link_probe"] = probe

    _section("post-probe", _sec_post_probe)

    # ---- HBM watermark (VERDICT r3 #8): runs LAST — it intentionally
    # approaches OOM, so nothing may be measured after it.
    def _sec_watermark():
        detail["hbm_watermark"] = hbm_watermark(
            preset_name, seconds=seconds, seed=seed, deadline=deadline
        )

    _section("hbm-watermark", _sec_watermark, gate=matrix)

    _progress("done")
    _emit("final")
    return result
