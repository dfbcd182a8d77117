"""Benchmark harness: RTF (audio-seconds separated per wall-second per chip).

The headline metric (BASELINE.md): full-track 4-stem DSD100-config
separation through the fused STFT→CNN→mask→iSTFT program, target >100×
real time per TPU chip. Timing excludes compile (first call) and uses
jax.block_until_ready (SURVEY.md §5.1).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.configs import get_preset
from convsep_tpu.data.synth import sine_mixture
from convsep_tpu.models.convsep import ConvSep
from convsep_tpu.separate.pipeline import Separator, bucket_length


def run_benchmark(
    preset_name: str = "dsd100",
    seconds: float = 30.0,
    runs: int = 5,
    seed: int = 0,
) -> dict:
    preset = get_preset(preset_name)
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    fs = preset.transform.fs
    L = int(seconds * fs)
    _, mix = sine_mixture(cfg.num_sources, L, fs=fs, seed=seed)
    if cfg.channels_in > 1:
        raise ValueError("benchmark presets must be single-channel input")
    sep = Separator(preset, params)

    t0 = time.perf_counter()
    out = sep(mix)  # includes compile
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = sep(mix)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    audio_sec = bucket_length(L, preset) / fs  # work actually performed
    rtf = audio_sec / med
    return {
        "metric": f"RTF audio-sec/sec/chip ({preset_name} {cfg.num_sources}-stem fused separation)",
        "value": round(rtf, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 100.0, 3),  # target: >100x (BASELINE.md)
        "detail": {
            "preset": preset_name,
            "track_seconds": seconds,
            "bucketed_seconds": audio_sec,
            "median_run_s": med,
            "all_runs_s": [round(t, 4) for t in times],
            "compile_plus_first_run_s": round(compile_s, 2),
            "device": str(jax.devices()[0]),
            "n_stems": cfg.num_sources,
            "finite": bool(np.isfinite(out).all()),
        },
    }
