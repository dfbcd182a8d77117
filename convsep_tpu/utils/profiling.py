"""Profiling / tracing harness (SURVEY.md §5.1).

The reference had nothing in-repo (Theano's profiler was the tool); here:
`trace(logdir)` wraps `jax.profiler.trace` for Perfetto/XProf captures, and
`timeit_fetch` measures steady-state wall time of a device function by
fetching its (fresh) outputs — on remote-tunnel runtimes
`block_until_ready` can be a no-op, so only a host fetch of a new output
object is a trustworthy barrier (verified 2026-08-16; see
.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace into `logdir` (view with XProf/Perfetto)."""
    with jax.profiler.trace(logdir):
        yield


def timeit_fetch(fn: Callable, *args, runs: int = 5, warmup: int = 1) -> dict:
    """Median steady-state seconds of `fn(*args)` including result fetch.

    `fn` must return jax array(s); every timed call fetches them to host
    (np.asarray on fresh output objects — no host-copy caching).
    """
    for _ in range(max(warmup, 1)):
        jax.tree.map(np.asarray, fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "median_s": float(np.median(times)),
        "min_s": float(np.min(times)),
        "all_s": [round(t, 5) for t in times],
    }


def summarize_trace(logdir: str, top: int = 20) -> list[dict]:
    """Parse a `trace(logdir)` capture → per-op device time summary.

    Reads the Perfetto JSON the TPU profiler writes and aggregates X-phase
    events on device lanes. Returns [{"name", "total_ms", "count"}],
    hottest first — enough to rank fusions without Perfetto/XProf UI
    access (the workflow used for every decoder optimization in
    docs/PALLAS_PROFILE.md).
    """
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    durs: dict = collections.Counter()
    cnt: dict = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            durs[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return [
        {"name": name, "total_ms": round(us / 1e3, 3), "count": cnt[name]}
        for name, us in durs.most_common(top)
    ]
