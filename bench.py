#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

RTF (audio-sec separated per wall-clock second per chip) for fused
whole-track 4-stem DSD100-config separation. vs_baseline is RTF / 100
(BASELINE.md operational target: >100x real time per chip → vs_baseline>1).
"""

import json
import sys


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="dsd100")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--time-budget", type=float, default=2400.0,
                    help="matrix compile budget (raise for cache-warming runs)")
    args = ap.parse_args()

    from convsep_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from convsep_tpu.benchmark import run_benchmark

    result = run_benchmark(
        args.preset, seconds=args.seconds, runs=args.runs, matrix=True,
        time_budget_s=args.time_budget,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
