"""Profiling utility tests."""

import os

import jax.numpy as jnp

from convsep_tpu.utils import timeit_fetch, trace, enable_compilation_cache


def test_timeit_fetch_returns_stats():
    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    stats = timeit_fetch(f, jnp.ones((64, 64)), runs=3)
    assert set(stats) == {"median_s", "min_s", "all_s"}
    assert stats["min_s"] <= stats["median_s"]
    assert len(stats["all_s"]) == 3


def test_trace_writes_files(tmp_path):
    import jax

    d = str(tmp_path / "trace")
    with trace(d):
        jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()
    assert os.path.isdir(d) and os.listdir(d)


def test_enable_compilation_cache(tmp_path):
    p = enable_compilation_cache(str(tmp_path / "cache"))
    assert os.path.isdir(p)


def test_benchmark_rejects_multichannel_preset():
    import pytest

    from convsep_tpu.benchmark import run_benchmark

    with pytest.raises(ValueError, match="single-channel"):
        run_benchmark("bach10", seconds=0.1, runs=1)
