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


def test_checkpoint_watchdog_falls_back_to_sync(tmp_path):
    """An async save that wedges past the timeout triggers the watchdog:
    warning surfaced, manager rebuilt synchronous, training data safe
    (VERDICT r1 #6 / ROADMAP r1 #8)."""
    import time

    import numpy as np

    from convsep_tpu.ckpt.orbax_io import CheckpointManager

    warnings = []
    mgr = CheckpointManager(
        str(tmp_path / "ck"), async_save=True, async_timeout_s=0.5,
        on_warning=warnings.append,
    )
    state = {"step": np.asarray(1), "w": np.arange(4, dtype=np.float32)}
    mgr.save(1, state, extra={"epoch": 0})
    # inject a wedge: the next save's pre-wait hangs far past the timeout
    mgr._mgr.wait_until_finished = lambda: time.sleep(60)
    state2 = {"step": np.asarray(2), "w": np.arange(4, dtype=np.float32) * 2}
    mgr.save(2, state2, extra={"epoch": 0, "batch_in_epoch": 2})
    assert mgr.fell_back_to_sync and warnings and "SYNCHRONOUS" in warnings[0]
    assert mgr.wait(timeout=30.0)  # sync manager: nothing outstanding
    restored, meta = mgr.restore_latest(state)
    assert int(restored["step"]) == 2 and meta["batch_in_epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state2["w"]))


def test_fetch_parallel_matches_asarray():
    import numpy as np
    import jax.numpy as jnp

    from convsep_tpu.utils import fetch_parallel

    x = jnp.arange(4 * 5 * 6, dtype=jnp.float32).reshape(4, 5, 6) * 0.5
    np.testing.assert_array_equal(fetch_parallel(x), np.asarray(x))
    y = jnp.arange(7, dtype=jnp.int16)[None]  # single row: plain asarray path
    np.testing.assert_array_equal(fetch_parallel(y), np.asarray(y))
