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


def test_flop_accounting():
    """Analytic FLOP model (VERDICT r1 #4): hand-checked totals for a tiny
    config + invariants on the real presets."""
    import dataclasses

    import numpy as np

    from convsep_tpu.configs import get_preset
    from convsep_tpu.utils import mfu, model_flops_per_segment, pipeline_flops_per_track

    p = get_preset("dsd100")
    seg = model_flops_per_segment(p.model)
    m = p.model
    # hand-computed cross-check of the two dominant terms (bandconv default)
    assert seg["fc_expand"] == 2 * m.bottleneck * m.num_sources * m.enc_flat
    ktaps = -(-m.conv1_freq // m.conv1_freq_stride)
    W_pad = -(-m.enc_freq // 8) * 8
    assert seg["decode_bandconv"] == (
        m.num_sources
        * 2
        * (W_pad + ktaps - 1)
        * (ktaps * m.enc_time * m.conv2_filters)
        * (m.time_context * m.conv1_freq_stride * m.channels_in)
    )
    assert seg["total"] == sum(v for k, v in seg.items() if k != "total")

    # the band (non-composed) decoder counts its GEMM + freq conv instead
    mb = dataclasses.replace(m, decoder_impl="band")
    segb = model_flops_per_segment(mb)
    assert segb["decode_band_gemm"] == (
        m.num_sources
        * 2
        * m.enc_freq
        * (m.enc_time * m.conv2_filters)
        * (m.time_context * m.conv1_filters)
    )
    assert "decode_bandconv" not in segb

    fl = pipeline_flops_per_track(p, int(33.4 * 44100))
    assert fl["total"] == fl["dft_forward"] + fl["dft_inverse"] + fl["model"]
    assert 0.1e12 < fl["total"] < 1e12  # ~0.22 TFLOP/track

    # stereo preset doubles the DFT work, not the model work
    ps = get_preset("dsd100-stereo")
    fls = pipeline_flops_per_track(ps, int(33.4 * 44100))
    assert fls["dft_forward"] == 2 * fl["dft_forward"]

    r = mfu(p, int(33.4 * 44100), 0.0074, "TPU v5 lite")
    assert r["peak_bf16_tflops"] == 197.0
    assert 0.0 < r["mfu_bf16"] < 1.0
    np.testing.assert_allclose(r["tflops"], fl["total"] / 0.0074 / 1e12, rtol=0.01)
