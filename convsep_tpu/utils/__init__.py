"""Shared utilities: profiling/tracing helpers, compilation cache."""

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (XLA compiles of the big
    fused programs take minutes on remote-compile runtimes; the cache makes
    them once-per-machine instead of once-per-process). Called by the CLI,
    bench.py, and the driver entry points."""
    import jax

    path = path or os.environ.get(
        "CONVSEP_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".convsep_jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


from convsep_tpu.utils.flops import (  # noqa: E402
    device_peak_tflops,
    mfu,
    model_flops_per_segment,
    pipeline_flops_per_track,
)
from convsep_tpu.utils.pcm import quantize_pcm16, quantize_pcm16_host  # noqa: E402
from convsep_tpu.utils.profiling import trace, timeit_fetch, summarize_trace  # noqa: E402
from convsep_tpu.utils.transfer import fetch_parallel  # noqa: E402

__all__ = [
    "trace",
    "timeit_fetch",
    "enable_compilation_cache",
    "fetch_parallel",
    "summarize_trace",
    "device_peak_tflops",
    "mfu",
    "model_flops_per_segment",
    "pipeline_flops_per_track",
    "quantize_pcm16",
    "quantize_pcm16_host",
]
