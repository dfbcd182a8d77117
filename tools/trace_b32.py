"""Fresh b32 device trace of a 4096-pt preset with both mega-kernels engaged.

VERDICT r4 #1/#2: re-trace highres4096 b32 with the fused Mosaic decode
AND the Wiener+iSTFT mega-kernel in the program, and rank the remaining
XLA passes — the input to the decode-epilogue phase-merge design.

Usage: python tools/trace_b32.py [preset] [batch] [logdir]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from convsep_tpu.configs.presets import get_preset
from convsep_tpu.data.synth import sine_mixture
from convsep_tpu.models.convsep import ConvSep, prepare_inference, resolve_decoder_impl
from convsep_tpu.separate.pipeline import bucket_length
from convsep_tpu.separate.stream import separate_batch
from convsep_tpu.utils.profiling import summarize_trace, trace


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "highres4096"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    logdir = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/prof_{name}_b{batch}_r5"
    preset = get_preset(name)
    cfg = preset.model
    fs = preset.transform.fs
    L = int(30.0 * fs)
    _, mix = sine_mixture(cfg.num_sources, L, fs=fs, seed=0)
    Lb = bucket_length(L, preset)
    host = np.pad(mix, (0, Lb - L)).astype(np.float32)

    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    params = prepare_inference(cfg, params)
    print("decoder:", resolve_decoder_impl(cfg), flush=True)
    from convsep_tpu.dsp.dft import resolve_masked_synthesis

    t = preset.transform
    print(
        "masked_synthesis:",
        resolve_masked_synthesis(
            t.masked_synthesis, t.nfft or t.frame_size, t.frame_size,
            t.hop_size, preset.sep.wiener_p,
        ),
        flush=True,
    )

    stacked = jnp.stack(
        [jnp.asarray(host + np.float32(i) * 1e-6) for i in range(batch)]
    )
    fb = lambda b: separate_batch(params, b, preset, Lb, None, "int16")  # noqa: E731
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    np.asarray(fb(stacked)[..., :8])
    print(f"compiled+ran in {time.perf_counter() - t0:.1f}s", flush=True)
    # steady state timing (min of 3)
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        np.asarray(fb(stacked + jnp.float32(r * 1e-7))[..., :8])
        times.append(time.perf_counter() - t0)
    per = min(times) / batch
    print(
        f"b{batch}: {min(times)*1e3:.1f} ms/dispatch = {per*1e3:.2f} ms/track "
        f"(RTF {Lb / fs / per:.0f}x)",
        flush=True,
    )
    with trace(logdir):
        np.asarray(fb(stacked + jnp.float32(7e-7))[..., :8])
    print(f"trace -> {logdir}", flush=True)
    for row in summarize_trace(logdir, top=40):
        print(f"{row['total_ms']:9.2f} ms  x{row['count']:<4d} {row['name'][:90]}")


if __name__ == "__main__":
    main()
