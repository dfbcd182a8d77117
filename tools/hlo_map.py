"""Dump the optimized HLO of the b32 batched program and map hot op names
(from tools/trace_b32.py output) to shapes + source metadata."""

from __future__ import annotations

import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

from convsep_tpu.configs.presets import get_preset
from convsep_tpu.models.convsep import ConvSep, prepare_inference
from convsep_tpu.separate.pipeline import bucket_length, separate_fused_batch


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "highres4096"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ops = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "while.1", "dynamic-update-slice.2", "copy.111", "copy.112",
        "copy.113", "copy.114", "copy.116", "copy.130", "slice.25",
        "slice.26", "pad.18", "reshape.25", "reshape.46", "reshape.82",
        "multiply_add_fusion", "maximum_bitcast_fusion",
        "pad_bitcast_fusion", "maximum_multiply_fusion", "fusion.1",
        "fusion.2", "copy.110", "copy.90", "copy.94", "reshape.0",
        "fusion.32", "reshape.85",
    ]
    preset = get_preset(name)
    cfg = preset.model
    Lb = bucket_length(int(30.0 * preset.transform.fs), preset)
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    params = prepare_inference(cfg, params)
    tracks = jnp.zeros((batch, Lb), jnp.float32)
    lowered = jax.jit(
        lambda p, b: separate_fused_batch(p, b, None, preset, Lb, None, "int16")
    ).lower(params, tracks)
    txt = lowered.compile().as_text()
    out = f"/tmp/hlo_{name}_b{batch}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"HLO -> {out} ({len(txt)} bytes)", flush=True)
    for op in ops:
        pat = re.compile(rf"^\s*%?{re.escape(op)}\s*=\s*(.*)$", re.M)
        m = pat.search(txt)
        if not m:
            print(f"{op}: NOT FOUND")
            continue
        line = m.group(1)
        meta = ""
        mm = re.search(r'metadata=\{[^}]*op_name="([^"]*)"[^}]*\}', line)
        if mm:
            meta = mm.group(1)
        head = line.split(" metadata=")[0]
        print(f"{op}:\n  {head[:260]}\n  op_name: {meta[:200]}")


if __name__ == "__main__":
    main()
