"""Long-horizon bf16 optimizer-state soak (VERDICT r4 #6 / ADVICE r3).

`optimizer_state_dtype="bfloat16"` halves adadelta's two accumulators in
HBM with all update arithmetic in f32; the documented risk is long-horizon
drift (an 8-bit mantissa absorbing tiny rho-decay updates). The 2000-step
unit test bounds short horizons — this soak runs BOTH dtypes >= 10k steps
from the SAME seed on the real backend and records:

  * the val-SDR anchor (ideal-soft-mask-oracle-normalized BSS Eval on a
    held-out mixture) every `--eval-every` steps, per dtype;
  * accumulator decay statistics (mean/quantiles of accu / delta_accu
    magnitudes) at the end, per dtype;
  * final param divergence between the two runs.

    python tools/soak_bf16_state.py --steps 10000 --out /tmp/soak_bf16

Prints one JSON line (the BASELINE.md row's source of truth).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="dsd100")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--eval-every", type=int, default=2000)
    ap.add_argument("--out", default="/tmp/convsep_soak_bf16")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--dtype", default="both",
        choices=("float32", "bfloat16", "both"),
        help="run one dtype (child mode: prints that run's JSON + saves "
        "final params) or 'both' (parent mode: one SUBPROCESS per dtype - "
        "the 10k-step run leaks host memory across fit/eval cycles on this "
        "runtime and a single both-dtype process was OOM-killed at 130 GB "
        "RSS, 2026-08-20)",
    )
    args = ap.parse_args()

    if args.dtype == "both":
        import json as _json
        import subprocess

        out = {"preset": args.preset, "steps": args.steps}
        for dt in ("float32", "bfloat16"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--preset", args.preset, "--steps", str(args.steps),
                 "--tracks", str(args.tracks), "--seconds", str(args.seconds),
                 "--eval-every", str(args.eval_every), "--out", args.out,
                 "--seed", str(args.seed), "--dtype", dt],
                capture_output=True, text=True, check=True,
            )
            out[dt] = _json.loads(r.stdout.strip().splitlines()[-1])[dt]
        import numpy as _np

        a = _np.load(os.path.join(args.out, "params_float32.npz"))
        b = _np.load(os.path.join(args.out, "params_bfloat16.npz"))
        rel = []
        for k in a.files:
            x, y = a[k].astype(_np.float64), b[k].astype(_np.float64)
            rel.append(float(_np.linalg.norm(x - y) / (_np.linalg.norm(x) + 1e-12)))
        out["param_rel_divergence_max"] = round(max(rel), 5)
        out["param_rel_divergence_mean"] = round(float(_np.mean(rel)), 5)
        print(_json.dumps(out))
        return 0

    import gc

    import numpy as np
    import jax

    from convsep_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.io import write_wav, read_wav
    from convsep_tpu.data.synth import sine_mixture
    from convsep_tpu.data.features import compute_features
    from convsep_tpu.data.pipeline import SegmentDataset
    from convsep_tpu.eval import bss_eval_sources
    from convsep_tpu.separate import Separator
    from convsep_tpu.train.loop import Trainer

    base = get_preset(args.preset)
    fs = base.transform.fs
    S = base.model.num_sources
    L = int(args.seconds * fs)

    # dataset: shared across both runs (features computed once)
    audio_dir = os.path.join(args.out, "audio")
    for i in range(args.tracks + 1):
        tdir = os.path.join(audio_dir, f"track{i}")
        os.makedirs(tdir, exist_ok=True)
        stems, mix = sine_mixture(S, L, fs=fs, seed=args.seed + i)
        for name, stem in zip(base.sources, stems):
            write_wav(os.path.join(tdir, f"{name}.wav"), fs, stem.astype(np.float32))
        write_wav(os.path.join(tdir, "mixture.wav"), fs, mix.astype(np.float32))
    held = os.path.join(audio_dir, f"track{args.tracks}")
    train_dir = os.path.join(args.out, "train_audio")
    os.makedirs(train_dir, exist_ok=True)
    for i in range(args.tracks):
        dst = os.path.join(train_dir, f"track{i}")
        if not os.path.exists(dst):
            os.symlink(os.path.join(audio_dir, f"track{i}"), dst)
    feats = os.path.join(args.out, "feats")
    if not os.path.isdir(feats):
        compute_features(train_dir, feats, base)

    _, mix = read_wav(os.path.join(held, "mixture.wav"))
    refs = np.stack(
        [read_wav(os.path.join(held, f"{s}.wav"))[1] for s in base.sources]
    )

    def run(dtype: str) -> dict:
        preset = dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, mask_dtype="float32"),
            train=dataclasses.replace(
                base.train,
                num_epochs=10 ** 9,  # bounded by max_steps below
                optimizer_state_dtype=dtype,
                checkpoint_every_epochs=10 ** 9,  # no checkpoint I/O noise
                checkpoint_every_steps=10 ** 9,
                steps_per_dispatch=8,
            ),
        )
        ds = SegmentDataset(
            feats, preset.sources,
            time_context=preset.train.time_context,
            overlap=preset.train.overlap,
            mult_factor_in=preset.train.mult_factor_in,
            mult_factor_out=preset.train.mult_factor_out,
        )
        trainer = Trainer(
            preset, workdir=os.path.join(args.out, f"run_{dtype}")
        )
        curve = {}
        target = 0
        while target < args.steps:
            target = min(target + args.eval_every, args.steps)
            trainer.fit(ds, max_steps=target)
            gc.collect()  # the 10k-step soak leaks host memory otherwise
            ests = Separator(preset, trainer.state.params)(
                np.asarray(mix, np.float32)
            )[:, : refs.shape[1]]
            sdr, _, _, _ = bss_eval_sources(refs, ests, flen=512)
            curve[str(int(trainer.state.step))] = [
                round(float(x), 3) for x in sdr
            ]
        # accumulator decay stats
        from convsep_tpu.train.optim import AdadeltaState

        def _find_ada(st):
            if isinstance(st, AdadeltaState):
                return st
            if isinstance(st, (tuple, list)):
                for x in st:
                    r = _find_ada(x)
                    if r is not None:
                        return r
            return None

        ada = _find_ada(trainer.state.opt_state)
        stats = {}
        for name, acc in (("accu", ada.accu), ("delta_accu", ada.delta_accu)):
            flat = np.concatenate([
                np.asarray(x, np.float64).ravel()
                for x in jax.tree.leaves(acc)
            ])
            stats[name] = {
                "dtype": str(jax.tree.leaves(acc)[0].dtype),
                "mean": float(flat.mean()),
                "q50": float(np.quantile(flat, 0.5)),
                "q99": float(np.quantile(flat, 0.99)),
                "frac_zero": float((flat == 0).mean()),
            }
        np.savez(
            os.path.join(args.out, f"params_{dtype}.npz"),
            **{str(i): np.asarray(x, np.float32)
               for i, x in enumerate(jax.tree.leaves(trainer.state.params))},
        )
        return {"curve": curve, "acc_stats": stats,
                "final_step": int(trainer.state.step)}

    dt = args.dtype
    print(json.dumps({"preset": args.preset, "steps": args.steps,
                      dt: run(dt)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
