"""Full-journey quality regression: synthetic dataset → compute-features →
train → fused separate → BSS Eval (+ ideal-mask oracle headroom).

The sandbox has no real corpora (README caveat), so this is the repeatable
stand-in for the reference's campaign loop: it proves the whole CLI journey
trains, separates, and evaluates end to end on the current backend, and
anchors the model SDR against the ideal-soft-mask oracle (VERDICT r1 #5).

    python tools/quality_loop.py --preset dsd100 --epochs 10 --out /tmp/ql

Prints one JSON line: per-stem model SDR/SIR, oracle SDR, headroom, and
the train-loss trajectory. Runs on whatever backend jax selects (TPU under
axon; force CPU with JAX_PLATFORMS=cpu for a smoke run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="dsd100")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--out", default="/tmp/convsep_quality")
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    ap.add_argument("--compute-dtype", default=None, choices=(None, "float32", "bfloat16"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--score-filter", default="comb", choices=("comb", "nmf"),
        help="score-informed presets only: extra-channel filter (comb|nmf)",
    )
    ap.add_argument(
        "--score-gate-mode", default="mult", choices=("mult", "blend"),
        help="mult = gate the model magnitudes; blend = convex combination "
        "reaching score-mask-only separation at g=1 (SepConfig.score_gate_mode)",
    )
    ap.add_argument(
        "--resume", action="store_true",
        help="restore the latest checkpoint in --out/run and skip already-"
        "trained epochs — lets gate/mode sweeps reuse one training",
    )
    ap.add_argument(
        "--conserve-ab", action="store_true",
        help="also separate the held-out track with conserve_last=True "
        "(masks sum to exactly 1; unclaimed TF energy to the LAST stem) and "
        "report both stems blocks - the SDR-neutrality gate for making "
        "complement-fetch the transfer default (VERDICT r4 #5)",
    )
    ap.add_argument(
        "--score-gate", default="0.0",
        help="score-gated resynthesis strength g in [0,1] at SEPARATION time "
        "(SepConfig.score_gate; 0 = input-channel conditioning only). "
        "Comma-separated values sweep the gate over ONE trained model — "
        "the gate is a separation-time knob, so a sweep costs one extra "
        "compile per value, not a retrain (VERDICT r4 #5 lever search)",
    )
    args = ap.parse_args()

    import numpy as np

    from convsep_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.io import write_wav
    from convsep_tpu.data.synth import sine_mixture
    from convsep_tpu.data.features import compute_features
    from convsep_tpu.data.pipeline import SegmentDataset
    from convsep_tpu.eval import bss_eval_sources, oracle_stems
    from convsep_tpu.separate import Separator
    from convsep_tpu.train.loop import Trainer

    preset = get_preset(args.preset)
    if args.compute_dtype:
        preset = dataclasses.replace(
            preset,
            model=dataclasses.replace(preset.model, compute_dtype=args.compute_dtype),
        )
    gates = [float(g) for g in str(args.score_gate).split(",")]
    preset = dataclasses.replace(
        preset,
        train=dataclasses.replace(
            preset.train,
            num_epochs=args.epochs,
            steps_per_dispatch=args.steps_per_dispatch,
            checkpoint_optimizer_state=False,
            checkpoint_every_epochs=max(1, args.epochs),
        ),
        sep=dataclasses.replace(
            preset.sep,
            score_gate=gates[0],
            score_gate_mode=args.score_gate_mode,
        ),
    )
    fs = preset.transform.fs
    S = preset.model.num_sources
    L = int(args.seconds * fs)
    # score-informed presets (bach10-class): note-based fixtures + aligned
    # annotations → score-filtered extra channels at train AND separate time
    score_informed = (
        preset.model.channels_in == 1 + S and not preset.transform.multires
    )

    # --- dataset: train tracks + one held-out test track -------------------
    audio_dir = os.path.join(args.out, "audio")
    for i in range(args.tracks + 1):  # last one is held out
        tdir = os.path.join(audio_dir, f"track{i}")
        os.makedirs(tdir, exist_ok=True)
        if score_informed:
            from convsep_tpu.data.synth import note_mixture

            stems, mix, notes = note_mixture(S, L, fs=fs, seed=args.seed + i)
            for name, src_notes in zip(preset.sources, notes):
                with open(os.path.join(tdir, f"{name}.notes.txt"), "w") as f:
                    for n in src_notes:
                        f.write(f"{n.start_sec} {n.end_sec} {n.pitch_midi}\n")
        else:
            stems, mix = sine_mixture(S, L, fs=fs, seed=args.seed + i)
        for name, stem in zip(preset.sources, stems):
            write_wav(os.path.join(tdir, f"{name}.wav"), fs, stem.astype(np.float32))
        write_wav(os.path.join(tdir, "mixture.wav"), fs, mix.astype(np.float32))
    held = os.path.join(audio_dir, f"track{args.tracks}")
    train_dir = os.path.join(args.out, "train_audio")
    os.makedirs(train_dir, exist_ok=True)
    for i in range(args.tracks):
        dst = os.path.join(train_dir, f"track{i}")
        if not os.path.exists(dst):
            os.symlink(os.path.join(audio_dir, f"track{i}"), dst)

    # --- features + training ----------------------------------------------
    feats = os.path.join(args.out, "feats")
    if not (args.resume and os.path.isdir(feats)):
        compute_features(
            train_dir, feats, preset,
            score_informed=score_informed, score_filter=args.score_filter,
        )
    ds = SegmentDataset(
        feats,
        preset.sources,
        time_context=preset.train.time_context,
        overlap=preset.train.overlap,
        mult_factor_in=preset.train.mult_factor_in,
        mult_factor_out=preset.train.mult_factor_out,
        extra_channels=(
            tuple(f"score_{s}" for s in preset.sources)
            if score_informed
            else tuple(f"res{size}" for size in preset.transform.multires)
        ),
    )
    trainer = Trainer(preset, workdir=os.path.join(args.out, "run"))
    if args.resume:
        trainer.restore()
    losses = trainer.fit(ds)

    # --- held-out separation + eval ---------------------------------------
    from convsep_tpu.data.io import read_wav

    _, mix = read_wav(os.path.join(held, "mixture.wav"))
    refs = np.stack(
        [read_wav(os.path.join(held, f"{s}.wav"))[1] for s in preset.sources]
    )
    extra = None
    if score_informed:
        from convsep_tpu.data.features import score_channels
        from convsep_tpu.dsp.transform import TransformFFT
        from convsep_tpu.score import parse_note_annotations

        mag = TransformFFT(preset.transform).compute_file(np.asarray(mix, np.float32))
        held_notes = [
            parse_note_annotations(os.path.join(held, f"{s}.notes.txt"))
            for s in preset.sources
        ]
        extra = score_channels(
            mag, held_notes, preset, args.score_filter
        ) * preset.train.mult_factor_in
    orc = oracle_stems(np.asarray(mix, np.float32)[: refs.shape[1]], refs, preset)
    osdr, _, _, _ = bss_eval_sources(refs, orc, flen=512)

    result = {
        "preset": args.preset,
        "score_filter": args.score_filter if score_informed else None,
        "compute_dtype": preset.model.compute_dtype,
        "epochs": args.epochs,
        "score_gate_mode": args.score_gate_mode if score_informed else None,
        "loss_first": round(float(losses[0]), 4) if losses else None,
        "loss_last": round(float(losses[-1]), 4) if losses else None,
    }
    for gate in gates if score_informed else gates[:1]:
        p = dataclasses.replace(
            preset, sep=dataclasses.replace(preset.sep, score_gate=gate)
        )
        ests = Separator(p, trainer.state.params)(
            np.asarray(mix, np.float32), extra=extra
        )[:, : refs.shape[1]]
        sdr, sir, _, _ = bss_eval_sources(refs, ests[:, : refs.shape[1]], flen=512)
        stems = {
            name: {
                "SDR": round(float(a), 2),
                "SIR": round(float(b), 2),
                "oracle_SDR": round(float(o), 2),
                "headroom_dB": round(float(o - a), 2),
            }
            for name, a, b, o in zip(preset.sources, sdr, sir, osdr)
        }
        if len(gates) == 1 or not score_informed:
            result["score_gate"] = gate if score_informed else None
            result["stems"] = stems
        else:
            result.setdefault("gate_sweep", {})[str(gate)] = stems
    if args.conserve_ab:
        ests_c = Separator(preset, trainer.state.params, conserve_last=True)(
            np.asarray(mix, np.float32), extra=extra
        )[:, : refs.shape[1]]
        sdr_c, sir_c, _, _ = bss_eval_sources(refs, ests_c, flen=512)
        result["stems_conserve_last"] = {
            name: {"SDR": round(float(a), 2), "SIR": round(float(b), 2)}
            for name, a, b in zip(preset.sources, sdr_c, sir_c)
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
