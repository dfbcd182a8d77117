"""Training soak with a mid-run kill + resume (VERDICT r2 #8).

Drives the REAL CLI journey as subprocesses — compute-features → train
(grain loader) → SIGKILL mid-run → train --resume → completion — then
verifies, post-hoc and in-process:

  * metrics.jsonl continuity: exactly one step regression at the kill
    boundary, equal to the resume-from checkpoint step (the re-trained
    steps between the last checkpoint and the kill are expected — that is
    what checkpoint-granular recovery means);
  * a val-SDR curve via the ideal-soft-mask oracle anchor: every
    checkpoint the run produced is copied aside as it lands (orbax's
    atomic rename means a bare numeric step dir is complete) and evaluated
    on a held-out mixture after the fact;
  * checkpoint cadence under the slow link: full-state saves move 100s of
    MB over a ~30 MB/s tunnel, so the soak exercises the documented
    guidance (--checkpoint-every-epochs above 1) plus the step-based
    cadence (checkpoint_every_steps=500 from the preset).

The reference's failure story was "rerun the epoch from the last pickle"
(SURVEY.md §5.3/§5.4); this validates the stronger contract the repo
ships: mid-epoch resume with the grain iterator state riding in the
checkpoint.

    python tools/soak.py --out /tmp/soak --tracks 8 --seconds 30 \
        --epochs 32 --kill-after-step 1100

Prints one JSON line with the verdicts and the curves.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_metrics(path: str) -> list[dict]:
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    return rows


def _last_step(path: str) -> int:
    rows = _read_metrics(path)
    return max((r.get("step", 0) for r in rows), default=0)


def _snapshot_checkpoints(ckpt_dir: str, aside: str, seen: set[int]) -> list[int]:
    """Copy completed (bare-numeric, atomically renamed) step dirs aside."""
    new = []
    if not os.path.isdir(ckpt_dir):
        return new
    for name in os.listdir(ckpt_dir):
        if name.isdigit() and int(name) not in seen:
            step = int(name)
            dst = os.path.join(aside, name, name)  # one manager dir per step
            try:
                shutil.copytree(os.path.join(ckpt_dir, name), dst)
            except (FileNotFoundError, shutil.Error):
                continue  # racing a delete (max_to_keep) — skip, not fatal
            seen.add(step)
            new.append(step)
    return new


def _run_train_phase(
    cmd: list[str],
    metrics_path: str,
    ckpt_dir: str,
    aside: str,
    seen: set[int],
    kill_after_step: int | None,
    timeout_s: float,
    log,
    stdout_path: str,
) -> dict:
    """Run one `convsep train` subprocess; optionally SIGKILL it once
    metrics.jsonl crosses `kill_after_step`. Returns phase facts."""
    t0 = time.time()
    out_f = open(stdout_path, "w")  # file, not PIPE: a long phase must
    proc = subprocess.Popen(        # never block on an unread pipe buffer
        cmd, stdout=out_f, stderr=subprocess.STDOUT, text=True
    )
    killed_at = None
    while True:
        rc = proc.poll()
        _snapshot_checkpoints(ckpt_dir, aside, seen)
        if rc is not None:
            break
        if time.time() - t0 > timeout_s:
            proc.kill()
            proc.wait()
            raise TimeoutError(f"phase exceeded {timeout_s}s: {cmd}")
        step = _last_step(metrics_path)
        if kill_after_step is not None and step >= kill_after_step:
            killed_at = step
            proc.send_signal(signal.SIGKILL)  # hard crash, no cleanup
            proc.wait()
            log(f"  SIGKILL at logged step {step}")
            break
        time.sleep(2.0)
    out_f.close()
    _snapshot_checkpoints(ckpt_dir, aside, seen)
    stdout_text = open(stdout_path).read()
    resumed_from = None
    for line in stdout_text.splitlines():
        if line.startswith("resumed from step "):
            resumed_from = int(line.rsplit(" ", 1)[1])
    return {
        "rc": proc.returncode,
        "killed_at_logged_step": killed_at,
        "wall_s": round(time.time() - t0, 1),
        "stdout_tail": stdout_text.splitlines()[-5:],
        "resumed_from": resumed_from,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="dsd100")
    ap.add_argument("--out", default="/tmp/convsep_soak")
    ap.add_argument("--tracks", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--epochs", type=int, default=32)
    ap.add_argument("--kill-after-step", type=int, default=1100)
    ap.add_argument("--checkpoint-every-epochs", type=int, default=8)
    ap.add_argument("--phase-timeout-s", type=float, default=5400.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    def log(msg: str) -> None:
        print(msg, flush=True)

    import numpy as np

    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.io import read_wav, write_wav
    from convsep_tpu.data.synth import sine_mixture

    preset = get_preset(args.preset)
    fs = preset.transform.fs
    S = preset.model.num_sources
    L = int(args.seconds * fs)

    # --- dataset: train tracks + 1 val track + 1 held-out test track -------
    audio = os.path.join(args.out, "audio")
    roles = [f"track{i}" for i in range(args.tracks)] + ["val", "held"]
    for i, name in enumerate(roles):
        tdir = os.path.join(audio, name)
        os.makedirs(tdir, exist_ok=True)
        stems, mix = sine_mixture(S, L, fs=fs, seed=args.seed + i)
        for sname, stem in zip(preset.sources, stems):
            write_wav(os.path.join(tdir, f"{sname}.wav"), fs, stem.astype(np.float32))
        write_wav(os.path.join(tdir, "mixture.wav"), fs, mix.astype(np.float32))
    train_audio = os.path.join(args.out, "train_audio")
    val_audio = os.path.join(args.out, "val_audio")
    for d, names in ((train_audio, roles[: args.tracks]), (val_audio, ["val"])):
        os.makedirs(d, exist_ok=True)
        for n in names:
            dst = os.path.join(d, n)
            if not os.path.exists(dst):
                os.symlink(os.path.join(audio, n), dst)

    cli = [sys.executable, "-m", "convsep_tpu.cli"]
    feats = os.path.join(args.out, "feats")
    val_feats = os.path.join(args.out, "val_feats")
    log(f"soak: computing features for {args.tracks} train + 1 val tracks")
    for src, dst in ((train_audio, feats), (val_audio, val_feats)):
        subprocess.run(
            cli + ["compute-features", "--preset", args.preset,
                   "--audio-dir", src, "--out", dst],
            check=True, capture_output=True, text=True,
        )

    workdir = os.path.join(args.out, "run")
    metrics_path = os.path.join(workdir, "metrics.jsonl")
    ckpt_dir = os.path.join(workdir, "checkpoints")
    aside = os.path.join(args.out, "ckpts_aside")
    os.makedirs(aside, exist_ok=True)
    seen: set[int] = set()

    train_cmd = cli + [
        "train", "--preset", args.preset, "--features", feats,
        "--workdir", workdir, "--grain", "--epochs", str(args.epochs),
        "--val-features", val_feats,
        "--checkpoint-every-epochs", str(args.checkpoint_every_epochs),
    ]

    log(f"soak phase A: train to logged step >= {args.kill_after_step}, then SIGKILL")
    phase_a = _run_train_phase(
        train_cmd, metrics_path, ckpt_dir, aside, seen,
        kill_after_step=args.kill_after_step,
        timeout_s=args.phase_timeout_s, log=log,
        stdout_path=os.path.join(args.out, "phase_a.log"),
    )
    rows_a = _read_metrics(metrics_path)
    n_rows_a = len(rows_a)
    ckpts_at_kill = sorted(seen)
    log(f"  phase A: {n_rows_a} metric rows, checkpoints seen {ckpts_at_kill}")

    log("soak phase B: --resume to completion")
    phase_b = _run_train_phase(
        train_cmd + ["--resume"], metrics_path, ckpt_dir, aside, seen,
        kill_after_step=None, timeout_s=args.phase_timeout_s, log=log,
        stdout_path=os.path.join(args.out, "phase_b.log"),
    )
    # the step the resume ACTUALLY restored (printed by the CLI) — the
    # aside snapshot can race an async orbax commit at kill time
    resume_from = phase_b["resumed_from"] or 0
    rows = _read_metrics(metrics_path)
    rows_b = rows[n_rows_a:]

    # --- continuity verification -------------------------------------------
    # within each phase steps must be non-decreasing; across the kill
    # boundary there must be EXACTLY ONE regression, back to the
    # checkpoint the resume restored (post-checkpoint steps re-run).
    def _monotone(rs: list[dict]) -> bool:
        steps = [r["step"] for r in rs]
        return all(b >= a for a, b in zip(steps, steps[1:]))

    first_b_step = rows_b[0]["step"] if rows_b else None
    continuity = {
        "phase_a_monotone": _monotone(rows_a),
        "phase_b_monotone": _monotone(rows_b),
        "kill_logged_step": phase_a["killed_at_logged_step"],
        "resume_checkpoint_step": resume_from,
        "first_logged_step_after_resume": first_b_step,
        "resume_restarts_at_checkpoint": (
            first_b_step is not None
            # a real mid-run checkpoint must have been restored (not a
            # silent from-scratch restart) and logging must pick up just
            # past it
            and resume_from > 0
            and resume_from < first_b_step <= resume_from + 2 * max(
                preset.train.log_every_steps, 1)
        ),
        "final_step": rows[-1]["step"] if rows else 0,
    }
    ok = (
        continuity["phase_a_monotone"]
        and continuity["phase_b_monotone"]
        and continuity["resume_restarts_at_checkpoint"]
        and phase_b["rc"] == 0
    )

    # per-epoch val-loss curve (both phases; the resumed epoch re-reports)
    val_curve = [
        (r["epoch"], round(r["val_loss"], 4)) for r in rows if "val_loss" in r
    ]

    # --- val-SDR curve from the aside-copied checkpoints -------------------
    log(f"soak eval: val-SDR at checkpoints {sorted(seen)} + oracle anchor")
    import dataclasses

    from convsep_tpu.ckpt.orbax_io import CheckpointManager
    from convsep_tpu.eval import bss_eval_sources, oracle_stems
    from convsep_tpu.separate import Separator
    from convsep_tpu.train.loop import create_train_state

    held = os.path.join(audio, "held")
    _, mix = read_wav(os.path.join(held, "mixture.wav"))
    refs = np.stack(
        [read_wav(os.path.join(held, f"{s}.wav"))[1] for s in preset.sources]
    )
    mix = np.asarray(mix, np.float32)

    state, _ = create_train_state(preset, preset.train.seed)
    sdr_curve = []
    sep = None
    for step in sorted(seen):
        mgr = CheckpointManager(os.path.join(aside, str(step)), async_save=False)
        restored = mgr.restore_latest(
            state if preset.train.checkpoint_optimizer_state
            else {"step": state.step, "params": state.params}
        )
        mgr.close()
        if restored is None:
            continue
        st, _meta = restored
        params = st.params if hasattr(st, "params") else st["params"]
        sep = Separator(preset, params)  # jit cache keys on shapes, not params
        ests = sep(mix)[:, : refs.shape[1]]
        sdr, _sir, _sar, _ = bss_eval_sources(refs, ests, flen=512)
        sdr_curve.append(
            {"step": step, "sdr": [round(float(x), 2) for x in sdr]}
        )
        log(f"  step {step}: SDR {sdr_curve[-1]['sdr']}")
    orc = oracle_stems(mix[: refs.shape[1]], refs, preset)
    osdr, _, _, _ = bss_eval_sources(refs, orc, flen=512)

    result = {
        "ok": bool(ok),
        "preset": args.preset,
        "epochs": args.epochs,
        "steps_final": continuity["final_step"],
        "phase_a": {k: phase_a[k] for k in ("killed_at_logged_step", "wall_s")},
        "phase_b": {k: phase_b[k] for k in ("rc", "wall_s", "resumed_from")},
        "continuity": continuity,
        "loss_first": next(
            (round(r["loss"], 4) for r in rows if "loss" in r), None
        ),
        "loss_last_epoch": next(
            (round(r["epoch_loss"], 4) for r in reversed(rows) if "epoch_loss" in r),
            None,
        ),
        "val_loss_curve": val_curve,
        "val_sdr_curve": sdr_curve,
        "oracle_sdr": [round(float(x), 2) for x in osdr],
        "stems": list(preset.sources),
    }
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
