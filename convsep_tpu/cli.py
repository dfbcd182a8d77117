"""Command-line interface: compute-features | train | separate | evaluate | bench.

Replaces the reference's per-dataset example scripts (SURVEY.md §2.1
#5–#9) with one preset-driven CLI:

    convsep compute-features --preset dsd100 --audio-dir DSD100/Dev --out feats/
    convsep train            --preset dsd100 --features feats/ --workdir runs/d1
    convsep separate         --preset dsd100 --params runs/d1/checkpoints -i mix.wav -o stems/
    convsep separate         --preset ikala  --params model.pkl -i mix.wav -o stems/   # reference ckpt
    convsep evaluate         --ref-dir true_stems/ --est-dir stems/
    convsep bench            --preset dsd100 --seconds 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _cmd_compute_features(args) -> int:
    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.features import compute_features

    preset = get_preset(args.preset)
    tracks = compute_features(
        args.audio_dir,
        args.out,
        preset,
        score_informed=args.score_informed,
        layout=args.layout,
        augment=args.augment,
        score_filter=args.score_filter,
    )
    print(f"computed features for {len(tracks)} tracks -> {args.out}")
    return 0


def _cmd_train(args) -> int:
    import dataclasses

    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.pipeline import SegmentDataset
    from convsep_tpu.train.loop import Trainer

    preset = get_preset(args.preset)
    if args.epochs:
        preset = dataclasses.replace(
            preset, train=dataclasses.replace(preset.train, num_epochs=args.epochs)
        )
    if args.checkpoint_every_epochs:
        preset = dataclasses.replace(
            preset,
            train=dataclasses.replace(
                preset.train, checkpoint_every_epochs=args.checkpoint_every_epochs
            ),
        )
    if args.optimizer_impl:
        preset = dataclasses.replace(
            preset,
            train=dataclasses.replace(preset.train, optimizer_impl=args.optimizer_impl),
        )
    if args.optimizer_state_dtype:
        preset = dataclasses.replace(
            preset,
            train=dataclasses.replace(
                preset.train, optimizer_state_dtype=args.optimizer_state_dtype
            ),
        )
    if args.from_audio:
        from convsep_tpu.data.audio_dataset import AudioSegmentDataset, segment_samples

        seg = segment_samples(preset)
        ds = AudioSegmentDataset(
            args.features,
            preset.sources,
            seg,
            overlap_samples=seg // 3,
            fs=preset.transform.fs,
            # stereo-native presets (*-stereo) train on both channels jointly
            stereo=preset.model.decoder_reduce == "all",
        )
    else:
        if args.score_informed:
            extra = tuple(f"score_{s}" for s in preset.sources)
        elif preset.transform.multires:
            extra = tuple(f"res{size}" for size in preset.transform.multires)
        else:
            extra = ()
        ds = SegmentDataset(
            args.features,
            preset.sources,
            time_context=preset.train.time_context,
            overlap=preset.train.overlap,
            mult_factor_in=preset.train.mult_factor_in,
            mult_factor_out=preset.train.mult_factor_out,
            extra_channels=extra,
        )
    mesh = None
    if args.mesh_data > 1:
        from convsep_tpu.distributed import make_mesh

        mesh = make_mesh(data=args.mesh_data)
    trainer = Trainer(preset, workdir=args.workdir, mesh=mesh, from_audio=args.from_audio)
    if args.resume:
        step = trainer.restore()
        print(f"resumed from step {step}")
    val_ds = None
    if args.val_features:
        val_ds = SegmentDataset(
            args.val_features,
            preset.sources,
            time_context=preset.train.time_context,
            overlap=preset.train.overlap,
            mult_factor_in=preset.train.mult_factor_in,
            mult_factor_out=preset.train.mult_factor_out,
        )
    losses = trainer.fit(
        ds, tensorboard=args.tensorboard, use_grain=args.grain, val_dataset=val_ds
    )
    print(f"done; epoch losses: {[round(l, 6) for l in losses]}")
    return 0


def _load_params(path: str, preset, allow_unsafe: bool = False):
    """Load model params from an orbax checkpoint dir or a reference pickle."""
    if path.endswith((".pkl", ".pickle", ".param")):
        from convsep_tpu.ckpt.convert_reference import convert_reference_checkpoint

        return convert_reference_checkpoint(path, preset.model, allow_unsafe=allow_unsafe)
    from convsep_tpu.ckpt.orbax_io import CheckpointManager
    from convsep_tpu.train.loop import create_train_state

    state, _ = create_train_state(preset, 0)
    mgr = CheckpointManager(path)
    restored = mgr.restore_latest(state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    return restored[0].params


def _cmd_separate(args) -> int:
    import numpy as np

    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.io import read_wav, write_wav
    from convsep_tpu.separate import Separator

    import dataclasses

    preset = get_preset(args.preset)
    if getattr(args, "decoder_impl", None):
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(preset.model, decoder_impl=args.decoder_impl)
        )
    if args.wiener_p is not None:
        preset = dataclasses.replace(
            preset, sep=dataclasses.replace(preset.sep, wiener_p=args.wiener_p)
        )
    if getattr(args, "mask_dtype", None):
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(preset.model, mask_dtype=args.mask_dtype)
        )
    if getattr(args, "analysis", None):
        preset = dataclasses.replace(
            preset,
            transform=dataclasses.replace(preset.transform, analysis=args.analysis),
        )
    # mode applies unconditionally (a no-op at g=0) so `--score-gate-mode
    # blend` is honored even if a preset ever ships a nonzero default gate
    # (ADVICE r4)
    preset = dataclasses.replace(
        preset,
        sep=dataclasses.replace(
            preset.sep,
            score_gate=args.score_gate or preset.sep.score_gate,
            score_gate_mode=args.score_gate_mode,
        ),
    )
    params = _load_params(args.params, preset, allow_unsafe=args.unsafe_pickle)
    if args.online:
        # push/flush live-streaming mode (SURVEY.md §1 L5 — VERDICT r3 #6:
        # the one library capability that had no CLI verb)
        return _separate_online(args, preset, params)
    fs, audio = read_wav(args.input)
    if fs != preset.transform.fs:
        raise ValueError(f"{args.input}: fs {fs} != preset fs {preset.transform.fs}")
    if preset.model.decoder_reduce == "all":
        # stereo-native joint preset (*-stereo): one forward for both ears
        from convsep_tpu.separate.stereo import StereoSeparator

        if audio.ndim != 2:
            raise ValueError(f"preset {preset.name!r} needs a stereo input wav")
        if args.score:
            raise ValueError("score conditioning is not supported by stereo presets")
        if args.chunked:
            from convsep_tpu.separate import ChunkedSeparator

            ssep = ChunkedSeparator(
                preset, params, chunk_segments=args.chunk_segments,
                output_dtype="int16", input_dtype="int16",
                complement_last=args.complement_last,
            )
        else:
            ssep = StereoSeparator(
                preset, params, output_dtype="int16", input_dtype="int16",
                complement_last=args.complement_last,
            )
        stems = ssep(audio)  # (S, L, 2)
        os.makedirs(args.out, exist_ok=True)
        for name, stem in zip(preset.sources, stems):
            write_wav(os.path.join(args.out, f"{name}.wav"), fs, stem)
        print(f"wrote {len(preset.sources)} stereo stems -> {args.out}")
        return 0
    stereo = audio.ndim == 2 and args.stereo
    if audio.ndim == 2 and not stereo:
        audio = audio.mean(axis=1)
    extra = None
    if args.score:
        from convsep_tpu.data.features import score_channels
        from convsep_tpu.dsp.transform import TransformFFT
        from convsep_tpu.score import parse_note_annotations

        mag = TransformFFT(preset.transform).compute_file(np.asarray(audio))
        notes = [
            parse_note_annotations(os.path.join(args.score, f"{s}.notes.txt"))
            for s in preset.sources
        ]
        extra = score_channels(
            mag, notes, preset, getattr(args, "score_filter", "comb")
        ) * preset.train.mult_factor_in
    # stems quantized to PCM16 on device — the wav precision, half the transfer
    if args.chunked:
        from convsep_tpu.separate import ChunkedSeparator

        sep = ChunkedSeparator(
            preset, params, chunk_segments=args.chunk_segments,
            output_dtype="int16", input_dtype="int16",
            complement_last=args.complement_last,
        )
    else:
        sep = Separator(
            preset, params, output_dtype="int16", input_dtype="int16",
            complement_last=args.complement_last,
        )
    os.makedirs(args.out, exist_ok=True)
    if stereo:
        # per-channel separation through the same compiled program → stereo stems
        left = sep(audio[:, 0], extra=extra)
        right = sep(audio[:, 1], extra=extra)
        for i, name in enumerate(preset.sources):
            write_wav(
                os.path.join(args.out, f"{name}.wav"),
                fs,
                np.stack([left[i], right[i]], axis=1),
            )
    else:
        stems = sep(audio, extra=extra)
        for name, stem in zip(preset.sources, stems):
            write_wav(os.path.join(args.out, f"{name}.wav"), fs, stem)
    print(f"wrote {len(preset.sources)} stems -> {args.out}")
    return 0


def _separate_online(args, preset, params) -> int:
    """`convsep separate --online`: push/flush live-streaming separation.

    Reads the input wav (or raw mono PCM16 from stdin with `-i -`) in
    `--block-samples` blocks, pushes each block through OnlineSeparator,
    writes the emitted stems, and prints steady-state RTF plus
    algorithmic/processing latency as one JSON line (VERDICT r3 #6).
    """
    import time

    import numpy as np

    from convsep_tpu.data.io import read_wav, write_wav
    from convsep_tpu.separate.online import OnlineSeparator

    fs = preset.transform.fs
    stereo = preset.model.decoder_reduce == "all"
    stdin_mode = args.input == "-"
    audio = None
    if not stdin_mode:
        wav_fs, audio = read_wav(args.input)
        if wav_fs != fs:
            raise ValueError(f"{args.input}: fs {wav_fs} != preset fs {fs}")
        if stereo:
            if audio.ndim != 2:
                raise ValueError(f"preset {preset.name!r} needs a stereo input wav")
            audio = audio.T[:2]  # (2, L)
        elif audio.ndim == 2:
            audio = audio.mean(axis=1)
    elif stereo:
        raise ValueError("stdin streaming is mono PCM16 only")

    extra = None
    if args.score:
        if stdin_mode or stereo:
            raise ValueError("--score needs a mono wav input")
        from convsep_tpu.data.features import score_channels
        from convsep_tpu.dsp.transform import TransformFFT
        from convsep_tpu.score import parse_note_annotations

        mag = TransformFFT(preset.transform).compute_file(np.asarray(audio, np.float32))
        notes = [
            parse_note_annotations(os.path.join(args.score, f"{s}.notes.txt"))
            for s in preset.sources
        ]
        extra = score_channels(
            mag, notes, preset, getattr(args, "score_filter", "comb")
        ) * preset.train.mult_factor_in

    osep = OnlineSeparator(
        preset, params, chunk_segments=args.chunk_segments,
        output_dtype="int16", input_dtype="int16",
        complement_last=args.complement_last,
        max_pending=args.max_pending,
    )
    block = int(args.block_samples)

    def blocks():
        if stdin_mode:
            while True:
                raw = sys.stdin.buffer.read(block * 2)  # int16 mono
                if not raw:
                    return
                yield np.frombuffer(raw, np.int16)
        else:
            for p in range(0, audio.shape[-1], block):
                yield audio[..., p : p + block]

    outs, proc_ms = [], []
    pushed = 0
    first = True
    t0 = time.perf_counter()
    for blk in blocks():
        t1 = time.perf_counter()
        got = osep.push(blk, extra=extra if (first and extra is not None) else None)
        dt = time.perf_counter() - t1
        first = False
        pushed += blk.shape[-1]
        if got.shape[-1]:
            proc_ms.append(dt * 1e3)  # a push that completed >=1 chunk
            outs.append(got)
    outs.append(osep.flush())
    wall = time.perf_counter() - t0
    stems = np.concatenate(outs, axis=-1)

    os.makedirs(args.out, exist_ok=True)
    for name, stem in zip(preset.sources, stems):
        wav = stem.T if stereo else stem  # stereo stems (2, L) → (L, 2)
        write_wav(os.path.join(args.out, f"{name}.wav"), fs, wav)
    stats = {
        "mode": "online",
        "chunk_segments": args.chunk_segments,
        "pushed_samples": pushed,
        "rtf_steady": round(pushed / fs / wall, 2),
        "latency_algo_s": round(osep.latency_samples / fs, 4),
        "latency_proc_ms_median": (
            round(float(np.median(proc_ms)), 1) if proc_ms else None
        ),
        "stems": len(preset.sources),
        "out": args.out,
    }
    print(json.dumps(stats))
    return 0


def _cmd_separate_batch(args) -> int:
    """Stream every wav in a directory through mesh-sharded batched
    separation (BASELINE config #4)."""
    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.io import read_wav, write_wav
    from convsep_tpu.separate import StreamSeparator

    preset = get_preset(args.preset)
    if getattr(args, "decoder_impl", None):
        import dataclasses

        preset = dataclasses.replace(
            preset, model=dataclasses.replace(preset.model, decoder_impl=args.decoder_impl)
        )
    params = _load_params(args.params, preset, allow_unsafe=args.unsafe_pickle)
    mesh = None
    if args.mesh_data > 1:
        from convsep_tpu.distributed import make_mesh

        mesh = make_mesh(data=args.mesh_data)
    names = sorted(f for f in os.listdir(args.input_dir) if f.endswith(".wav"))
    if not names:
        raise FileNotFoundError(f"no wavs under {args.input_dir}")

    stereo = preset.model.decoder_reduce == "all"

    def tracks():
        for n in names:
            fs, audio = read_wav(os.path.join(args.input_dir, n))
            if fs != preset.transform.fs:
                raise ValueError(f"{n}: fs {fs} != preset fs {preset.transform.fs}")
            if stereo:  # joint-channel preset: keep both ears, (2, L)
                if audio.ndim != 2:
                    raise ValueError(f"{n}: stereo preset needs a stereo wav")
                yield audio.T[:2]
            else:
                yield audio.mean(axis=1) if audio.ndim == 2 else audio

    extras = None
    if getattr(args, "score_dir", None):
        # score-informed batch: per-track channels from
        # <score-dir>/<track>/<source>.notes.txt (same grid as the mixture)
        from convsep_tpu.data.features import score_channels
        from convsep_tpu.dsp.transform import TransformFFT

        t = TransformFFT(preset.transform)

        def extras_gen():
            import numpy as np

            from convsep_tpu.score import parse_note_annotations

            for n in names:
                fs, audio = read_wav(os.path.join(args.input_dir, n))
                if audio.ndim == 2:
                    audio = audio.mean(axis=1)
                mag = t.compute_file(np.asarray(audio, np.float32))
                sdir = os.path.join(args.score_dir, n[: -len(".wav")])
                notes = [
                    parse_note_annotations(os.path.join(sdir, f"{s}.notes.txt"))
                    for s in preset.sources
                ]
                yield score_channels(
                    mag, notes, preset, getattr(args, "score_filter", "comb")
                ) * preset.train.mult_factor_in

        extras = extras_gen()

    ss = StreamSeparator(
        preset, params, mesh=mesh, output_dtype="int16", input_dtype="int16",
        complement_last=getattr(args, "complement_last", False),
    )
    done = 0
    it = iter(names)
    for batch in ss.stream(tracks(), batch_size=args.batch_size, extras=extras):
        for stems in batch:
            name = next(it)[: -len(".wav")]
            outdir = os.path.join(args.out, name)
            os.makedirs(outdir, exist_ok=True)
            for sname, stem in zip(preset.sources, stems):
                # stereo stems arrive (2, L) → wav layout (L, 2)
                wav = stem.T if stereo else stem
                write_wav(os.path.join(outdir, f"{sname}.wav"), preset.transform.fs, wav)
            done += 1
    print(f"separated {done} tracks -> {args.out}")
    return 0


def _cmd_serve(args) -> int:
    """Watch-folder separation service (separate/service.py)."""
    from convsep_tpu.configs import get_preset
    from convsep_tpu.separate.service import WatchService

    preset = get_preset(args.preset)
    params = _load_params(args.params, preset, allow_unsafe=args.unsafe_pickle)
    mesh = None
    if args.mesh_data > 1:
        from convsep_tpu.distributed import make_mesh

        mesh = make_mesh(data=args.mesh_data)
    svc = WatchService(
        preset,
        params,
        args.input_dir,
        args.out,
        batch_size=args.batch_size,
        poll_s=args.poll,
        mesh=mesh,
        score_dir=args.score_dir,
        score_filter=args.score_filter,
    )
    print(f"serving {args.input_dir} -> {args.out} (ctrl-c to stop)")
    total = svc.run(
        max_sweeps=args.max_sweeps,
        on_sweep=lambda n: n and print(f"separated {n} tracks"),
    )
    print(f"served {total} tracks")
    return 0


def _cmd_evaluate(args) -> int:
    import numpy as np

    from convsep_tpu.data.io import read_wav
    from convsep_tpu.eval import (
        bss_eval_sources,
        bss_eval_stereo,
        bss_eval_windowed,
        oracle_stems,
    )

    names = sorted(
        f[:-4] for f in os.listdir(args.ref_dir) if f.endswith(".wav")
    )
    refs, ests = [], []
    fs = None
    stereo = args.stereo
    for n in names:
        fs, r = read_wav(os.path.join(args.ref_dir, n + ".wav"))
        _, e = read_wav(os.path.join(args.est_dir, n + ".wav"))
        L = min(len(r), len(e))
        if stereo:
            if r.ndim != 2 or e.ndim != 2:
                raise ValueError(f"{n}: --stereo needs stereo ref AND est wavs")
            refs.append(r[:L].T)  # (2, L)
            ests.append(e[:L].T)
        else:
            refs.append(r[:L] if r.ndim == 1 else r[:L].mean(1))
            ests.append(e[:L] if e.ndim == 1 else e[:L].mean(1))
    L = min(r.shape[-1] for r in refs)
    refs = np.stack([r[..., :L] for r in refs])  # (S, L) or (S, 2, L)
    ests = np.stack([e[..., :L] for e in ests])

    def _metric(r, e):
        if stereo:
            sdr, sir, sar = bss_eval_stereo(r, e, flen=args.flen)
            return sdr, sir, sar, None
        if args.windowed:
            w = bss_eval_windowed(r, e, fs, flen=args.flen)
            return w["SDR"], w["SIR"], w["SAR"], w["windows"]
        sdr, sir, sar, _ = bss_eval_sources(r, e, flen=args.flen)
        return sdr, sir, sar, None

    sdr, sir, sar, nwin = _metric(refs, ests)
    out = {
        n: {"SDR": round(float(a), 3), "SIR": round(float(b), 3), "SAR": round(float(c), 3)}
        for n, a, b, c in zip(names, sdr, sir, sar)
    }
    if nwin is not None:
        out["_windows"] = nwin
    if args.oracle:
        # ideal-soft-mask upper bound from the true stems + mixture
        from convsep_tpu.configs import get_preset

        if not args.mix or not args.preset:
            raise ValueError("--oracle needs --mix <mixture.wav> and --preset")
        preset = get_preset(args.preset)
        _, mix = read_wav(args.mix)
        mix = mix[..., :L] if mix.ndim == 1 else mix[:L].mean(1)
        r_mono = refs if not stereo else refs.mean(axis=1)
        orc = oracle_stems(mix[:L], r_mono, preset)
        osdr, osir, osar, onwin = _metric(
            r_mono if not stereo else refs,
            orc if not stereo else np.repeat(orc[:, None], 2, axis=1),
        )
        for n, a, b in zip(names, osdr, sdr):
            out[n]["oracle_SDR"] = round(float(a), 3)
            out[n]["headroom_dB"] = round(float(a) - float(b), 3)
    print(json.dumps(out, indent=2))
    return 0


def _cmd_convert(args) -> int:
    """Reference pickle → orbax checkpoint dir (step 0), or back (--export)."""
    import jax

    from convsep_tpu.configs import get_preset
    from convsep_tpu.ckpt.convert_reference import (
        convert_reference_checkpoint,
        export_reference_params,
    )
    from convsep_tpu.ckpt.orbax_io import CheckpointManager
    from convsep_tpu.train.loop import create_train_state

    preset = get_preset(args.preset)
    if args.export:
        import pickle

        params = _load_params(args.input, preset, allow_unsafe=args.unsafe_pickle)
        vals = export_reference_params(jax.tree.map(lambda a: a, params), preset.model)
        with open(args.out, "wb") as f:
            pickle.dump(vals, f, protocol=2)
        print(f"exported {len(vals)} reference arrays -> {args.out}")
        return 0
    import dataclasses as dc

    params = convert_reference_checkpoint(
        args.input, preset.model, allow_unsafe=args.unsafe_pickle
    )
    state, _ = create_train_state(preset, 0)
    state = dc.replace(state, params=jax.tree.map(jax.numpy.asarray, params))
    mgr = CheckpointManager(args.out)
    mgr.save(0, state)
    mgr.wait()
    print(f"converted {args.input} -> orbax checkpoint at {args.out} (step 0)")
    return 0


def _cmd_profile(args) -> int:
    """Capture a device trace of fused separation and print the hottest ops
    (SURVEY.md §5.1 — the workflow behind docs/PALLAS_PROFILE.md)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.synth import sine_mixture
    from convsep_tpu.models.convsep import ConvSep
    from convsep_tpu.separate.pipeline import bucket_length, separate_fused
    from convsep_tpu.utils import summarize_trace, trace

    preset = get_preset(args.preset)
    if args.decoder_impl:
        preset = dataclasses.replace(
            preset, model=dataclasses.replace(preset.model, decoder_impl=args.decoder_impl)
        )
    cfg = preset.model
    if args.input:
        from convsep_tpu.data.io import read_wav

        fs, audio = read_wav(args.input)
        if audio.ndim == 2:
            audio = audio.mean(axis=1)
    else:
        fs = preset.transform.fs
        _, audio = sine_mixture(cfg.num_sources, int(args.seconds * fs), fs=fs, seed=0)
    if cfg.channels_in > 1:
        raise ValueError("profile supports single-channel-input presets")
    params = _load_params(args.params, preset) if args.params else ConvSep(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    Lb = bucket_length(len(audio), preset)
    dev = jnp.asarray(np.pad(np.asarray(audio, np.float32), (0, Lb - len(audio))))
    stems = separate_fused(params, dev, None, preset, Lb, None, "int16")
    np.asarray(stems[..., :8])  # compile outside the trace
    with trace(args.logdir):
        stems = separate_fused(params, dev, None, preset, Lb, None, "int16")
        np.asarray(stems[..., :8])
    rows = summarize_trace(args.logdir, top=args.top)
    print(json.dumps(rows, indent=2))
    print(f"trace -> {args.logdir} (open with XProf/Perfetto)")
    return 0


def _cmd_bench(args) -> int:
    from convsep_tpu.benchmark import run_benchmark

    print(json.dumps(run_benchmark(args.preset, seconds=args.seconds, runs=args.runs, matrix=args.matrix)))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="convsep", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    cf = sub.add_parser("compute-features", help="dataset audio -> feature files")
    cf.add_argument("--preset", required=True)
    cf.add_argument("--audio-dir", required=True)
    cf.add_argument("--out", required=True)
    cf.add_argument("--score-informed", action="store_true")
    cf.add_argument(
        "--layout",
        default="trackdirs",
        choices=["trackdirs", "ikala-stereo"],
        help="trackdirs: <track>/<stem>.wav; ikala-stereo: flat stereo wavs (ch0 accomp, ch1 voice)",
    )
    cf.add_argument(
        "--augment", type=int, default=0,
        help="emit N augmented copies per track (note/audio time shifts + stretches)",
    )
    cf.add_argument(
        "--score-filter", default="comb", choices=["comb", "nmf"],
        help="score channel filter: harmonic-comb gating or score-constrained NMF refinement",
    )
    cf.set_defaults(fn=_cmd_compute_features)

    tr = sub.add_parser("train", help="train a separation model")
    tr.add_argument("--preset", required=True)
    tr.add_argument("--features", required=True)
    tr.add_argument("--workdir", required=True)
    tr.add_argument("--epochs", type=int, default=None)
    tr.add_argument("--resume", action="store_true")
    tr.add_argument("--score-informed", action="store_true")
    tr.add_argument("--mesh-data", type=int, default=1, help="data-parallel mesh size")
    tr.add_argument(
        "--optimizer-impl", default=None, choices=["xla", "fused"],
        help="adadelta update path: generic optax or the single-pass fused Pallas kernel",
    )
    tr.add_argument(
        "--optimizer-state-dtype", default=None, choices=["float32", "bfloat16"],
        help="adadelta accumulator storage dtype (bfloat16 halves the optimizer's HBM traffic; update math stays float32)",
    )
    tr.add_argument("--grain", action="store_true", help="use the grain data loader")
    tr.add_argument(
        "--from-audio",
        action="store_true",
        help="train straight from <track>/<stem>.wav dirs (STFT inside the train step; --features is the audio dir)",
    )
    tr.add_argument("--tensorboard", action="store_true")
    tr.add_argument(
        "--checkpoint-every-epochs", type=int, default=None,
        help="save cadence in epochs (default: preset; raise on slow links — a full-state save moves 100s of MB)",
    )
    tr.add_argument("--val-features", default=None, help="feature dir for per-epoch validation loss")
    tr.set_defaults(fn=_cmd_train)

    se = sub.add_parser("separate", help="separate a mixture wav into stems")
    se.add_argument("--preset", required=True)
    se.add_argument("--params", required=True, help="orbax ckpt dir or reference .pkl")
    se.add_argument("-i", "--input", required=True)
    se.add_argument("-o", "--out", required=True)
    se.add_argument("--score", default=None, help="dir with <source>.notes.txt for score-informed runs")
    se.add_argument(
        "--score-filter", default="comb", choices=["comb", "nmf"],
        help="score channel filter: harmonic-comb gating or score-constrained NMF refinement",
    )
    se.add_argument(
        "--score-gate", type=float, default=0.0,
        help="score-gated resynthesis strength g in [0,1]: multiply each source's magnitude estimate by (1-g)+g*score_mask before the Wiener mask (score-informed presets with --score only)",
    )
    se.add_argument(
        "--score-gate-mode", default="mult", choices=["mult", "blend"],
        help="how --score-gate combines model and score: mult = gate the model's magnitudes; blend = convex combination (1-g)*est + g*mask*|mix| whose g=1 end is score-mask-only separation",
    )
    se.add_argument("--stereo", action="store_true", help="separate channels independently → stereo stems (default: downmix to mono)")
    se.add_argument("--wiener-p", type=float, default=None, help="generalized Wiener exponent (default: preset, 1.0; 2.0 = classic Wiener)")
    se.add_argument("--mask-dtype", default=None, choices=("float32", "bfloat16"), help="decoder->Wiener mask-tail dtype override (bfloat16 halves the tail's HBM passes; mask ratio stays f32 - see ConvSepConfig.mask_dtype)")
    se.add_argument("--analysis", default=None, choices=("auto", "ct_pallas", "matmul"), help="forward-STFT routing override (TransformConfig.analysis; auto = the XLA factored chain, the measured winner)")
    se.add_argument("--chunked", action="store_true", help="stream the track in fixed-size chunks (overlapped transfers, track-length-independent compile)")
    se.add_argument("--online", action="store_true", help="push/flush live-streaming mode: read the input in --block-samples blocks, emit stems with bounded latency, print steady RTF + latency stats (use -i - for raw mono PCM16 on stdin)")
    se.add_argument("--block-samples", type=int, default=16384, help="push block size for --online (capture granularity)")
    se.add_argument("--chunk-segments", type=int, default=32, help="time-context windows per chunk for --chunked/--online (--online latency = chunk span + one window; lower = less latency, higher = more throughput)")
    se.add_argument("--complement-last", action="store_true", help="conservative masks (sum to exactly 1) + derive the LAST stem host-side as mixture - sum(others), skipping 1/S of the downloads (whole-track, --chunked, --online, and stereo paths)")
    se.add_argument("--max-pending", type=int, default=0, help="--online only: chunks allowed in flight across pushes (0 = strict latency, every finished chunk returns from its own push; >0 = serving mode, downloads overlap the next chunk's compute)")
    se.add_argument("--unsafe-pickle", action="store_true", help="allow arbitrary (unrestricted) pickle loading; only for trusted checkpoint files")
    se.add_argument("--decoder-impl", default=None, choices=("auto", "bandconv", "bandconv_pallas", "bandconv_nlast", "bandgemm", "band", "band_einsum", "fused", "conv", "conv_transpose", "band_pallas"), help="tied-decoder implementation override (default: preset; see docs/PALLAS_PROFILE.md)")
    se.set_defaults(fn=_cmd_separate)

    sb = sub.add_parser("separate-batch", help="stream a directory of wavs through batched separation")
    sb.add_argument("--preset", required=True)
    sb.add_argument("--params", required=True)
    sb.add_argument("--input-dir", required=True)
    sb.add_argument("-o", "--out", required=True)
    sb.add_argument("--batch-size", type=int, default=4)
    sb.add_argument("--mesh-data", type=int, default=1)
    sb.add_argument("--unsafe-pickle", action="store_true", help="allow arbitrary (unrestricted) pickle loading; only for trusted checkpoint files")
    sb.add_argument("--decoder-impl", default=None, choices=("auto", "bandconv", "bandconv_pallas", "bandconv_nlast", "bandgemm", "band", "band_einsum", "fused", "conv", "conv_transpose", "band_pallas"), help="tied-decoder implementation override (default: preset)")
    sb.add_argument("--score-dir", default=None, help="score-informed runs: dir with <track>/<source>.notes.txt per input wav")
    sb.add_argument("--score-filter", default="comb", choices=["comb", "nmf"], help="score channel filter (with --score-dir)")
    sb.add_argument("--complement-last", action="store_true", help="conservative masks + host-side derivation of the LAST stem: (S-1)/S of the download bytes")
    sb.set_defaults(fn=_cmd_separate_batch)

    sv = sub.add_parser("serve", help="watch a directory; separate wavs as they arrive")
    sv.add_argument("--preset", required=True)
    sv.add_argument("--params", required=True)
    sv.add_argument("--input-dir", required=True)
    sv.add_argument("-o", "--out", required=True)
    sv.add_argument("--batch-size", type=int, default=4)
    sv.add_argument("--poll", type=float, default=1.0, help="sweep interval seconds")
    sv.add_argument("--mesh-data", type=int, default=1)
    sv.add_argument("--max-sweeps", type=int, default=None, help="stop after N sweeps (default: run forever)")
    sv.add_argument("--unsafe-pickle", action="store_true")
    sv.add_argument("--score-dir", default=None, help="score-informed runs: dir with <track>/<source>.notes.txt per incoming wav")
    sv.add_argument("--score-filter", default="comb", choices=["comb", "nmf"], help="score channel filter (with --score-dir)")
    sv.set_defaults(fn=_cmd_serve)

    ev = sub.add_parser("evaluate", help="BSS Eval SDR/SIR/SAR of estimated stems")
    ev.add_argument("--ref-dir", required=True)
    ev.add_argument("--est-dir", required=True)
    ev.add_argument("--flen", type=int, default=512)
    ev.add_argument("--windowed", action="store_true", help="SiSEC-style 30 s windows at 15 s hop, median over windows")
    ev.add_argument("--stereo", action="store_true", help="evaluate (S, 2, L) stereo stems (channel-combined BSS Eval)")
    ev.add_argument("--oracle", action="store_true", help="also report the ideal-soft-mask oracle SDR + headroom (needs --mix and --preset)")
    ev.add_argument("--mix", default=None, help="mixture wav for --oracle")
    ev.add_argument("--preset", default=None, help="preset for --oracle transform settings")
    ev.set_defaults(fn=_cmd_evaluate)

    cv = sub.add_parser("convert", help="reference pickle <-> orbax checkpoint")
    cv.add_argument("--preset", required=True)
    cv.add_argument("--input", required=True, help=".pkl (import) or ckpt dir (--export)")
    cv.add_argument("--out", required=True)
    cv.add_argument("--export", action="store_true", help="orbax -> reference pickle")
    cv.add_argument("--unsafe-pickle", action="store_true", help="allow arbitrary (unrestricted) pickle loading; only for trusted checkpoint files")
    cv.set_defaults(fn=_cmd_convert)

    pr = sub.add_parser("profile", help="device-trace fused separation; print hottest ops")
    pr.add_argument("--preset", default="dsd100")
    pr.add_argument("--params", default=None, help="orbax ckpt dir or reference .pkl (default: random init)")
    pr.add_argument("-i", "--input", default=None, help="wav to profile (default: synthetic mixture)")
    pr.add_argument("--seconds", type=float, default=30.0)
    pr.add_argument("--logdir", default="/tmp/convsep_trace")
    pr.add_argument("--top", type=int, default=20)
    pr.add_argument("--decoder-impl", default=None, choices=("auto", "bandconv", "bandconv_pallas", "bandconv_nlast", "bandgemm", "band", "band_einsum", "fused", "conv", "conv_transpose", "band_pallas"))
    pr.set_defaults(fn=_cmd_profile)

    be = sub.add_parser("bench", help="RTF benchmark (one JSON line)")
    be.add_argument("--preset", default="dsd100")
    be.add_argument("--seconds", type=float, default=30.0)
    be.add_argument("--runs", type=int, default=5)
    be.add_argument(
        "--matrix",
        action=argparse.BooleanOptionalAction,
        default=False,
        help="also bench the whole preset matrix (driver bench.py turns this on)",
    )
    be.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    from convsep_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
