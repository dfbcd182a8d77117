"""Full CLI user journey on the CPU mesh with an injected tiny preset.

compute-features → train → separate (orbax ckpt AND reference pickle) →
evaluate → bench all through `convsep_tpu.cli.main` — the reference's five
example-script workflows (SURVEY.md §3.1–3.3) as one tested path.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from convsep_tpu import cli
from convsep_tpu.configs import presets as presets_mod
from convsep_tpu.configs.presets import TransformConfig
from convsep_tpu.data import sine_mixture, write_wav

FS = 8000


def _tiny_ikala():
    p = presets_mod.PRESETS["ikala"]()
    t = TransformConfig(fs=FS, frame_size=256, hop_size=128)
    return dataclasses.replace(
        p,
        name="tinyikala",
        transform=t,
        model=dataclasses.replace(
            p.model,
            time_context=10,
            feat_size=t.bins,
            conv1_filters=4,
            conv1_freq=8,
            conv2_filters=4,
            bottleneck=16,
        ),
        train=dataclasses.replace(
            p.train, batch_size=4, num_epochs=1, time_context=10, overlap=5
        ),
        sep=dataclasses.replace(p.sep, segment_bucket=2),
    )


@pytest.fixture(autouse=True)
def tiny_preset(monkeypatch):
    monkeypatch.setitem(presets_mod.PRESETS, "tinyikala", _tiny_ikala)


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("audio")
    for i in range(2):
        d = root / f"track{i}"
        d.mkdir()
        stems, mix = sine_mixture(2, 2 * FS, fs=FS, freqs=(220.0, 1400.0), seed=i)
        write_wav(d / "vocals.wav", FS, stems[0])
        write_wav(d / "accompaniment.wav", FS, stems[1])
        write_wav(d / "mixture.wav", FS, mix)
    return str(root)


def test_full_cli_journey(audio_dir, tmp_path, capsys):
    feats = str(tmp_path / "feats")
    assert cli.main(["compute-features", "--preset", "tinyikala", "--audio-dir", audio_dir, "--out", feats]) == 0
    assert os.path.exists(os.path.join(feats, "track0.mix.data"))

    wd = str(tmp_path / "run")
    assert cli.main(["train", "--preset", "tinyikala", "--features", feats, "--workdir", wd]) == 0
    assert os.path.isdir(os.path.join(wd, "checkpoints"))
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))

    est = str(tmp_path / "est")
    mix_wav = os.path.join(audio_dir, "track0", "mixture.wav")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", os.path.join(wd, "checkpoints"),
        "-i", mix_wav, "-o", est,
    ]) == 0
    assert sorted(os.listdir(est)) == ["accompaniment.wav", "vocals.wav"]

    ref = str(tmp_path / "ref")
    os.makedirs(ref)
    for s in ("vocals", "accompaniment"):
        import shutil

        shutil.copy(os.path.join(audio_dir, "track0", f"{s}.wav"), ref)
    capsys.readouterr()
    assert cli.main(["evaluate", "--ref-dir", ref, "--est-dir", est, "--flen", "16"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"vocals", "accompaniment"}
    assert all(np.isfinite(list(v.values())).all() for v in out.values())


def test_separate_from_reference_pickle(audio_dir, tmp_path):
    """The reference-checkpoint path: .pkl → converter → separation."""
    import pickle

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    rng = np.random.default_rng(0)
    vals = _random_reference_values(preset.model, rng)
    pkl = str(tmp_path / "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    est = str(tmp_path / "est")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl,
        "-i", os.path.join(audio_dir, "track0", "mixture.wav"), "-o", est,
    ]) == 0
    assert len(os.listdir(est)) == 2


def test_bench_prints_one_json_line(capsys):
    assert cli.main(["bench", "--preset", "tinyikala", "--seconds", "1", "--runs", "2"]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0


def test_train_resume_flag(audio_dir, tmp_path):
    feats = str(tmp_path / "feats")
    cli.main(["compute-features", "--preset", "tinyikala", "--audio-dir", audio_dir, "--out", feats])
    wd = str(tmp_path / "run")
    assert cli.main(["train", "--preset", "tinyikala", "--features", feats, "--workdir", wd, "--epochs", "1"]) == 0
    assert cli.main(["train", "--preset", "tinyikala", "--features", feats, "--workdir", wd, "--epochs", "1", "--resume"]) == 0


def test_convert_roundtrip_cli(tmp_path):
    """pkl -> orbax -> pkl via the convert subcommand."""
    import pickle

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(1))
    pkl = str(tmp_path / "ref.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    ck = str(tmp_path / "ck")
    assert cli.main(["convert", "--preset", "tinyikala", "--input", pkl, "--out", ck]) == 0
    back = str(tmp_path / "back.pkl")
    assert cli.main(["convert", "--preset", "tinyikala", "--input", ck, "--out", back, "--export"]) == 0
    with open(back, "rb") as f:
        vals2 = pickle.load(f)
    assert len(vals2) == len(vals)
    for a, b in zip(vals, vals2):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_separate_batch_cli(audio_dir, tmp_path):
    import pickle

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(2))
    pkl = str(tmp_path / "m.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    indir = str(tmp_path / "mixes")
    os.makedirs(indir)
    import shutil

    for i in range(3):
        shutil.copy(
            os.path.join(audio_dir, f"track{i % 2}", "mixture.wav"),
            os.path.join(indir, f"m{i}.wav"),
        )
    out = str(tmp_path / "out")
    assert cli.main([
        "separate-batch", "--preset", "tinyikala", "--params", pkl,
        "--input-dir", indir, "-o", out, "--batch-size", "2", "--mesh-data", "4",
    ]) == 0
    assert sorted(os.listdir(out)) == ["m0", "m1", "m2"]
    assert sorted(os.listdir(os.path.join(out, "m0"))) == ["accompaniment.wav", "vocals.wav"]


def test_separate_stereo_flag(audio_dir, tmp_path):
    import pickle

    import scipy.io.wavfile as wavfile

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(3))
    pkl = str(tmp_path / "m.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    # build a stereo mixture wav
    from convsep_tpu.data import sine_mixture, write_wav

    stems, _ = sine_mixture(2, 2 * FS, fs=FS, seed=9)
    stereo = np.stack([stems[0], stems[1]], axis=1)
    p = str(tmp_path / "st.wav")
    write_wav(p, FS, stereo)
    out = str(tmp_path / "est")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl, "-i", p, "-o", out, "--stereo",
    ]) == 0
    fs, v = wavfile.read(os.path.join(out, "vocals.wav"))
    assert v.ndim == 2 and v.shape[1] == 2 and v.dtype == np.int16


def test_train_from_audio_cli(audio_dir, tmp_path):
    wd = str(tmp_path / "run")
    assert cli.main([
        "train", "--preset", "tinyikala", "--features", audio_dir,
        "--workdir", wd, "--epochs", "1", "--from-audio",
    ]) == 0
    assert os.path.isdir(os.path.join(wd, "checkpoints"))


def test_stereo_native_cli_journey(tmp_path, monkeypatch):
    """*-stereo preset routing: train --from-audio on stereo wavs, then
    separate through StereoSeparator (stereo stems out)."""
    import scipy.io.wavfile as wavfile

    from convsep_tpu.configs.presets import stereo_preset

    monkeypatch.setitem(
        presets_mod.PRESETS, "tinyikala-stereo", lambda: stereo_preset(_tiny_ikala())
    )
    root = tmp_path / "audio"
    for i in range(2):
        d = root / f"track{i}"
        d.mkdir(parents=True)
        stems, _ = sine_mixture(2, 2 * FS, fs=FS, freqs=(220.0, 1400.0), seed=i)
        v = np.stack([0.9 * stems[0], 0.3 * stems[0]], axis=1)
        a = np.stack([0.3 * stems[1], 0.9 * stems[1]], axis=1)
        write_wav(d / "vocals.wav", FS, v)
        write_wav(d / "accompaniment.wav", FS, a)
        write_wav(d / "mixture.wav", FS, v + a)
    wd = str(tmp_path / "run")
    assert cli.main([
        "train", "--preset", "tinyikala-stereo", "--features", str(root),
        "--workdir", wd, "--epochs", "1", "--from-audio",
    ]) == 0
    mixp = str(root / "track0" / "mixture.wav")
    out = str(tmp_path / "est")
    assert cli.main([
        "separate", "--preset", "tinyikala-stereo",
        "--params", os.path.join(wd, "checkpoints"), "-i", mixp, "-o", out,
    ]) == 0
    fs, v = wavfile.read(os.path.join(out, "vocals.wav"))
    assert fs == FS and v.ndim == 2 and v.shape[1] == 2 and v.dtype == np.int16
    fs, a = wavfile.read(os.path.join(out, "accompaniment.wav"))
    assert a.shape == v.shape


def test_profile_cli(tmp_path, capsys):
    ld = str(tmp_path / "trace")
    assert cli.main([
        "profile", "--preset", "tinyikala", "--seconds", "0.5", "--logdir", ld, "--top", "5",
    ]) == 0
    out = capsys.readouterr().out
    assert "trace ->" in out


def test_separate_chunked_flag(audio_dir, tmp_path):
    """--chunked routes through ChunkedSeparator and matches the whole-track
    CLI output exactly (both paths quantize to PCM16 on device)."""
    import pickle

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(2))
    pkl = str(tmp_path / "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    mix = os.path.join(audio_dir, "track0", "mixture.wav")
    whole = str(tmp_path / "whole")
    chunked = str(tmp_path / "chunked")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl, "-i", mix, "-o", whole,
    ]) == 0
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl, "-i", mix,
        "-o", chunked, "--chunked", "--chunk-segments", "2",
    ]) == 0
    from convsep_tpu.data.io import read_wav

    lsb = 1.0 / 32768.0  # read_wav returns float32 = PCM16 / 32768
    for name in os.listdir(whole):
        _, a = read_wav(os.path.join(whole, name))
        _, b = read_wav(os.path.join(chunked, name))
        # ±1 LSB on float rounding edges
        assert np.abs(a - b).max() <= 1.001 * lsb
    # --complement-last: the NON-last stems stay within float rounding of
    # the plain chunked output (same network outputs; the conservative mask
    # renormalization perturbs them ≤ the Wiener eps scale); the LAST stem
    # (ikala: "accompaniment") legitimately differs — conservation reroutes
    # unclaimed TF energy into it
    comp = str(tmp_path / "comp")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl, "-i", mix,
        "-o", comp, "--chunked", "--chunk-segments", "2", "--complement-last",
    ]) == 0
    _, a = read_wav(os.path.join(chunked, "vocals.wav"))
    _, b = read_wav(os.path.join(comp, "vocals.wav"))
    assert np.abs(a - b).max() <= 1.001 * lsb
    # r4: --complement-last works WITHOUT --chunked too (the whole-track
    # Separator gained the conserve-mask + host-derivation path — VERDICT
    # r3 #4; the old guard that required --chunked is gone)
    whole_comp = str(tmp_path / "whole_comp")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl, "-i", mix,
        "-o", whole_comp, "--complement-last",
    ]) == 0
    for name, tol in (("vocals.wav", 2.001), ("accompaniment.wav", 4.001)):
        _, a = read_wav(os.path.join(comp, name))
        _, b = read_wav(os.path.join(whole_comp, name))
        # chunked vs whole-track float reassociation (+ derived-last stacking)
        assert np.abs(a - b).max() <= tol * lsb, name


def test_evaluate_windowed_and_oracle(audio_dir, tmp_path, capsys):
    """evaluate --windowed --oracle: windowed metrics + oracle/headroom."""
    import shutil

    ref = str(tmp_path / "ref")
    est = str(tmp_path / "est")
    os.makedirs(ref)
    os.makedirs(est)
    for s in ("vocals", "accompaniment"):
        shutil.copy(os.path.join(audio_dir, "track0", f"{s}.wav"), ref)
        shutil.copy(os.path.join(audio_dir, "track0", f"{s}.wav"), est)
    mix_wav = os.path.join(audio_dir, "track0", "mixture.wav")
    capsys.readouterr()
    assert cli.main([
        "evaluate", "--ref-dir", ref, "--est-dir", est, "--flen", "16",
        "--windowed", "--oracle", "--mix", mix_wav, "--preset", "tinyikala",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["_windows"] >= 1
    for s in ("vocals", "accompaniment"):
        row = out[s]
        assert row["SDR"] > 40  # est == ref
        assert np.isfinite(row["oracle_SDR"]) and np.isfinite(row["headroom_dB"])


def test_serve_watch_folder(audio_dir, tmp_path):
    """serve: separates wavs as they arrive; already-done tracks skipped;
    crash-safe resume = just run another sweep."""
    import pickle
    import shutil

    from tests.test_convert import _random_reference_values
    from convsep_tpu.separate.service import WatchService
    from convsep_tpu.ckpt.convert_reference import convert_reference_params

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(3))
    params = convert_reference_params(vals, preset.model)

    incoming = str(tmp_path / "incoming")
    out = str(tmp_path / "done")
    os.makedirs(incoming)
    shutil.copy(os.path.join(audio_dir, "track0", "mixture.wav"),
                os.path.join(incoming, "a.wav"))

    svc = WatchService(preset, params, incoming, out, batch_size=2, poll_s=0.01)
    # sweep 1 sees a.wav but its size is not yet known-stable -> deferred
    assert svc.sweep() == 0
    assert svc.sweep() == 1
    assert sorted(os.listdir(os.path.join(out, "a"))) == [
        "accompaniment.wav", "vocals.wav",
    ]
    # nothing new: no work
    assert svc.sweep() == 0
    # a new wav arrives; stability check defers once, then it separates
    shutil.copy(os.path.join(audio_dir, "track1", "mixture.wav"),
                os.path.join(incoming, "b.wav"))
    assert svc.run(max_sweeps=2) == 1
    assert svc._done("b") and svc._done("a")


def test_serve_cli(audio_dir, tmp_path):
    import pickle

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(4))
    pkl = str(tmp_path / "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    incoming = str(tmp_path / "incoming")
    os.makedirs(incoming)
    import shutil

    shutil.copy(os.path.join(audio_dir, "track0", "mixture.wav"),
                os.path.join(incoming, "t.wav"))
    out = str(tmp_path / "served")
    assert cli.main([
        "serve", "--preset", "tinyikala", "--params", pkl,
        "--input-dir", incoming, "-o", out, "--poll", "0.01", "--max-sweeps", "3",
    ]) == 0
    assert sorted(os.listdir(os.path.join(out, "t"))) == [
        "accompaniment.wav", "vocals.wav",
    ]


def _tiny_bach(monkeypatch):
    p = presets_mod.PRESETS["bach10"]()
    t = TransformConfig(fs=FS, frame_size=256, hop_size=128)
    tiny = dataclasses.replace(
        p,
        name="tinybach",
        transform=t,
        model=dataclasses.replace(
            p.model,
            time_context=10,
            feat_size=t.bins,
            conv1_filters=4,
            conv1_freq=8,
            conv2_filters=4,
            bottleneck=16,
        ),
        train=dataclasses.replace(
            p.train, batch_size=4, num_epochs=1, time_context=10, overlap=5
        ),
        sep=dataclasses.replace(p.sep, segment_bucket=2),
    )
    monkeypatch.setitem(presets_mod.PRESETS, "tinybach", lambda: tiny)
    return tiny


@pytest.mark.parametrize("score_filter", ["comb", "nmf"])
def test_score_informed_cli_journey(tmp_path, monkeypatch, score_filter):
    """Bach10 workflow through the CLI: note-annotated dataset →
    compute-features --score-informed → train --score-informed →
    separate --score (SURVEY.md §3.4), for both score filters."""
    from convsep_tpu.data.synth import note_mixture

    preset = _tiny_bach(monkeypatch)
    S = preset.model.num_sources
    root = tmp_path / "audio"
    for i in range(2):
        d = root / f"piece{i}"
        d.mkdir(parents=True)
        stems, mix, notes = note_mixture(S, 2 * FS, fs=FS, notes_per_source=3, seed=i)
        for name, stem, src_notes in zip(preset.sources, stems, notes):
            write_wav(d / f"{name}.wav", FS, stem)
            with open(d / f"{name}.notes.txt", "w") as f:
                for n in src_notes:
                    f.write(f"{n.start_sec} {n.end_sec} {n.pitch_midi}\n")
        write_wav(d / "mixture.wav", FS, mix)

    feats = str(tmp_path / "feats")
    assert cli.main([
        "compute-features", "--preset", "tinybach", "--audio-dir", str(root),
        "--out", feats, "--score-informed", "--score-filter", score_filter,
    ]) == 0
    for s in preset.sources:
        assert os.path.exists(os.path.join(feats, f"piece0.score_{s}.data"))

    wd = str(tmp_path / "run")
    assert cli.main([
        "train", "--preset", "tinybach", "--features", feats,
        "--workdir", wd, "--score-informed",
    ]) == 0

    est = str(tmp_path / "est")
    assert cli.main([
        "separate", "--preset", "tinybach", "--params", os.path.join(wd, "checkpoints"),
        "-i", str(root / "piece0" / "mixture.wav"), "-o", est,
        "--score", str(root / "piece0"), "--score-filter", score_filter,
    ]) == 0
    assert sorted(os.listdir(est)) == sorted(f"{s}.wav" for s in preset.sources)


def test_separate_batch_score_dir(tmp_path, monkeypatch):
    """`separate-batch --score-dir`: streamed score-informed separation."""
    from convsep_tpu.data.synth import note_mixture
    from convsep_tpu.train.loop import create_train_state
    from convsep_tpu.ckpt.orbax_io import CheckpointManager

    preset = _tiny_bach(monkeypatch)
    S = preset.model.num_sources
    wavs = tmp_path / "wavs"
    scores = tmp_path / "scores"
    wavs.mkdir()
    for i in range(2):
        stems, mix, notes = note_mixture(S, FS, fs=FS, notes_per_source=2, seed=i)
        write_wav(wavs / f"piece{i}.wav", FS, mix)
        sdir = scores / f"piece{i}"
        sdir.mkdir(parents=True)
        for name, src_notes in zip(preset.sources, notes):
            with open(sdir / f"{name}.notes.txt", "w") as f:
                for n in src_notes:
                    f.write(f"{n.start_sec} {n.end_sec} {n.pitch_midi}\n")
    state, _ = create_train_state(preset, 0)
    ckpt = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt)
    mgr.save(0, state)
    mgr.wait()
    est = str(tmp_path / "est")
    assert cli.main([
        "separate-batch", "--preset", "tinybach", "--params", ckpt,
        "--input-dir", str(wavs), "-o", est, "--batch-size", "2",
        "--score-dir", str(scores), "--score-filter", "nmf",
    ]) == 0
    for i in range(2):
        assert sorted(os.listdir(os.path.join(est, f"piece{i}"))) == sorted(
            f"{s}.wav" for s in preset.sources
        )


def test_serve_score_dir(tmp_path, monkeypatch):
    """Watch-folder serving with score conditioning: wavs whose score
    hasn't arrived yet are left for a later sweep."""
    from convsep_tpu.data.synth import note_mixture
    from convsep_tpu.separate.service import WatchService
    from convsep_tpu.train.loop import create_train_state

    preset = _tiny_bach(monkeypatch)
    S = preset.model.num_sources
    wavs = tmp_path / "in"
    scores = tmp_path / "scores"
    out = tmp_path / "out"
    wavs.mkdir()
    all_notes = {}
    for i in range(2):
        stems, mix, notes = note_mixture(S, FS, fs=FS, notes_per_source=2, seed=i)
        write_wav(wavs / f"p{i}.wav", FS, mix)
        all_notes[f"p{i}"] = notes
    # score present only for p0 at first
    def put_score(name):
        sdir = scores / name
        sdir.mkdir(parents=True)
        for s, src_notes in zip(preset.sources, all_notes[name]):
            with open(sdir / f"{s}.notes.txt", "w") as f:
                for n in src_notes:
                    f.write(f"{n.start_sec} {n.end_sec} {n.pitch_midi}\n")

    put_score("p0")
    state, _ = create_train_state(preset, 0)
    svc = WatchService(
        preset, state.params, str(wavs), str(out),
        batch_size=2, score_dir=str(scores), score_filter="comb",
    )
    svc.pending()  # first sweep records sizes (stability check)
    assert svc.sweep() == 1  # p0 only — p1's score is missing
    assert os.path.isdir(out / "p0") and not os.path.exists(out / "p1")
    put_score("p1")
    svc.pending()
    assert svc.sweep() == 1
    assert sorted(os.listdir(out / "p1")) == sorted(f"{s}.wav" for s in preset.sources)


def test_separate_online_cli(audio_dir, tmp_path, capsys):
    """`convsep separate --online` (VERDICT r3 #6: the push/flush mode's
    L5 exposure): wav in blocks → stems + one JSON stats line, and the
    stems match the whole-track separation within 1 PCM16 LSB (the online
    path is bit-identical to ChunkedSeparator — tests/test_online.py —
    and chunked vs whole-track differ only by float reassociation, which
    can flip int16 round-to-nearest by one step)."""
    import pickle

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(4))
    pkl = str(tmp_path / "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    mix_wav = os.path.join(audio_dir, "track0", "mixture.wav")

    est = str(tmp_path / "online_est")
    capsys.readouterr()
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl,
        "-i", mix_wav, "-o", est,
        "--online", "--chunk-segments", "4", "--block-samples", "1000",
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["mode"] == "online"
    assert stats["rtf_steady"] > 0
    assert stats["latency_algo_s"] > 0
    assert stats["pushed_samples"] == 2 * FS
    assert sorted(os.listdir(est)) == ["accompaniment.wav", "vocals.wav"]

    # whole-track comparator through the same CLI
    whole = str(tmp_path / "whole_est")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl,
        "-i", mix_wav, "-o", whole,
    ]) == 0
    from convsep_tpu.data.io import read_wav

    for s in ("vocals", "accompaniment"):
        _, a = read_wav(os.path.join(est, f"{s}.wav"))
        _, b = read_wav(os.path.join(whole, f"{s}.wav"))
        assert a.shape == b.shape
        assert np.abs(a.astype(np.float64) - b.astype(np.float64)).max() <= 1.5 / 32768.0


def test_separate_online_stdin(audio_dir, tmp_path, capsys, monkeypatch):
    """`-i -`: raw mono PCM16 on stdin, block-read live."""
    import io
    import pickle
    import sys as _sys

    from tests.test_convert import _random_reference_values
    from convsep_tpu.data.io import read_wav
    from convsep_tpu.utils.pcm import quantize_pcm16_host

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(5))
    pkl = str(tmp_path / "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    _, mix = read_wav(os.path.join(audio_dir, "track0", "mixture.wav"))
    pcm = quantize_pcm16_host(np.asarray(mix, np.float32))

    class _Stdin:
        buffer = io.BytesIO(pcm.tobytes())

    monkeypatch.setattr(_sys, "stdin", _Stdin())
    est = str(tmp_path / "stdin_est")
    capsys.readouterr()
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl,
        "-i", "-", "-o", est, "--online", "--chunk-segments", "4",
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["pushed_samples"] == len(pcm)
    _, a = read_wav(os.path.join(est, "vocals.wav"))
    assert a.shape == (len(pcm),)


def test_separate_complement_last_cli(audio_dir, tmp_path):
    """--complement-last now works on the whole-track path too (r4)."""
    import pickle

    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    vals = _random_reference_values(preset.model, np.random.default_rng(6))
    pkl = str(tmp_path / "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    mix_wav = os.path.join(audio_dir, "track0", "mixture.wav")
    est = str(tmp_path / "comp_est")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl,
        "-i", mix_wav, "-o", est, "--complement-last",
    ]) == 0
    from convsep_tpu.data.io import read_wav

    _, mix = read_wav(mix_wav)
    stems = [read_wav(os.path.join(est, f"{s}.wav"))[1]
             for s in ("vocals", "accompaniment")]
    # conservation: PCM16 stems sum back to the mixture within 2 LSB
    total = sum(s.astype(np.float64) for s in stems)
    assert np.abs(total - np.asarray(mix, np.float64)).max() <= 2.5 / 32768.0


def test_separate_mask_dtype_and_analysis_flags(audio_dir, tmp_path, monkeypatch):
    """--mask-dtype / --analysis overrides reach the preset (r5 knobs)."""
    import pickle

    import convsep_tpu.separate as sep_mod
    from tests.test_convert import _random_reference_values

    preset = _tiny_ikala()
    rng = np.random.default_rng(0)
    pkl = str(tmp_path / "model.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(_random_reference_values(preset.model, rng), f, protocol=2)

    captured = {}
    orig = sep_mod.Separator

    class Spy(orig):
        def __init__(self, p, params, **kw):
            captured["mask_dtype"] = p.model.mask_dtype
            captured["analysis"] = p.transform.analysis
            super().__init__(p, params, **kw)

    monkeypatch.setattr(sep_mod, "Separator", Spy)
    est = str(tmp_path / "est")
    assert cli.main([
        "separate", "--preset", "tinyikala", "--params", pkl,
        "-i", os.path.join(audio_dir, "track0", "mixture.wav"), "-o", est,
        "--mask-dtype", "bfloat16", "--analysis", "matmul",
    ]) == 0
    assert captured == {"mask_dtype": "bfloat16", "analysis": "matmul"}
