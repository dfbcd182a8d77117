"""compute_features tests: trackdirs + ikala-stereo layouts, score-informed."""

import os

import numpy as np
import pytest

from convsep_tpu.data import sine_mixture, write_wav, load_tensor
from convsep_tpu.data.features import compute_features
from tests.test_separate import tiny_preset

FS = 8000


def test_trackdirs_layout(tmp_path):
    preset = tiny_preset("ikala")
    adir = tmp_path / "audio"
    for i in range(2):
        d = adir / f"t{i}"
        d.mkdir(parents=True)
        stems, _ = sine_mixture(2, FS, fs=FS, seed=i)
        write_wav(d / "vocals.wav", FS, stems[0])
        write_wav(d / "accompaniment.wav", FS, stems[1])
    out = tmp_path / "feats"
    tracks = compute_features(str(adir), str(out), preset)
    assert tracks == ["t0", "t1"]
    mix = load_tensor(str(out / "t0.mix.data"))
    voc = load_tensor(str(out / "t0.vocals.data"))
    assert mix.shape == voc.shape and mix.shape[1] == preset.transform.bins


def test_ikala_stereo_layout(tmp_path):
    preset = tiny_preset("ikala")
    adir = tmp_path / "audio"
    adir.mkdir()
    stems, _ = sine_mixture(2, FS, fs=FS, seed=0)
    stereo = np.stack([stems[1], stems[0]], axis=1)  # ch0 accomp, ch1 voice
    write_wav(adir / "clip.wav", FS, stereo)
    out = tmp_path / "feats"
    tracks = compute_features(str(adir), str(out), preset, layout="ikala-stereo")
    assert tracks == ["clip"]
    for stem in ("vocals", "accompaniment", "mix"):
        assert os.path.exists(out / f"clip.{stem}.data")
    # vocals features come from channel 1 (the voice)
    from convsep_tpu.dsp.transform import TransformFFT

    t = TransformFFT(preset.transform)
    fs_read = 1.0 / 32768
    want = t.compute_file(np.round(stems[0] * 32768) / 32768.0)
    got = load_tensor(str(out / "clip.vocals.data"))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_ikala_stereo_rejects_mono(tmp_path):
    preset = tiny_preset("ikala")
    adir = tmp_path / "audio"
    adir.mkdir()
    write_wav(adir / "m.wav", FS, np.zeros(FS, np.float32))
    with pytest.raises(ValueError, match="stereo"):
        compute_features(str(adir), str(tmp_path / "f"), preset, layout="ikala-stereo")


def test_unknown_layout(tmp_path):
    with pytest.raises(ValueError, match="unknown layout"):
        compute_features(str(tmp_path), str(tmp_path), tiny_preset("ikala"), layout="x")


def test_score_informed_feature_files(tmp_path):
    from convsep_tpu.data import load_tensor

    preset = tiny_preset("ikala")
    adir = tmp_path / "audio"
    d = adir / "t0"
    d.mkdir(parents=True)
    stems, _ = sine_mixture(2, FS, fs=FS, freqs=(220.0, 1400.0), seed=1)
    write_wav(d / "vocals.wav", FS, stems[0])
    write_wav(d / "accompaniment.wav", FS, stems[1])
    (d / "vocals.notes.txt").write_text("0.0 1.0 57\n")       # A3 220 Hz
    (d / "accompaniment.notes.txt").write_text("0.0 1.0 89\n")  # ~1397 Hz
    out = tmp_path / "feats"
    compute_features(str(adir), str(out), preset, score_informed=True)
    mix = load_tensor(str(out / "t0.mix.data"))
    for s in ("vocals", "accompaniment"):
        sc = load_tensor(str(out / f"t0.score_{s}.data"))
        assert sc.shape == mix.shape
        assert (sc <= mix + 1e-5).all() and sc.max() > 0
    # missing annotation errors clearly
    (d / "vocals.notes.txt").unlink()
    with pytest.raises(FileNotFoundError, match="notes.txt"):
        compute_features(str(adir), str(tmp_path / "f2"), preset, score_informed=True)


def test_augmented_feature_copies_alignment(tmp_path):
    """--augment emits N extra tracks whose score channels stay aligned with
    the shifted/stretched audio (VERDICT r1 #7)."""
    from convsep_tpu.data import load_tensor

    preset = tiny_preset("ikala")
    adir = tmp_path / "audio"
    d = adir / "t0"
    d.mkdir(parents=True)
    fs = FS
    # a 220 Hz tone active only in [0.25, 0.75] s of a 1.5 s clip
    n = int(1.5 * fs)
    t = np.arange(n) / fs
    voc = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    voc[: int(0.25 * fs)] = 0.0
    voc[int(0.75 * fs):] = 0.0
    acc = (0.3 * np.sin(2 * np.pi * 1400.0 * t)).astype(np.float32)
    write_wav(d / "vocals.wav", fs, voc)
    write_wav(d / "accompaniment.wav", fs, acc)
    (d / "vocals.notes.txt").write_text("0.25 0.75 57\n")
    (d / "accompaniment.notes.txt").write_text("0.0 1.5 89\n")
    out = tmp_path / "feats"
    names = compute_features(str(adir), str(out), preset, score_informed=True, augment=3)
    assert names == ["t0", "t0.aug1", "t0.aug2", "t0.aug3"]

    hop = preset.transform.hop_size
    for name, active in [("t0", (0.25, 0.75)), ("t0.aug1", (0.35, 0.85)),
                         ("t0.aug2", (0.15, 0.65)), ("t0.aug3", (0.225, 0.675))]:
        voc_mag = load_tensor(str(out / f"{name}.vocals.data"))
        sc = load_tensor(str(out / f"{name}.score_vocals.data"))
        # where the stem actually has energy, the score channel passes it
        frame_t = np.arange(voc_mag.shape[0]) * hop / fs
        mid = (frame_t > active[0] + 0.1) & (frame_t < active[1] - 0.1)
        outside = frame_t > active[1] + 0.3
        assert voc_mag[mid].max() > 10 * max(voc_mag[outside].max(), 1e-6), name
        assert sc[mid].max() > 0.5 * voc_mag[mid].max(), name
        # and blocks it where the (shifted/stretched) note is inactive
        assert sc[outside].max() < 0.05 * sc[mid].max(), name
    # every augmented copy is a full track: dataset picks all 4 up
    from convsep_tpu.data import SegmentDataset

    ds = SegmentDataset(str(out), ("vocals", "accompaniment"),
                        time_context=10, overlap=0,
                        extra_channels=("score_vocals", "score_accompaniment"))
    assert len(ds._tracks) == 4
