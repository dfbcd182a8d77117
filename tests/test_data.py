"""Data layer tests: I/O round-trips, segmentation, pipeline batching."""

import numpy as np
import pytest

from convsep_tpu.data import (
    read_wav,
    write_wav,
    save_tensor,
    load_tensor,
    save_obj,
    load_obj,
    segment_count,
    segment_frames,
    unsegment_frames,
    SegmentDataset,
    prefetch_to_device,
    sine_mixture,
    synth_feature_dir,
)


def test_wav_roundtrip(tmp_path, rng):
    x = (0.5 * rng.standard_normal(4410)).astype(np.float32).clip(-0.99, 0.99)
    p = tmp_path / "t.wav"
    write_wav(p, 44100, x)
    fs, y = read_wav(p)
    assert fs == 44100 and y.dtype == np.float32
    np.testing.assert_allclose(y, x, atol=1.0 / 32768)


def test_tensor_roundtrip(tmp_path, rng):
    a = rng.standard_normal((17, 513)).astype(np.float32)
    p = tmp_path / "a.data"
    save_tensor(a, p)
    np.testing.assert_array_equal(load_tensor(p), a)
    np.testing.assert_array_equal(load_tensor(p, mmap=False), a)
    with pytest.raises(ValueError):
        save_tensor(a, tmp_path / "a.bin")


def test_pickle_roundtrip(tmp_path):
    obj = {"a": np.arange(3), "b": "x"}
    save_obj(obj, tmp_path / "o.pkl")
    got = load_obj(tmp_path / "o.pkl")
    assert got["b"] == "x"
    np.testing.assert_array_equal(got["a"], obj["a"])


@pytest.mark.parametrize("n,T,step,want", [(90, 30, 30, 3), (91, 30, 30, 4), (30, 30, 30, 1), (10, 30, 30, 1), (100, 30, 10, 8)])
def test_segment_count(n, T, step, want):
    assert segment_count(n, T, step) == want


def test_segment_roundtrip_nonoverlapping(rng):
    x = rng.standard_normal((71, 13)).astype(np.float32)
    segs = segment_frames(x, 30)
    assert segs.shape == (3, 30, 13)
    np.testing.assert_array_equal(unsegment_frames(segs, 71), x)
    # tail is zero-padded
    assert (segs[2, 11:] == 0).all()


def test_segment_overlapping_matches_naive(rng):
    x = rng.standard_normal((100, 7)).astype(np.float32)
    for step in (10, 7):  # dividing and non-dividing T=30
        segs = segment_frames(x, 30, step)
        n = segment_count(100, 30, step)
        assert segs.shape == (n, 30, 7)
        padded = np.pad(x, (((0, (n - 1) * step + 30 - 100)), (0, 0)))
        for k in range(n):
            np.testing.assert_array_equal(segs[k], padded[k * step : k * step + 30])


def test_sine_mixture_deterministic():
    stems, mix = sine_mixture(3, 1000, seed=5)
    stems2, mix2 = sine_mixture(3, 1000, seed=5)
    np.testing.assert_array_equal(stems, stems2)
    np.testing.assert_allclose(mix, stems.sum(0), atol=1e-6)
    assert stems.shape == (3, 1000)


def test_note_mixture_score_alignment():
    """Stems carry energy ONLY inside their notes' gates, registers are
    per-source disjoint, and the fixture is deterministic."""
    from convsep_tpu.data.synth import note_mixture

    fs, L = 8000, 8000 * 4
    stems, mix, notes = note_mixture(3, L, fs=fs, notes_per_source=4, seed=7)
    stems2, mix2, notes2 = note_mixture(3, L, fs=fs, notes_per_source=4, seed=7)
    np.testing.assert_array_equal(stems, stems2)
    assert notes == notes2
    np.testing.assert_allclose(mix, stems.sum(0), atol=1e-6)
    t = np.arange(L) / fs
    for s in range(3):
        assert len(notes[s]) == 4
        gate = np.zeros(L, bool)
        for n in notes[s]:
            gate |= (t >= n.start_sec) & (t < n.end_sec)
        assert np.abs(stems[s][~gate]).max() == 0.0  # silence between notes
        assert (stems[s][gate] ** 2).mean() > 1e-4  # sounding inside them
    # registers are disjoint: source s+1 sits a fifth+ below source s
    for s in range(2):
        lo_s = min(n.pitch_midi for n in notes[s])
        hi_next = max(n.pitch_midi for n in notes[s + 1])
        assert lo_s > hi_next


def test_segment_dataset_batches(tmp_path):
    sources = ("vocals", "accompaniment")
    synth_feature_dir(str(tmp_path), sources, num_tracks=2, seconds=1.0)
    ds = SegmentDataset(str(tmp_path), sources, time_context=30, overlap=20)
    assert len(ds) > 4
    x, y = ds.get(0)
    assert x.shape == (30, 513, 1) and y.shape == (2, 30, 513)
    batches = list(ds.batches(4, shuffle=True, seed=1))
    assert all(b[0].shape == (4, 30, 513, 1) for b in batches)
    # shuffling is deterministic per seed
    b2 = list(ds.batches(4, shuffle=True, seed=1))
    np.testing.assert_array_equal(batches[0][0], b2[0][0])
    # scaling applied
    ds2 = SegmentDataset(str(tmp_path), sources, mult_factor_in=1.0, mult_factor_out=1.0)
    x2, _ = ds2.get(0)
    np.testing.assert_allclose(x, x2 * 0.3, atol=1e-6)


def test_segment_dataset_extra_channels(tmp_path):
    sources = ("violin", "clarinet")
    synth_feature_dir(str(tmp_path), sources, num_tracks=1, seconds=1.0)
    # reuse the stems as fake score channels
    ds = SegmentDataset(
        str(tmp_path), sources, extra_channels=("violin", "clarinet")
    )
    x, y = ds.get(0)
    assert x.shape == (30, 513, 3) and y.shape == (2, 30, 513)


def test_segment_dataset_missing_stem_raises(tmp_path):
    synth_feature_dir(str(tmp_path), ("vocals",), num_tracks=1, seconds=0.5)
    with pytest.raises(FileNotFoundError):
        SegmentDataset(str(tmp_path), ("vocals", "bass"))


def test_prefetch_to_device(tmp_path):
    sources = ("vocals", "accompaniment")
    synth_feature_dir(str(tmp_path), sources, num_tracks=1, seconds=1.0)
    ds = SegmentDataset(str(tmp_path), sources)
    host = list(ds.batches(2, shuffle=False))
    dev = list(prefetch_to_device(ds.batches(2, shuffle=False)))
    assert len(dev) == len(host)
    for (hx, hy), (dx, dy) in zip(host, dev):
        np.testing.assert_array_equal(np.asarray(dx), hx)
        np.testing.assert_array_equal(np.asarray(dy), hy)


def test_prefetch_propagates_errors():
    def bad():
        yield np.zeros(3)
        raise RuntimeError("boom")

    it = prefetch_to_device(bad())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_read_wav_other_dtypes(tmp_path, rng):
    from scipy.io import wavfile

    x32 = np.clip(rng.standard_normal(1000) * 2**30, -(2**31), 2**31 - 1).astype(np.int32)
    wavfile.write(tmp_path / "i32.wav", 8000, x32)
    fs, a = read_wav(tmp_path / "i32.wav")
    assert a.dtype == np.float32 and np.abs(a).max() <= 1.0
    xf = rng.standard_normal(1000).astype(np.float32)
    wavfile.write(tmp_path / "f32.wav", 8000, xf)
    _, b = read_wav(tmp_path / "f32.wav")
    np.testing.assert_allclose(b, xf, atol=1e-7)
    x8 = (rng.integers(0, 256, 1000)).astype(np.uint8)
    wavfile.write(tmp_path / "u8.wav", 8000, x8)
    _, c = read_wav(tmp_path / "u8.wav")
    assert np.abs(c).max() <= 1.0


def test_write_wav_int16_passthrough(tmp_path):
    from scipy.io import wavfile

    x = np.array([-32768, 0, 32767], np.int16)
    write_wav(tmp_path / "p.wav", 8000, x)
    _, y = wavfile.read(tmp_path / "p.wav")
    np.testing.assert_array_equal(y, x)
