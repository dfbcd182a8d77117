"""Native fastbatch library tests: build, equality vs numpy, integration."""

import numpy as np
import pytest

from convsep_tpu.data import fastbatch


requires_native = pytest.mark.skipif(
    not fastbatch.available(), reason="no C++ toolchain for fastbatch"
)


@requires_native
def test_assemble_matches_numpy(rng):
    tracks = [
        np.ascontiguousarray(rng.standard_normal((n, 17)).astype(np.float32))
        for n in (50, 33, 61)
    ]
    seg_track = np.array([0, 1, 2, 2, 1], np.int64)
    seg_start = np.array([0, 20, 55, 10, 30], np.int64)  # 55+10>61 → pad
    T = 10
    got = fastbatch.assemble_batch(tracks, seg_track, seg_start, T, 0.3)
    want = np.zeros((5, T, 17), np.float32)
    for b in range(5):
        tr = tracks[seg_track[b]]
        seg = tr[seg_start[b] : seg_start[b] + T]
        want[b, : len(seg)] = seg * 0.3
    np.testing.assert_allclose(got, want, rtol=1e-6)


@requires_native
def test_assemble_scale_one_memcpy_path(rng):
    tracks = [np.ascontiguousarray(rng.standard_normal((40, 8)).astype(np.float32))]
    got = fastbatch.assemble_batch(
        tracks, np.zeros(3, np.int64), np.array([0, 10, 35], np.int64), 8, 1.0
    )
    np.testing.assert_array_equal(got[0], tracks[0][:8])
    assert (got[2, 5:] == 0).all()


@requires_native
def test_assemble_threaded_matches_serial(rng):
    tracks = [
        np.ascontiguousarray(rng.standard_normal((200, 65)).astype(np.float32))
        for _ in range(4)
    ]
    B = 64
    seg_track = rng.integers(0, 4, B).astype(np.int64)
    seg_start = rng.integers(0, 195, B).astype(np.int64)
    a = fastbatch.assemble_batch(tracks, seg_track, seg_start, 30, 0.5, n_threads=1)
    b = fastbatch.assemble_batch(tracks, seg_track, seg_start, 30, 0.5, n_threads=8)
    np.testing.assert_array_equal(a, b)


@requires_native
def test_bad_track_index_zero_filled(rng):
    tracks = [np.zeros((10, 4), np.float32) + 1.0]
    got = fastbatch.assemble_batch(
        tracks, np.array([5], np.int64), np.array([0], np.int64), 3, 1.0
    )
    assert (got == 0).all()


@requires_native
def test_validation_errors(rng):
    with pytest.raises(ValueError, match="float32"):
        fastbatch.assemble_batch(
            [np.zeros((5, 4), np.float64)], np.zeros(1, np.int64), np.zeros(1, np.int64), 3, 1.0
        )


def test_dataset_native_and_numpy_paths_agree(tmp_path, monkeypatch):
    """SegmentDataset batches identical with/without the native path."""
    from convsep_tpu.data import SegmentDataset, synth_feature_dir

    sources = ("vocals", "accompaniment")
    synth_feature_dir(str(tmp_path), sources, num_tracks=2, seconds=1.0)
    ds = SegmentDataset(str(tmp_path), sources, time_context=30, overlap=20)
    want = list(ds.batches(4, shuffle=True, seed=3))
    monkeypatch.setattr(fastbatch, "available", lambda: False)
    got = list(ds.batches(4, shuffle=True, seed=3))
    assert len(got) == len(want)
    for (gx, gy), (wx, wy) in zip(got, want):
        np.testing.assert_allclose(gx, wx, rtol=1e-6)
        np.testing.assert_allclose(gy, wy, rtol=1e-6)
