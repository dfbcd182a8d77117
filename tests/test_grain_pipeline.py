"""grain loader tests: determinism, coverage, checkpointable iterator."""

import numpy as np
import pytest

from convsep_tpu.data import SegmentDataset, synth_feature_dir
from convsep_tpu.data import grain_pipeline as gpipe


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("gfeats")
    synth_feature_dir(str(d), ("vocals", "accompaniment"), num_tracks=2, seconds=1.0)
    return SegmentDataset(str(d), ("vocals", "accompaniment"), time_context=10, overlap=5)


def test_epoch_covers_dataset_deterministically(ds):
    a = [x for x, _ in gpipe.batches(ds, 4, seed=7)]
    b = [x for x, _ in gpipe.batches(ds, 4, seed=7)]
    assert len(a) == len(ds) // 4
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = [x for x, _ in gpipe.batches(ds, 4, seed=8)]
    assert not all(np.array_equal(x, y) for x, y in zip(a, c))


def test_batch_shapes(ds):
    x, y = next(gpipe.batches(ds, 4))
    assert x.shape == (4, 10, 513, 1)
    assert y.shape == (4, 2, 10, 513)


def test_iterator_checkpoint_resume(ds):
    loader = gpipe.make_loader(ds, 4, seed=3, num_epochs=1)
    it = iter(loader)
    first = next(it)
    state = it.get_state()
    second = next(it)
    it2 = iter(loader)
    it2.set_state(state)
    second_again = next(it2)
    np.testing.assert_array_equal(second[0], second_again[0])
    del first


def test_multiprocess_workers(ds):
    """worker_count > 0 spawns grain worker processes (pickling the source)."""
    loader = gpipe.make_loader(ds, 4, seed=1, num_epochs=1, worker_count=1)
    batches = list(loader)
    ref = list(gpipe.make_loader(ds, 4, seed=1, num_epochs=1, worker_count=0))
    assert len(batches) == len(ref)
    for (x, y), (rx, ry) in zip(batches, ref):
        np.testing.assert_array_equal(x, rx)
        np.testing.assert_array_equal(y, ry)
