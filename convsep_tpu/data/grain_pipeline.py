"""grain-backed training data loader.

SURVEY.md §5.2: the reference's hand-rolled, unguarded prefetch thread is
replaced by grain — deterministic shuffling, multiprocess prefetch, and a
**checkpointable iterator** (mid-epoch resume: save/restore the iterator
state alongside the orbax train state via PyGrainCheckpointHandler).

`SegmentDataset` stays the random-access source of truth; this module only
wraps it. The lighter `prefetch_to_device` thread in pipeline.py remains
the zero-dependency default.
"""

from __future__ import annotations

from typing import Iterator

import grain.python as gp

from convsep_tpu.data.pipeline import SegmentDataset


class _Source:
    """grain RandomAccessDataSource over SegmentDataset segments."""

    def __init__(self, ds: SegmentDataset):
        self._ds = ds

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, i: int):
        return self._ds.get(int(i))

    def __repr__(self) -> str:
        # grain validates checkpointed iterator state against
        # repr(data_source); a stable repr (not the default object id) is
        # what makes iterator state restorable across processes. Works for
        # both SegmentDataset and AudioSegmentDataset.
        ds = self._ds
        return (
            f"_Source({type(ds).__name__}, root={ds.root!r}, "
            f"sources={ds.sources!r}, n={len(ds)})"
        )


def make_loader(
    ds: SegmentDataset,
    batch_size: int,
    seed: int = 0,
    num_epochs: int | None = 1,
    shuffle: bool = True,
    worker_count: int = 0,
) -> gp.DataLoader:
    """Deterministic (seeded) grain DataLoader yielding (x, y) batches.

    Iterator state is checkpointable: `iter(loader)` returns a
    PyGrainDatasetIterator supporting get_state/set_state.
    """
    sampler = gp.IndexSampler(
        num_records=len(ds),
        shard_options=gp.NoSharding(),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
    )
    return gp.DataLoader(
        data_source=_Source(ds),
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )


def batches(ds: SegmentDataset, batch_size: int, seed: int = 0) -> Iterator:
    """One deterministic epoch of (x, y) batches via grain."""
    return iter(make_loader(ds, batch_size, seed=seed, num_epochs=1))


def stateful_batches(loader: gp.DataLoader, state: str | bytes | None = None) -> Iterator:
    """Yield (batch, iterator_state_str) pairs from a grain loader.

    The state emitted WITH each batch is the iterator position *after*
    producing it, so checkpointing the last-consumed state resumes on
    exactly the unseen batches — regardless of how far an async prefetch
    queue ran ahead. `state` (from a checkpoint) resumes the iterator.
    """
    it = iter(loader)
    if state is not None:
        it.set_state(state.encode() if isinstance(state, str) else state)
    while True:
        try:
            batch = next(it)
        except StopIteration:
            return
        s = it.get_state()
        yield batch, (s.decode() if isinstance(s, bytes) else s)
