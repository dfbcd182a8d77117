"""Training data pipeline: feature scan → segment index → batches → device.

Reference parity: `LargeDataset` (dataset.py [U], SURVEY.md §2.1 #4) —
scans a feature directory for mixture + per-source tensors, slices
overlapping time-context segments, scales by mult factors, shuffles, and
prefetches batches asynchronously while the accelerator trains.

TPU-native design: tensors are memory-mapped (no whole-dataset RAM copy);
batch assembly is host numpy; a background thread keeps `prefetch` batches
ahead, transferring to device asynchronously (`jax.device_put`) so the
jitted train step never waits on host↔HBM (the single biggest structural
difference from the reference — SURVEY.md §3.2 note).
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass, field
from typing import Iterator

import jax
import numpy as np

from convsep_tpu.data.io import load_tensor
from convsep_tpu.data.segment import segment_count


@dataclass
class SegmentDataset:
    """Index of (track, start-frame) training segments over a feature dir.

    Feature files follow data/io.py's convention: `<track>.mix.data` plus
    `<track>.<source>.data` for each name in `sources`. Extra per-track
    input channels (score-informed runs) follow `<track>.<channel>.data`
    given via `extra_channels`.
    """

    root: str
    sources: tuple[str, ...]
    time_context: int = 30
    overlap: int = 20
    mult_factor_in: float = 0.3
    mult_factor_out: float = 0.3
    extra_channels: tuple[str, ...] = ()
    _tracks: list[str] = field(default_factory=list, init=False)
    _index: list[tuple[int, int]] = field(default_factory=list, init=False)
    _cache: dict[str, np.ndarray] = field(default_factory=dict, init=False)

    def __post_init__(self):
        if not (0 <= self.overlap < self.time_context):
            raise ValueError(f"overlap {self.overlap} must be in [0, {self.time_context})")
        names = sorted(
            f[: -len(".mix.data")]
            for f in os.listdir(self.root)
            if f.endswith(".mix.data")
        )
        if not names:
            raise FileNotFoundError(f"no *.mix.data feature files under {self.root}")
        self._tracks = names
        step = self.time_context - self.overlap
        for ti, name in enumerate(names):
            for s in self.sources + self.extra_channels:
                p = os.path.join(self.root, f"{name}.{s}.data")
                if not os.path.exists(p):
                    raise FileNotFoundError(f"missing stem feature file {p}")
            n_frames = self._load(name, "mix").shape[0]
            for k in range(segment_count(n_frames, self.time_context, step)):
                self._index.append((ti, k * step))

    def _load(self, name: str, stem: str) -> np.ndarray:
        key = f"{name}.{stem}"
        if key not in self._cache:
            self._cache[key] = load_tensor(os.path.join(self.root, key + ".data"))
        return self._cache[key]

    def __len__(self) -> int:
        return len(self._index)

    @property
    def num_channels(self) -> int:
        return 1 + len(self.extra_channels)

    def _slice(self, arr: np.ndarray, start: int) -> np.ndarray:
        T = self.time_context
        seg = np.asarray(arr[start : start + T], dtype=np.float32)
        if seg.shape[0] < T:  # zero-pad the tail segment (reference behavior)
            seg = np.pad(seg, ((0, T - seg.shape[0]), (0, 0)))
        return seg

    def get(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """Segment i → (input (T, F, C), targets (S, T, F)), scaled.

        Targets are SOURCE-MAJOR — the model's native output layout, so the
        train step runs transpose-free (models/convsep.py)."""
        ti, start = self._index[i]
        name = self._tracks[ti]
        chans = [self._slice(self._load(name, "mix"), start)]
        for c in self.extra_channels:
            chans.append(self._slice(self._load(name, c), start))
        x = np.stack(chans, axis=-1) * self.mult_factor_in
        y = (
            np.stack([self._slice(self._load(name, s), start) for s in self.sources], axis=0)
            * self.mult_factor_out
        )
        return x, y

    def _assemble(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Assemble one batch, using the native fastbatch library when
        available (SURVEY.md §3.2 hot loop #1), else the numpy path."""
        from convsep_tpu.data import fastbatch

        if fastbatch.available():
            seg = np.asarray([self._index[int(i)] for i in idx], np.int64)
            seg_track, seg_start = seg[:, 0].copy(), seg[:, 1].copy()
            T = self.time_context

            def plane(stem, scale):
                tracks = [np.asarray(self._load(n, stem)) for n in self._tracks]
                return fastbatch.assemble_batch(tracks, seg_track, seg_start, T, scale)

            x = np.stack(
                [plane("mix", self.mult_factor_in)]
                + [plane(c, self.mult_factor_in) for c in self.extra_channels],
                axis=-1,
            )
            y = np.stack(
                [plane(s, self.mult_factor_out) for s in self.sources], axis=1
            )
            return x, y
        xs, ys = zip(*(self.get(int(i)) for i in idx))
        return np.stack(xs), np.stack(ys)

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        start: int = 0,
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """One epoch of (inputs (B,T,F,C), targets (B,S,T,F)) batches.

        `start` skips the first `start` batches WITHOUT assembling them
        (deterministic per seed — the mid-epoch resume path)."""
        order = np.arange(len(self._index))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        stop = len(order) - batch_size + 1 if drop_remainder else len(order)
        for b0 in range(start * batch_size, max(stop, 0), batch_size):
            idx = order[b0 : b0 + batch_size]
            x, y = self._assemble(idx)
            if not drop_remainder and x.shape[0] < batch_size:
                pad = batch_size - x.shape[0]
                x = np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                y = np.pad(y, ((0, pad),) + ((0, 0),) * (y.ndim - 1))
            yield x, y


def prefetch_to_device(iterator: Iterator, size: int = 2, sharding=None) -> Iterator:
    """Double-buffered async host→device prefetch.

    The reference's LargeDataset prefetch thread (SURVEY.md §5.2) rebuilt
    with a bounded queue: batches are `jax.device_put` (optionally with a
    NamedSharding for pjit'd steps, or a callable `item → device item` for
    per-leaf sharding such as mesh.put_leading) `size` steps ahead of
    consumption.
    """
    put = sharding if callable(sharding) else (lambda item: jax.device_put(item, sharding))
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
            q.put(_END)
        except Exception as e:  # surface pipeline errors on the consumer side
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, Exception):
            raise item
        yield item
