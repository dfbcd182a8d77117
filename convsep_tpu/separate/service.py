"""Watch-folder separation service: a minimal production serving loop.

The reference has no serving layer (SURVEY.md §2 "Serving/API layer:
none"); deployments re-ran separate_dsd.py by hand. This service watches a
directory for mixture wavs and streams them through the batched fused
pipeline as they arrive:

    convsep serve --preset dsd100 --params ckpt/ --input-dir incoming/ \
        --out done/ [--mesh-data 8] [--batch-size 8]

Design: one `StreamSeparator` (mesh-shardable, PCM16 both ways) owns the
compiled program; the poll loop batches whatever arrived since the last
sweep (up to batch_size per dispatch) so sporadic traffic still amortizes
dispatch overhead. A track is "done" when its stem directory contains all
stem wavs — crash-safe resume is just restarting the service (partially
written outputs are re-separated). Files still growing (size changed
between two polls) are left for the next sweep.
"""

from __future__ import annotations

import os
import time
from typing import Callable

import numpy as np

from convsep_tpu.configs.presets import Preset
from convsep_tpu.data.io import read_wav, write_wav
from convsep_tpu.separate.stream import StreamSeparator


class WatchService:
    def __init__(
        self,
        preset: Preset,
        params,
        input_dir: str,
        out_dir: str,
        batch_size: int = 4,
        poll_s: float = 1.0,
        mesh=None,
        score_dir: str | None = None,
        score_filter: str = "comb",
    ):
        self.preset = preset
        self.input_dir = input_dir
        self.out_dir = out_dir
        self.batch_size = int(batch_size)
        self.poll_s = float(poll_s)
        self.stereo = preset.model.decoder_reduce == "all"
        # score-informed serving: <score_dir>/<track>/<source>.notes.txt
        # must exist alongside each incoming wav
        if score_dir is not None and self.stereo:
            raise ValueError("score-informed serving is mono-preset only")
        self.score_dir = score_dir
        self.score_filter = score_filter
        self.sep = StreamSeparator(
            preset, params, mesh=mesh, output_dtype="int16", input_dtype="int16"
        )
        self._sizes: dict[str, int] = {}
        os.makedirs(out_dir, exist_ok=True)

    def _done(self, name: str) -> bool:
        d = os.path.join(self.out_dir, name)
        return all(
            os.path.exists(os.path.join(d, f"{s}.wav")) for s in self.preset.sources
        )

    def _stable(self, path: str) -> bool:
        """Only pick up files whose size stopped changing between sweeps
        (writers may still be uploading)."""
        size = os.path.getsize(path)
        prev = self._sizes.get(path)
        self._sizes[path] = size
        return prev == size

    def pending(self) -> list[str]:
        names = sorted(
            f[: -len(".wav")]
            for f in os.listdir(self.input_dir)
            if f.endswith(".wav")
        )
        out = []
        for n in names:
            if self._done(n):
                continue
            if self.score_dir is not None and not all(
                os.path.exists(os.path.join(self.score_dir, n, f"{s}.notes.txt"))
                for s in self.preset.sources
            ):
                continue  # wav arrived before its score — pick up next sweep
            if self._stable(os.path.join(self.input_dir, n + ".wav")):
                out.append(n)
        return out

    def _extra(self, name: str, audio: np.ndarray) -> np.ndarray:
        from convsep_tpu.data.features import score_channels
        from convsep_tpu.dsp.transform import TransformFFT
        from convsep_tpu.score import parse_note_annotations

        mag = TransformFFT(self.preset.transform).compute_file(
            np.asarray(audio, np.float32)
        )
        notes = [
            parse_note_annotations(os.path.join(self.score_dir, name, f"{s}.notes.txt"))
            for s in self.preset.sources
        ]
        return score_channels(
            mag, notes, self.preset, self.score_filter
        ) * self.preset.train.mult_factor_in

    def _read(self, name: str) -> np.ndarray:
        fs, audio = read_wav(os.path.join(self.input_dir, name + ".wav"))
        if fs != self.preset.transform.fs:
            raise ValueError(f"{name}: fs {fs} != preset fs {self.preset.transform.fs}")
        if self.stereo:
            if audio.ndim != 2:
                raise ValueError(f"{name}: stereo preset needs a stereo wav")
            return audio.T[:2]
        return audio.mean(axis=1) if audio.ndim == 2 else audio

    def _write(self, name: str, stems: np.ndarray) -> None:
        outdir = os.path.join(self.out_dir, name)
        os.makedirs(outdir, exist_ok=True)
        for sname, stem in zip(self.preset.sources, stems):
            wav = stem.T if self.stereo else stem
            write_wav(os.path.join(outdir, f"{sname}.wav"), self.preset.transform.fs, wav)

    def sweep(self) -> int:
        """Process everything currently pending; returns tracks separated."""
        done = 0
        names = self.pending()
        while names:
            batch, names = names[: self.batch_size], names[self.batch_size :]
            tracks = [self._read(n) for n in batch]
            extras = (
                [self._extra(n, t) for n, t in zip(batch, tracks)]
                if self.score_dir is not None
                else None
            )
            for n, stems in zip(batch, self.sep.separate_many(tracks, extras=extras)):
                self._write(n, stems)
                done += 1
        return done

    def run(
        self,
        max_sweeps: int | None = None,
        should_stop: Callable[[], bool] | None = None,
        on_sweep: Callable[[int], None] | None = None,
    ) -> int:
        """Poll loop; returns total tracks separated. Stops after
        `max_sweeps` sweeps (None = forever) or when `should_stop()`."""
        total = 0
        sweeps = 0
        while True:
            n = self.sweep()
            total += n
            sweeps += 1
            if on_sweep is not None:
                on_sweep(n)
            if max_sweeps is not None and sweeps >= max_sweeps:
                return total
            if should_stop is not None and should_stop():
                return total
            time.sleep(self.poll_s)
