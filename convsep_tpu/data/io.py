"""Host-side I/O: wav files, raw tensor feature files, pickles.

Reference parity: `util.py` [U] (SURVEY.md §2.1 #3) — scipy.io.wavfile
wrapped with int16↔float32 scaling, raw float32 `.data` files with a
`.shape` sidecar, pickle save/load helpers.

Feature-file convention used by this framework (the reference's exact
suffix scheme is unverified, so this one is self-consistent and documented):
``<track>.<stem>.data`` + ``<track>.<stem>.shape`` where ``<stem>`` is
``mix`` or a source name; `.shape` holds comma-separated dims as text.
Tensors are memory-mapped on load so the training pipeline slices segments
without copying whole tracks.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
from scipy.io import wavfile

INT16_SCALE = 32768.0


def read_wav(path: str | os.PathLike) -> tuple[int, np.ndarray]:
    """Read a wav file → (sample_rate, float32 in [-1, 1) per channel).

    Matches the reference's readAudioScipy int16 scaling [M]; float wavs
    pass through, stereo stays (n, 2).
    """
    fs, data = wavfile.read(os.fspath(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / INT16_SCALE
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return int(fs), data


def write_wav(path: str | os.PathLike, fs: int, audio: np.ndarray) -> None:
    """Write audio as int16 wav (reference writeAudioScipy [M]).

    Float input is scaled/clipped to PCM16; int16 input (e.g. stems already
    quantized on device) is written as-is."""
    audio = np.asarray(audio)
    if audio.dtype != np.int16:
        from convsep_tpu.utils.pcm import quantize_pcm16_host

        audio = quantize_pcm16_host(audio)
    wavfile.write(os.fspath(path), int(fs), audio)


def save_tensor(arr: np.ndarray, path: str | os.PathLike) -> None:
    """Write float32 raw `.data` + `.shape` sidecar (reference tensor store)."""
    path = os.fspath(path)
    if not path.endswith(".data"):
        raise ValueError(f"tensor path must end with .data, got {path}")
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    arr.tofile(path)
    with open(path[: -len(".data")] + ".shape", "w") as f:
        f.write(",".join(str(d) for d in arr.shape))


def load_tensor(path: str | os.PathLike, mmap: bool = True) -> np.ndarray:
    """Load a `.data` tensor; memory-mapped by default."""
    path = os.fspath(path)
    with open(path[: -len(".data")] + ".shape") as f:
        shape = tuple(int(d) for d in f.read().strip().split(","))
    if mmap:
        return np.memmap(path, dtype=np.float32, mode="r", shape=shape)
    return np.fromfile(path, dtype=np.float32).reshape(shape)


def save_obj(obj, path: str | os.PathLike) -> None:
    with open(os.fspath(path), "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_obj(path: str | os.PathLike):
    with open(os.fspath(path), "rb") as f:
        return pickle.load(f)
