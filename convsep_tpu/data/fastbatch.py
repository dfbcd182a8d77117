"""ctypes binding for the native batch-assembly library (native/fastbatch.cpp).

Builds the shared library on first use if a compiler is available (g++,
cached next to the package); falls back transparently to the numpy path in
data/pipeline.py when no toolchain exists. `available()` reports which path
is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native", "fastbatch.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_fastbatch.so")


def _build() -> str | None:
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _OUT],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _OUT
    except (OSError, subprocess.SubprocessError):
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        if lib.fastbatch_abi_version() != 1:
            return None
        lib.assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # tracks
            np.ctypeslib.ndpointer(np.int64, flags="C"),  # track_frames
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),  # seg_track
            np.ctypeslib.ndpointer(np.int64, flags="C"),  # seg_start
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32, flags="C,WRITEABLE"),
            ctypes.c_int64,
        ]
        lib.assemble_batch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def assemble_batch(
    tracks: list[np.ndarray],
    seg_track: np.ndarray,
    seg_start: np.ndarray,
    time_context: int,
    scale: float,
    out: np.ndarray | None = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Gather (batch, T, F) float32 segments from per-track (frames, F)
    arrays with zero tail padding and fused scaling — native fast path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastbatch unavailable (no compiler?)")
    F = tracks[0].shape[1]
    batch = len(seg_track)
    for t in tracks:
        if t.dtype != np.float32 or t.ndim != 2 or t.shape[1] != F:
            raise ValueError(f"tracks must be float32 (frames, {F}); got {t.dtype} {t.shape}")
        if not t.flags["C_CONTIGUOUS"]:
            raise ValueError("tracks must be C-contiguous (memmaps are)")
    if out is None:
        out = np.empty((batch, time_context, F), np.float32)
    ptrs = (ctypes.c_void_p * len(tracks))(
        *[t.ctypes.data_as(ctypes.c_void_p).value for t in tracks]
    )
    frames = np.asarray([t.shape[0] for t in tracks], np.int64)
    lib.assemble_batch(
        ptrs,
        frames,
        len(tracks),
        np.ascontiguousarray(seg_track, np.int64),
        np.ascontiguousarray(seg_start, np.int64),
        batch,
        time_context,
        F,
        float(scale),
        out,
        n_threads,
    )
    return out
