"""Device→host transfer helpers for slow (tunneled) links.

BASELINE.md measured this sandbox's single-stream device→host fetch at
~27 MB/s but ~37 MB/s aggregate over 4 concurrent streams — the link is
per-RPC-stream limited, not bandwidth limited. `fetch_parallel` splits a
device array along its leading axis and fetches the slices on a small
thread pool (each `np.asarray` is an independent RPC stream); callers use
it for multi-stem / multi-track outputs. On fast local links it degrades
gracefully to ~the single-stream cost.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

_POOL: ThreadPoolExecutor | None = None

# Process-wide stream-count override, set from an in-run link probe
# (VERDICT r3 #4: r3's own probe measured 4-stream at 5.9 MB/s vs
# single-stream 35.3 in the same run — on link-variance days the
# multi-stream split LOSES, so the mode must be chosen per run, not
# hard-coded). None → the historical default of 4 streams.
_STREAMS: int | None = None


def configure_streams(n: int) -> None:
    """Pin the fetch stream count for this process (1 disables splitting)."""
    global _STREAMS
    _STREAMS = max(1, int(n))


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(max_workers=4, thread_name_prefix="convsep-fetch")
    return _POOL


def fetch_parallel(dev_array, max_streams: int | None = None) -> np.ndarray:
    """np.asarray(dev_array) with leading-axis slices fetched concurrently."""
    streams = max_streams if max_streams is not None else (_STREAMS or 4)
    n = int(dev_array.shape[0])
    if n <= 1 or streams <= 1:
        return np.asarray(dev_array)
    # slice on device first (cheap) so each future fetches its own buffer;
    # the pool caps concurrency at max_workers RPC streams
    parts = [dev_array[i] for i in range(n)]
    futs = [_pool().submit(np.asarray, p) for p in parts]
    return np.stack([f.result() for f in futs])
