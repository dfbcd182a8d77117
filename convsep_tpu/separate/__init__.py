"""Separation (inference) layer: fused whole-track, chunked single-track
streaming, push-based online streaming, batched multi-track streaming, and
the watch-folder serving loop."""

from convsep_tpu.separate.chunked import (
    ChunkedSeparator,
    separate_chunk,
    separate_chunk_stereo,
)
from convsep_tpu.separate.online import OnlineSeparator
from convsep_tpu.separate.pipeline import Separator, separate_fused, bucket_length
from convsep_tpu.separate.stereo import StereoSeparator, separate_fused_stereo
from convsep_tpu.separate.stream import (
    StreamSeparator,
    separate_batch,
    separate_batch_scan,
    separate_batch_scan_stereo,
    separate_batch_stereo,
)

__all__ = [
    "ChunkedSeparator",
    "separate_chunk",
    "separate_chunk_stereo",
    "OnlineSeparator",
    "Separator",
    "separate_fused",
    "bucket_length",
    "StereoSeparator",
    "separate_fused_stereo",
    "StreamSeparator",
    "separate_batch",
    "separate_batch_scan",
    "separate_batch_scan_stereo",
    "separate_batch_stereo",
]
