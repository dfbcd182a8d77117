"""Data layer: audio/tensor I/O, segmentation, pipelines, synthetic fixtures."""

from convsep_tpu.data.io import (
    read_wav,
    write_wav,
    save_tensor,
    load_tensor,
    save_obj,
    load_obj,
)
from convsep_tpu.data.segment import (
    segment_count,
    segment_frames,
    unsegment_frames,
    pad_frames_to_segments,
)
from convsep_tpu.data.pipeline import SegmentDataset, prefetch_to_device
from convsep_tpu.data.synth import sine_mixture, synth_feature_dir

__all__ = [
    "read_wav",
    "write_wav",
    "save_tensor",
    "load_tensor",
    "save_obj",
    "load_obj",
    "segment_count",
    "segment_frames",
    "unsegment_frames",
    "pad_frames_to_segments",
    "SegmentDataset",
    "prefetch_to_device",
    "sine_mixture",
    "synth_feature_dir",
]
