"""Separation (inference) layer: fused whole-track and batched streaming."""

from convsep_tpu.separate.pipeline import Separator, separate_fused, bucket_length

__all__ = ["Separator", "separate_fused", "bucket_length"]
