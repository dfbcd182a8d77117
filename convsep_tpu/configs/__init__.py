"""Frozen config tree + per-dataset presets (SURVEY.md §5.6)."""

from convsep_tpu.configs.presets import (
    TransformConfig,
    TrainConfig,
    SepConfig,
    Preset,
    PRESETS,
    get_preset,
)

__all__ = [
    "TransformConfig",
    "TrainConfig",
    "SepConfig",
    "Preset",
    "PRESETS",
    "get_preset",
]
