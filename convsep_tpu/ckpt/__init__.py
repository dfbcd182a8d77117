"""Checkpointing: orbax native checkpoints + reference pickle converter."""

from convsep_tpu.ckpt.orbax_io import CheckpointManager
from convsep_tpu.ckpt.convert_reference import (
    convert_reference_params,
    export_reference_params,
    load_reference_pickle,
)

__all__ = [
    "CheckpointManager",
    "convert_reference_params",
    "export_reference_params",
    "load_reference_pickle",
]
