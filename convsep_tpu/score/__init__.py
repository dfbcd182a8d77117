"""Score-informed separation support (Bach10)."""

from convsep_tpu.score.masks import (
    Note,
    parse_note_annotations,
    score_mask,
    score_filtered_channels,
    shift_notes,
    stretch_notes,
)

__all__ = [
    "Note",
    "parse_note_annotations",
    "score_mask",
    "score_filtered_channels",
    "shift_notes",
    "stretch_notes",
]
