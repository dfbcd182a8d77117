"""Separation models: flax conv encoder-decoder + time-frequency masks."""

from convsep_tpu.models.masks import wiener_mask, wiener_filter
from convsep_tpu.models.convsep import ConvSep, ConvSepConfig

__all__ = ["wiener_mask", "wiener_filter", "ConvSep", "ConvSepConfig"]
