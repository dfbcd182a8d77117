"""Pallas TPU kernels for the DSP hot path (SURVEY.md §2.2)."""

from convsep_tpu.dsp.pallas.stft_kernel import stft_pallas
from convsep_tpu.dsp.pallas.istft_kernel import istft_pallas
from convsep_tpu.dsp.pallas.wiener_kernel import wiener_apply_pallas

__all__ = ["stft_pallas", "istft_pallas", "wiener_apply_pallas"]
