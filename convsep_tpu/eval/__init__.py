"""Evaluation: BSS Eval (SDR/SIR/SAR) in numpy."""

from convsep_tpu.eval.bss_eval import bss_eval_sources, sdr_only

__all__ = ["bss_eval_sources", "sdr_only"]
