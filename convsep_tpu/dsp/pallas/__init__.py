"""Pallas TPU kernels for the DSP hot path (SURVEY.md §2.2)."""


def interpret_default() -> bool:
    """Mosaic kernels compile on TPU only; anywhere else (CPU CI, the
    forced-host-platform mesh tests, a CPU jit inside a TPU process) run
    them in interpreter mode. Device-aware (VERDICT r4 #7)."""
    from convsep_tpu.utils.backend import effective_backend

    return effective_backend() != "tpu"


from convsep_tpu.dsp.pallas.stft_kernel import stft_pallas  # noqa: E402
from convsep_tpu.dsp.pallas.istft_kernel import istft_pallas  # noqa: E402
from convsep_tpu.dsp.pallas.wiener_kernel import wiener_apply_pallas  # noqa: E402

__all__ = ["stft_pallas", "istft_pallas", "wiener_apply_pallas", "interpret_default"]
