"""DSP layer: windows, STFT analysis, iSTFT overlap-add resynthesis.

TPU-native equivalent of the reference's `transform.py` [U] (SURVEY.md §2.1
components #1/#2): same math (sinebell window, W/2 front padding, rFFT
frames, window-power-normalized overlap-add), re-expressed with static
shapes so the whole chain lives inside one jitted XLA program instead of a
host-side numpy loop.
"""

from convsep_tpu.dsp.windows import sinebell, hann
from convsep_tpu.dsp.stft import (
    num_frames,
    padded_length,
    frame_signal,
    stft,
    magphase,
    scale_magnitude,
    unscale_magnitude,
)
from convsep_tpu.dsp.istft import overlap_add, ola_norm, istft

__all__ = [
    "sinebell",
    "hann",
    "num_frames",
    "padded_length",
    "frame_signal",
    "stft",
    "magphase",
    "scale_magnitude",
    "unscale_magnitude",
    "overlap_add",
    "ola_norm",
    "istft",
]
