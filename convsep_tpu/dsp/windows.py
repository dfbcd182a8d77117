"""Analysis/synthesis windows.

Reference parity: `sinebell` in the reference's `transform.py` [U]
(SURVEY.md §2.1 #1) — the sine window `sin(pi * n / N)` used for both
analysis and synthesis, whose squared overlap-add at hop = N/2 is constant.
Computed in float64 numpy (windows are trace-time constants) and cast at
use sites.
"""

from __future__ import annotations

import numpy as np


def sinebell(length: int) -> np.ndarray:
    """Sine-bell window: ``w[n] = sin(pi * n / length)``.

    Matches the reference definition (transform.py [U]): the first sample is
    exactly 0 and the window is not symmetric-periodic-corrected — the
    overlap-add normalization sequence in :mod:`convsep_tpu.dsp.istft`
    absorbs the resulting non-constant window power.
    """
    if length <= 0:
        raise ValueError(f"window length must be positive, got {length}")
    return np.sin(np.pi * np.arange(length) / float(length))


def hann(length: int) -> np.ndarray:
    """Periodic Hann window (sinebell squared)."""
    if length <= 0:
        raise ValueError(f"window length must be positive, got {length}")
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(length) / float(length))
