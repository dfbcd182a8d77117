"""PCM16 quantization helpers shared by every separation path.

Round-to-nearest (not truncation) everywhere (ADVICE r2): with rounding,
each quantized sample's error is ≤0.5 LSB, which makes the documented
complement-fetch error bound — derived last stem vs device-fetched, ≤
(S−1)/2 + 0.5 LSB before the final cast — actually hold. Truncation toward
zero (plain ``astype(int16)``) doubles the worst case.
"""

from __future__ import annotations

import numpy as np


def quantize_pcm16(x):
    """Device-side float → PCM16: round-to-nearest, clipped. jnp in/out."""
    import jax.numpy as jnp

    return jnp.clip(jnp.round(x * 32768.0), -32768.0, 32767.0).astype(jnp.int16)


def quantize_pcm16_host(x: np.ndarray) -> np.ndarray:
    """Host-side float → PCM16: round-to-nearest, clipped. numpy in/out."""
    return np.clip(
        np.rint(np.asarray(x, np.float32) * 32768.0), -32768, 32767
    ).astype(np.int16)
