"""Host-side complement derivation of the last stem.

Under conservative Wiener masks (models/masks.py::wiener_mask with
``conserve_last=True``) the per-source masks sum to EXACTLY 1, so the
stems sum to the iSTFT∘STFT-roundtripped mixture. The last stem can then
be derived ON THE HOST as ``mixture − Σ(other stems)`` — exact up to the
roundtrip float error (~1e-7) and, in int16 mode, the other stems'
round-to-nearest quantization (≤(S−1)/2 LSB before the derived stem's own
final rounding; utils/pcm.py). That skips the last stem's device→host
stream entirely: 1/S fewer download bytes ((S−1)/S of plain) — the
dominant cost on transfer-bound links (docs/TRANSFER_CEILING.md).

Shared by ChunkedSeparator (the r2 original), Separator, and
StreamSeparator (VERDICT r3 #4: the lever was wired only into the chunked
path; streaming/batched fetched all S stems).
"""

from __future__ import annotations

import numpy as np


def derive_last_stem(
    others: np.ndarray,
    mixture: np.ndarray,
    input_dtype: str,
    output_dtype: str,
) -> np.ndarray:
    """last stem = mixture − Σ fetched stems (host arithmetic, float32).

    ``others``: ((S−1)[, 2], L) fetched stems in ``output_dtype``;
    ``mixture``: ([2,] L) the mixture samples the chunk/track program saw,
    in ``input_dtype``, aligned sample-for-sample with the stems.
    """
    mix = mixture.astype(np.float32)
    if input_dtype == "int16":
        mix *= 1.0 / 32768.0
    rest = others.astype(np.float32)
    if output_dtype == "int16":
        rest *= 1.0 / 32768.0
    derived = mix - rest.sum(axis=0)
    if output_dtype == "int16":
        from convsep_tpu.utils.pcm import quantize_pcm16_host

        return quantize_pcm16_host(derived)
    return derived.astype(np.float32)
