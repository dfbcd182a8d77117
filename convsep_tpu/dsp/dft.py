"""Matmul-DFT: rFFT/irFFT as MXU matrix multiplies.

TPU-native alternative to XLA's FFT (which lowers to a comparatively slow
composite on TPU): for the frame sizes used here (1024/4096 points) the
full DFT-as-matmul costs O(N²) MACs but lands on the 128×128 MXU systolic
array as ONE large batched matmul per track — measured much faster than the
FFT lowering, and it keeps the whole analysis/resynthesis chain real-valued
(no complex dtype at any point, which some TPU runtimes handle poorly; see
.claude/skills/verify/SKILL.md).

The analysis window is folded into the forward DFT matrix and the synthesis
window into the inverse matrix, so framing → windowing → transform is
exactly one matmul each way. Matrices are built in float64 (numpy,
trace-time constants) and cast to float32.

Selected via ``TransformConfig.fft_impl = "matmul"`` (default; "fft" gives
the jnp.fft path used for bit-parity oracle tests).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from convsep_tpu.dsp.stft import _pad_signal, frame_signal, num_frames
from convsep_tpu.dsp.istft import ola_norm, overlap_add


@lru_cache(maxsize=8)
def _forward_mats(nfft: int, win_len: int, window_key) -> tuple[np.ndarray, np.ndarray]:
    """(W, bins) cos / -sin matrices with the analysis window folded in."""
    window = np.asarray(window_key, np.float64)
    bins = nfft // 2 + 1
    n = np.arange(nfft)[:, None]
    k = np.arange(bins)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    cos_m = np.cos(ang)[:win_len, :]
    sin_m = -np.sin(ang)[:win_len, :]
    return (
        (window[:, None] * cos_m).astype(np.float32),
        (window[:, None] * sin_m).astype(np.float32),
    )


@lru_cache(maxsize=8)
def _inverse_mats(nfft: int, win_len: int, window_key) -> tuple[np.ndarray, np.ndarray]:
    """(bins, W) matrices such that ``re @ A + im @ B`` is
    ``irfft(re + i·im, nfft)[:W] * window``."""
    window = np.asarray(window_key, np.float64)
    bins = nfft // 2 + 1
    k = np.arange(bins)[:, None]
    n = np.arange(win_len)[None, :]
    ang = 2.0 * np.pi * k * n / nfft
    w_k = np.full((bins, 1), 2.0)
    w_k[0] = 1.0
    if nfft % 2 == 0:
        w_k[-1] = 1.0
    a = (w_k * np.cos(ang)) / nfft
    b = (-w_k * np.sin(ang)) / nfft
    return (
        (a * window[None, :]).astype(np.float32),
        (b * window[None, :]).astype(np.float32),
    )


def _key(window: np.ndarray) -> tuple:
    return tuple(np.asarray(window, np.float64).tolist())


_PRECISIONS = {
    # TPU fp32 matmul decompositions: bf16x6 (fp32-exact), bf16x3 (~2.4e-7
    # rel — below the 3e-5 PCM16 output quantization step), bf16x1.
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@partial(jax.jit, static_argnames=("hop", "nfft", "win_len", "precision"))
def _stft_matmul_impl(signal, cos_m, sin_m, hop, nfft, win_len, precision="highest"):
    nf = num_frames(signal.shape[-1], hop)
    padded = _pad_signal(signal, win_len, hop)
    frames = frame_signal(padded, win_len, hop, nf)  # (..., nf, W) — no window
    # "highest" (default): the bf16x1 decomposition's error (~3e-3 max on
    # audio-scale signals) would dominate the DSP fidelity budget; these
    # matmuls are a tiny fraction of pipeline FLOPs. "high" (bf16x3) halves
    # the pass count at ~2.4e-7 rel error — below PCM16 quantization; the
    # int16-output serving path selects it via TransformConfig.dft_precision.
    prec = _PRECISIONS[precision]
    re = jnp.matmul(frames, cos_m, preferred_element_type=jnp.float32, precision=prec)
    im = jnp.matmul(frames, sin_m, preferred_element_type=jnp.float32, precision=prec)
    return re, im


def stft_matmul(
    signal: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    nfft: int | None = None,
    precision: str = "highest",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT via MXU matmuls → (real, imag) float32, same framing as dsp.stft."""
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if nfft is None:
        nfft = win_len
    cos_m, sin_m = _forward_mats(nfft, win_len, _key(window))
    sig = jnp.asarray(signal, jnp.float32)
    re, im = _stft_matmul_impl(
        sig, jnp.asarray(cos_m), jnp.asarray(sin_m), int(hop), int(nfft), win_len,
        precision,
    )
    return re, im


@partial(jax.jit, static_argnames=("hop", "length", "win_len", "precision"))
def _istft_matmul_impl(re, im, inv_a, inv_b, inv_norm, hop, length, win_len,
                       precision="highest"):
    prec = _PRECISIONS[precision]
    frames = jnp.matmul(
        re, inv_a, preferred_element_type=jnp.float32, precision=prec
    ) + jnp.matmul(
        im, inv_b, preferred_element_type=jnp.float32, precision=prec
    )  # (..., nf, W), synthesis window already folded in
    data = overlap_add(frames, hop) * inv_norm
    front = win_len // 2
    return data[..., front : front + length].astype(jnp.float32)


def istft_matmul(
    re: jnp.ndarray,
    im: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    length: int,
    analysis_window: np.ndarray | None = None,
    nfft: int | None = None,
    precision: str = "highest",
) -> jnp.ndarray:
    """Inverse of stft_matmul: (…, nf, bins)×2 → (…, length). Matches
    dsp.istft semantics (window-power-normalized OLA, W//2 front drop)."""
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if analysis_window is None:
        analysis_window = window
    if nfft is None:
        nfft = 2 * (int(re.shape[-1]) - 1)
    expect = num_frames(length, hop)
    if int(re.shape[-2]) != expect:
        raise ValueError(
            f"re/im have {re.shape[-2]} frames but length={length}, hop={hop} "
            f"implies {expect}"
        )
    inv_a, inv_b = _inverse_mats(nfft, win_len, _key(window))
    inv_norm = 1.0 / ola_norm(
        window.astype(np.float32), np.asarray(analysis_window, np.float32), int(hop), expect
    )
    return _istft_matmul_impl(
        re,
        im,
        jnp.asarray(inv_a),
        jnp.asarray(inv_b),
        jnp.asarray(inv_norm),
        int(hop),
        int(length),
        win_len,
        precision,
    )
