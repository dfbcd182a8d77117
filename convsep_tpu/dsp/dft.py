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


# ---------------------------------------------------------------------------
# Cooley–Tukey factored matmul-DFT
#
# For N = N1·N2 the direct (frames @ (N, bins)) DFT costs O(N²) MACs/frame;
# the two-pass factorization costs O(N·(N1+N2)) — 32× fewer FLOPs at
# N=4096=64² — while every pass is still a plain MXU matmul with K=N1|N2.
# Measured on the v5e: the direct 4096-pt resynthesis matmuls run at ~85%
# of bf16 peak (fusion.11 + convolution_add, 3.46 ms/track highres4096 —
# 2026-08-18 trace), i.e. they are MXU-saturated and only a FLOP reduction
# can speed them up. Decimation-in-time with n = N2·n1 + n2,
# k = k1 + N1·k2:
#
#   X[k1 + N1·k2] = Σ_{n2} e^{-2πi n2 k1/N} (Σ_{n1} x[N2·n1+n2] E1[n1,k1])
#                     · E2[n2,k2]
#
# inner DFT over n1 → twiddle → outer DFT over n2; the inverse runs the
# mirror (hermitian-extended spectrum, +i sign, real part out).
# ---------------------------------------------------------------------------


def _split_factor(n: int) -> tuple[int, int] | None:
    """Balanced factorization n = a·b with a,b ≥ 8, a as close to √n as
    possible; None when n has no such split (tiny/prime sizes)."""
    for a in range(int(np.sqrt(n)), 7, -1):
        if n % a == 0 and n // a >= 8:
            return a, n // a
    return None


@lru_cache(maxsize=8)
def _ct_forward_consts(nfft: int) -> tuple:
    """Decimation-in-frequency constants: n = n1 + N1·n2, k = N2·k1 + k2 —
    the output (k1, k2) flattens row-major to standard bin order with NO
    transpose. (N1, N2, inner E2 cos/sin (N2,N2) over n2, twiddle cos/sin
    (N1,N2) [n1,k2], outer E1 cos/sin (N1,N1) [n1,k1]), float32."""
    a, b = _split_factor(nfft)  # N1, N2
    n1 = np.arange(a)
    n2 = np.arange(b)
    k1 = np.arange(a)
    k2 = np.arange(b)
    ang2 = 2.0 * np.pi * np.outer(n2, k2) / b
    angt = 2.0 * np.pi * np.outer(n1, k2) / nfft
    ang1 = 2.0 * np.pi * np.outer(n1, k1) / a
    f32 = lambda x: x.astype(np.float32)  # noqa: E731
    return (
        a, b,
        f32(np.cos(ang2)), f32(-np.sin(ang2)),
        f32(np.cos(angt)), f32(-np.sin(angt)),
        f32(np.cos(ang1)), f32(-np.sin(ang1)),
    )


def _dft_frames_factored(frames: jnp.ndarray, nfft: int, bins: int, prec):
    """Windowed frames (..., nf, N) → (re, im) (..., nf, bins) via the
    two-pass factored DFT (frames must already carry the analysis window)."""
    a, b, c2, s2, tc, ts, c1, s1 = (
        jnp.asarray(v) if isinstance(v, np.ndarray) else v
        for v in _ct_forward_consts(nfft)
    )
    ein = partial(
        jnp.einsum, preferred_element_type=jnp.float32, precision=prec
    )
    x = frames.reshape(*frames.shape[:-1], b, a)  # [n2, n1] (n = n1 + N1·n2)
    # inner DFT over n2 → (..., n1, k2); x is real: two matmuls
    yr = ein("...ba,bd->...ad", x, c2)
    yi = ein("...ba,bd->...ad", x, s2)
    # twiddle e^{-2πi n1 k2/N} on (n1, k2), elementwise complex
    zr = yr * tc - yi * ts
    zi = yr * ts + yi * tc
    # outer DFT over n1 → (..., k1, k2); flat k = N2·k1 + k2 (row-major)
    xr = ein("...ad,ac->...cd", zr, c1) - ein("...ad,ac->...cd", zi, s1)
    xi = ein("...ad,ac->...cd", zr, s1) + ein("...ad,ac->...cd", zi, c1)
    xr = xr.reshape(*xr.shape[:-2], a * b)[..., :bins]
    xi = xi.reshape(*xi.shape[:-2], a * b)[..., :bins]
    return xr, xi


@lru_cache(maxsize=8)
def _ct_inverse_consts(nfft: int) -> tuple:
    """Inverse (+i) factored DFT over the rfft HALF-spectrum only: the
    hermitian tail is folded in analytically (×2 weight + two rank-1
    corrections), so no flip/concat extension of the big tensor ever
    materializes. Bins k ∈ [0, N/2) are indexed k = k1 + N1·k2 (k1 < N1,
    k2 < N/(2·N1)); output n = N2·m1 + m2 with N2 = N/N1.

    Returns (N1, N2, K2, E2⁺ cos/sin (K2,N2) over k2, twiddle⁺ cos/sin
    (N1,N2) [k1,m2], E1⁺ cos/sin (N1,N1) [k1,m1], alt (N2,) = (−1)^{m2})."""
    a, b = _split_factor(nfft)  # N1, N2 = nfft // a
    assert a * b == nfft and (nfft // 2) % a == 0
    k2n = (nfft // 2) // a  # K2: bins-range k2 extent
    k1 = np.arange(a)
    k2 = np.arange(k2n)
    m1 = np.arange(a)
    m2 = np.arange(b)
    # e^{+2πi m2 (N1·k2)/N} = e^{+2πi m2 k2/N2}
    ang2 = 2.0 * np.pi * np.outer(k2, m2) / b
    ang_t = 2.0 * np.pi * np.outer(k1, m2) / nfft
    ang1 = 2.0 * np.pi * np.outer(k1, m1) / a
    f32 = lambda x: x.astype(np.float32)  # noqa: E731
    return (
        a, b, k2n,
        f32(np.cos(ang2)), f32(np.sin(ang2)),
        f32(np.cos(ang_t)), f32(np.sin(ang_t)),
        f32(np.cos(ang1)), f32(np.sin(ang1)),
        f32(np.where(np.arange(b) % 2 == 0, 1.0, -1.0)),
    )


def _idft_frames_factored(re, im, nfft: int, prec):
    """Hermitian spectrum halves (..., nf, bins) → real frames
    (..., nf, nfft)·(1/N not applied — caller folds it with the window).

    x[n] = Re Σ_{k<bins} w_k X[k] e^{+2πi nk/N} (w_0 = w_{N/2} = 1, else 2)
    — computed as 2·(factored sum over k < N/2) − re[0] (k=0 overcount)
    + re[N/2]·(−1)^n (the Nyquist bin, whose imag is ignored exactly like
    the direct path / numpy irfft)."""
    a, b, k2n, c2, s2, tc, ts, c1, s1, alt = (
        jnp.asarray(v) if isinstance(v, np.ndarray) else v
        for v in _ct_inverse_consts(nfft)
    )
    half = nfft // 2
    # k = k1 + N1·k2 ⇒ row-major reshape (K2, N1) = [k2, k1]
    xr = re[..., :half].reshape(*re.shape[:-1], k2n, a)
    xi = im[..., :half].reshape(*im.shape[:-1], k2n, a)
    ein = partial(
        jnp.einsum, preferred_element_type=jnp.float32, precision=prec
    )
    # inner inverse DFT over k2 → (..., k1, m2)
    ar = ein("...bc,bm->...cm", xr, c2) - ein("...bc,bm->...cm", xi, s2)
    ai = ein("...bc,bm->...cm", xr, s2) + ein("...bc,bm->...cm", xi, c2)
    # twiddle e^{+2πi m2 k1/N} on (..., k1, m2)
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc
    # outer over k1, REAL part only → (..., m1, m2); n = N2·m1 + m2
    x = ein("...cm,cl->...lm", br, c1) - ein("...cm,cl->...lm", bi, s1)
    # hermitian fold (×2) and the two rank-1 corrections, fused elementwise
    x = 2.0 * x - re[..., 0, None, None] + re[..., half, None, None] * alt
    return x.reshape(*x.shape[:-2], a * b)


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


@partial(jax.jit, static_argnames=("hop", "nfft", "win_len", "precision"))
def _stft_matmul_ct_impl(signal, window, hop, nfft, win_len, precision="highest"):
    nf = num_frames(signal.shape[-1], hop)
    padded = _pad_signal(signal, win_len, hop)
    frames = frame_signal(padded, win_len, hop, nf) * window  # (..., nf, W)
    if win_len < nfft:
        frames = jnp.pad(frames, (*(((0, 0),) * (frames.ndim - 1)), (0, nfft - win_len)))
    return _dft_frames_factored(frames, nfft, nfft // 2 + 1, _PRECISIONS[precision])


def _ct_supported(nfft: int) -> bool:
    f = _split_factor(nfft)
    return f is not None and nfft % 2 == 0 and (nfft // 2) % f[0] == 0


def _use_factored(algorithm: str, nfft: int) -> bool:
    if algorithm == "factored":
        if not _ct_supported(nfft):
            raise ValueError(f"nfft={nfft} has no balanced even factorization")
        return True
    if algorithm == "direct":
        return False
    if algorithm != "auto":
        raise ValueError(f"unknown DFT algorithm {algorithm!r}; have auto | direct | factored")
    # measured crossover on the v5e (2026-08-18, batched fused programs):
    # 4096-pt highres4096 vmap8 15.00 → 13.31 ms/track with factored (+13%),
    # but 1024-pt dsd100 scan64 REGRESSES 9708× → 8680× (the ~0.6 ms/track
    # direct DFT is already cheap and the factored passes pay vmap-layout
    # copies), so auto only engages at 2048+ points.
    return nfft >= 2048 and _ct_supported(nfft)


def stft_matmul(
    signal: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    nfft: int | None = None,
    precision: str = "highest",
    algorithm: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """STFT via MXU matmuls → (real, imag) float32, same framing as dsp.stft.

    `algorithm`: "direct" = one (W, bins) matmul per half; "factored" = the
    two-pass Cooley–Tukey form (O(N·(N1+N2)) MACs, ~32× fewer at 4096);
    "auto" (default) = factored for nfft ≥ 2048 (the measured v5e
    crossover; identical math, ≤6e-7 rel vs direct at "highest").
    """
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if nfft is None:
        nfft = win_len
    sig = jnp.asarray(signal, jnp.float32)
    if _use_factored(algorithm, int(nfft)):
        return _stft_matmul_ct_impl(
            sig, jnp.asarray(window, jnp.float32), int(hop), int(nfft), win_len,
            precision,
        )
    cos_m, sin_m = _forward_mats(nfft, win_len, _key(window))
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


@partial(jax.jit, static_argnames=("hop", "length", "win_len", "nfft", "precision"))
def _istft_matmul_ct_impl(re, im, win_over_n, inv_norm, hop, length, win_len,
                          nfft, precision="highest"):
    frames = _idft_frames_factored(re, im, nfft, _PRECISIONS[precision])
    frames = frames[..., :win_len] * win_over_n  # irfft[:W] · window, 1/N folded
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
    algorithm: str = "auto",
    output_dtype: str = "float32",
) -> jnp.ndarray:
    """Inverse of stft_matmul: (…, nf, bins)×2 → (…, length). Matches
    dsp.istft semantics (window-power-normalized OLA, W//2 front drop).
    `algorithm` as in :func:`stft_matmul`, plus "ct_pallas": the fused
    factored-iDFT/window/OLA Mosaic kernel (dsp/pallas/ct_istft_kernel) —
    on TPU, "auto" prefers it over the XLA factored chain whenever the
    shape qualifies (the chain's ~6 HBM frame tensors are the 4096-pt
    presets' MFU ceiling; VERDICT r3 #4).

    ``output_dtype="int16"`` returns PCM16 samples (utils.pcm math): the
    ct_pallas kernel quantizes in its epilogue (halving its HBM writes and
    the unpermute repack); other algorithms quantize after synthesis —
    identical results either way."""
    window = np.asarray(window, np.float64)
    win_len = len(window)
    if analysis_window is None:
        analysis_window = window
    if nfft is None:
        nfft = 2 * (int(re.shape[-1]) - 1)
    if output_dtype not in ("float32", "int16"):
        raise ValueError(f"output_dtype must be float32|int16, got {output_dtype}")
    if algorithm in ("ct_pallas", "auto"):
        from convsep_tpu.dsp.pallas.ct_istft_kernel import (
            ct_pallas_supported,
            istft_ct_pallas,
        )

        explicit = algorithm == "ct_pallas"
        # auto engages only where factored already wins (nfft >= 2048) AND
        # a real TPU is the target device (interpret mode would be a
        # de-opt); device-aware per VERDICT r4 #7
        from convsep_tpu.utils.backend import effective_backend

        if explicit or (
            _use_factored(algorithm, int(nfft))
            and ct_pallas_supported(int(nfft), win_len, int(hop))
            and effective_backend(re, im) == "tpu"
        ):
            return istft_ct_pallas(
                re, im, window, int(hop), int(length),
                analysis_window=analysis_window, nfft=int(nfft),
                precision=precision, output_dtype=output_dtype,
            )
    if output_dtype == "int16":
        from convsep_tpu.utils.pcm import quantize_pcm16

        return quantize_pcm16(
            istft_matmul(
                re, im, window, hop, length, analysis_window=analysis_window,
                nfft=nfft, precision=precision, algorithm=algorithm,
            )
        )
    expect = num_frames(length, hop)
    if int(re.shape[-2]) != expect:
        raise ValueError(
            f"re/im have {re.shape[-2]} frames but length={length}, hop={hop} "
            f"implies {expect}"
        )
    inv_norm = 1.0 / ola_norm(
        window.astype(np.float32), np.asarray(analysis_window, np.float32), int(hop), expect
    )
    if _use_factored(algorithm, int(nfft)):
        return _istft_matmul_ct_impl(
            re,
            im,
            jnp.asarray((window / float(nfft)).astype(np.float32)),
            jnp.asarray(inv_norm),
            int(hop),
            int(length),
            win_len,
            int(nfft),
            precision,
        )
    inv_a, inv_b = _inverse_mats(nfft, win_len, _key(window))
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


def resolve_masked_synthesis(
    algorithm: str, nfft: int, win_len: int, hop: int, p: float = 1.0,
    arrays: tuple = (),
) -> str:
    """What :func:`istft_wiener` will actually run for these settings on
    the current default backend — "ct_pallas_wiener" or the XLA chain's
    CONCRETE algorithm ("ct_pallas" | "factored" | "direct" — never the
    literal "auto"; ADVICE r4). The single source of truth for the auto
    envelope (the bench records this per preset so routing is never
    assumed)."""
    if algorithm not in ("ct_pallas_wiener", "auto"):
        return algorithm
    from convsep_tpu.dsp.pallas.ct_istft_kernel import ct_pallas_supported
    from convsep_tpu.utils.backend import effective_backend

    kernel_ok = ct_pallas_supported(int(nfft), int(win_len), int(hop))
    on_tpu = effective_backend(*arrays) == "tpu"
    if algorithm == "ct_pallas_wiener" or (
        int(nfft) >= 2048 and kernel_ok and p in (1.0, 2.0) and on_tpu
    ):
        return "ct_pallas_wiener"
    # name what istft_matmul's own "auto" will run for these settings —
    # the same envelope checks it applies at dispatch
    if _use_factored("auto", int(nfft)):
        return "ct_pallas" if kernel_ok and on_tpu else "factored"
    return "direct"


def istft_wiener(
    y: jnp.ndarray,
    re: jnp.ndarray,
    im: jnp.ndarray,
    window: np.ndarray,
    hop: int,
    length: int,
    nfft: int | None = None,
    precision: str = "highest",
    algorithm: str = "auto",
    output_dtype: str = "float32",
    p: float = 1.0,
    eps: float = 1e-8,
    conserve_last: bool = False,
    ny: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Masked resynthesis: Wiener-mask the mixture spectrum with per-source
    magnitudes ``y`` (…, S, nf, bins; sources at axis −3) and iSTFT —
    semantically ``istft_matmul(mask·re, mask·im, …)`` with ``mask =
    wiener_mask(y, p, eps, axis=-3, conserve_last)``.

    ``ny``: (…, nf) real Nyquist row when re/im are the fused forward
    kernel's (…, nf, nfft/2) bodies (pallas/ct_stft_kernel.py) — passed
    through to the mega-kernel; the XLA fallback concatenates it back.

    ``algorithm="auto"`` routes through the fused Wiener+iSTFT Mosaic
    mega-kernel (dsp/pallas/ct_istft_kernel.istft_ct_pallas_wiener) on TPU
    whenever the shape/exponent qualify — the masked spectra est_re/est_im
    (2S full-spectrogram HBM tensors plus their relayout/pad passes, ~38 ms
    of the highres4096 b32 budget; docs/PALLAS_PROFILE.md addendum 11)
    never materialize. "ct_pallas_wiener" forces the kernel (error if
    unsupported); any other value takes the XLA mask+istft path with that
    algorithm."""
    if nfft is None:
        nfft = 2 * (int(re.shape[-1]) - (0 if ny is not None else 1))
    window = np.asarray(window, np.float64)
    # auto envelope (resolve_masked_synthesis): qualifying shapes with
    # nfft ≥ 2048 on TPU — where the plain ct kernel already wins and the
    # est materialization is the measured 38 ms budget item; 1024-pt
    # engagement pends an on-chip A/B vs the direct-DFT chain
    explicit = algorithm == "ct_pallas_wiener"
    algorithm = resolve_masked_synthesis(
        algorithm, int(nfft), len(window), int(hop), p, arrays=(y, re, im)
    )
    if algorithm == "ct_pallas_wiener":
        if explicit or y.shape[-1] == re.shape[-1]:
            # explicit requests surface the kernel's own shape errors
            from convsep_tpu.dsp.pallas.ct_istft_kernel import (
                istft_ct_pallas_wiener,
            )

            return istft_ct_pallas_wiener(
                y, re, im, window, int(hop), int(length), nfft=int(nfft),
                precision=precision, output_dtype=output_dtype,
                p=p, eps=eps, conserve_last=conserve_last, ny=ny,
            )
        algorithm = "auto"
    from convsep_tpu.models.masks import wiener_mask

    if ny is not None:
        # XLA fallback: rebuild the full half-spectrum (one concat pass)
        re = jnp.concatenate([re, ny[..., None]], axis=-1)
        im = jnp.concatenate([im, jnp.zeros_like(ny)[..., None]], axis=-1)

    # bf16 mask-tail parity with the mega-kernel: the kernel upcasts y to
    # f32 in VMEM before the ratio — the XLA chain must do the same so
    # the two paths stay equal (tests compare them elementwise)
    mask = wiener_mask(
        y.astype(jnp.float32), p=p, eps=eps, axis=-3,
        conserve_last=conserve_last,
    )
    return istft_matmul(
        mask * jnp.expand_dims(re, -3), mask * jnp.expand_dims(im, -3),
        window, hop, length, nfft=nfft, precision=precision,
        algorithm=algorithm, output_dtype=output_dtype,
    )
