"""BSS Eval source-separation metrics (SDR / SIR / SAR), pure numpy.

The reference relied on external campaign tooling (SiSEC's MATLAB BSS Eval,
MIREX scoring — SURVEY.md §2.1 #12 / §4); this framework ships the metric
in-repo. Implements the bss_eval_sources decomposition of Vincent et al.
(2006) as popularized by mir_eval: each estimate is decomposed into

    s_target  — projection onto the `flen`-tap filtered subspace of the
                matching true source
    e_interf  — additional projection onto the subspace spanned by ALL
                true sources' delayed versions
    e_artif   — the remainder

    SDR = 10 log10 |s_target|² / |e_interf + e_artif|²
    SIR = 10 log10 |s_target|² / |e_interf|²
    SAR = 10 log10 |s_target + e_interf|² / |e_artif|²

Projections solve block-Toeplitz least squares via FFT-domain
autocorrelations (scipy solve on the (S·flen)² Gram matrix), matching the
standard formulation at flen=512.
"""

from __future__ import annotations

import itertools

import numpy as np
from numpy.fft import irfft, rfft
from scipy.linalg import solve


def _autocorr_gram(sources: np.ndarray, flen: int, nfft: int) -> np.ndarray:
    """G[(i,a),(j,b)] = <s_i(·-a), s_j(·-b)> via FFT correlations."""
    S, L = sources.shape
    sf = rfft(sources, n=nfft)
    G = np.zeros((S * flen, S * flen))
    # lag index matrix: blk[a, b] = corr[(b - a) mod nfft]
    lags = (np.arange(flen)[None, :] - np.arange(flen)[:, None]) % nfft
    for i in range(S):
        for j in range(S):
            corr = irfft(sf[i] * np.conj(sf[j]), n=nfft)
            G[i * flen : (i + 1) * flen, j * flen : (j + 1) * flen] = corr[lags]
    return G


def _cross_corr(est: np.ndarray, sources: np.ndarray, flen: int, nfft: int) -> np.ndarray:
    """D[(j,b)] = <est(·), s_j(·-b)>."""
    S, _ = sources.shape
    ef = rfft(est, n=nfft)
    sf = rfft(sources, n=nfft)
    D = np.zeros(S * flen)
    for j in range(S):
        corr = irfft(ef * np.conj(sf[j]), n=nfft)
        D[j * flen : (j + 1) * flen] = corr[:flen]
    return D


def _project(est: np.ndarray, sources: np.ndarray, flen: int) -> np.ndarray:
    """Least-squares projection of `est` onto delayed versions of `sources`
    → the projected signal (same length as est)."""
    S, L = sources.shape
    nfft = int(2 ** np.ceil(np.log2(L + flen)))
    G = _autocorr_gram(sources, flen, nfft)
    D = _cross_corr(est, sources, flen, nfft)
    try:
        C = solve(G, D, assume_a="pos").reshape(S, flen)
    except np.linalg.LinAlgError:
        C = np.linalg.lstsq(G, D, rcond=None)[0].reshape(S, flen)
    # filter-and-sum
    out = np.zeros(L)
    for j in range(S):
        filt = np.convolve(sources[j], C[j])[:L]
        out += filt
    return out


def _energy_ratios(s_target, e_interf, e_artif):
    def db(num, den):
        return 10 * np.log10((np.sum(num**2) + 1e-30) / (np.sum(den**2) + 1e-30))

    sdr = db(s_target, e_interf + e_artif)
    sir = db(s_target, e_interf)
    sar = db(s_target + e_interf, e_artif)
    return sdr, sir, sar


def bss_eval_sources(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    flen: int = 512,
    compute_permutation: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(S, L) references + estimates → (sdr, sir, sar, perm), each (S,).

    With compute_permutation the best estimate↔reference assignment by SIR
    is chosen (campaign behavior); default assumes aligned ordering.
    """
    refs = np.asarray(reference_sources, np.float64)
    ests = np.asarray(estimated_sources, np.float64)
    if refs.shape != ests.shape or refs.ndim != 2:
        raise ValueError(f"shape mismatch: refs {refs.shape} vs ests {ests.shape}")
    S, L = refs.shape
    if any(np.sum(r**2) == 0 for r in refs):
        raise ValueError("reference source with zero energy")

    def decompose(est, j):
        s_true = _project(est, refs[j : j + 1], flen)
        p_all = _project(est, refs, flen)
        e_interf = p_all - s_true
        e_artif = est - p_all
        return s_true, e_interf, e_artif

    perms = list(itertools.permutations(range(S))) if compute_permutation else [tuple(range(S))]
    best = None
    for perm in perms:
        rows = [decompose(ests[i], perm[i]) for i in range(S)]
        metrics = np.array([_energy_ratios(*r) for r in rows])  # (S, 3)
        score = metrics[:, 1].mean()  # mean SIR, mir_eval's criterion
        if best is None or score > best[0]:
            best = (score, metrics, perm)
    _, metrics, perm = best
    return metrics[:, 0], metrics[:, 1], metrics[:, 2], np.asarray(perm)


def sdr_only(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Plain (filter-free) SNR-style SDR — fast proxy for smoke tests."""
    ref = np.asarray(reference, np.float64)
    est = np.asarray(estimate, np.float64)
    return float(10 * np.log10(np.sum(ref**2) / (np.sum((ref - est) ** 2) + 1e-30)))
