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


def bss_eval_windowed(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    fs: int,
    window_s: float = 30.0,
    hop_s: float = 15.0,
    flen: int = 512,
    reduce: str = "median",
) -> dict:
    """Campaign-style windowed evaluation (SiSEC/BSS Eval v3 convention:
    30 s windows at 15 s hop, median over windows — VERDICT r1 #3).

    (S, L) references + estimates → {"SDR": (S,), "SIR": (S,), "SAR": (S,),
    "windows": n, "per_window": (n, S, 3)}. Windows where any reference is
    silent (zero energy) are skipped, matching campaign practice.
    """
    refs = np.asarray(reference_sources, np.float64)
    ests = np.asarray(estimated_sources, np.float64)
    if refs.shape != ests.shape or refs.ndim != 2:
        raise ValueError(f"shape mismatch: refs {refs.shape} vs ests {ests.shape}")
    S, L = refs.shape
    win = int(round(window_s * fs))
    hop = int(round(hop_s * fs))
    if L <= win:
        starts = [0]
        win = L
    else:
        starts = list(range(0, L - win + 1, hop))
    rows = []
    for s0 in starts:
        r = refs[:, s0 : s0 + win]
        e = ests[:, s0 : s0 + win]
        if any(np.sum(x**2) == 0 for x in r):
            continue  # silent-reference window: metric undefined, skip
        sdr, sir, sar, _ = bss_eval_sources(r, e, flen=flen)
        rows.append(np.stack([sdr, sir, sar], axis=-1))  # (S, 3)
    if not rows:
        raise ValueError("no evaluable windows (every window has a silent reference)")
    per_window = np.stack(rows)  # (n, S, 3)
    red = np.median if reduce == "median" else np.mean
    agg = red(per_window, axis=0)  # (S, 3)
    return {
        "SDR": agg[:, 0],
        "SIR": agg[:, 1],
        "SAR": agg[:, 2],
        "windows": len(rows),
        "per_window": per_window,
    }


def bss_eval_stereo(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    flen: int = 512,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stereo metric for (S, 2, L) stems (the stereo-native model's output
    layout — VERDICT r1 #3): per-channel bss_eval_sources decompositions,
    energy-combined per source.

    Each channel's estimate is decomposed against that channel's references
    (independent per-channel distortion filters, the bss_eval_images
    relaxation); SDR/SIR/SAR per source then come from the channel-summed
    target/interference/artifact energies, so a source panned hard to one
    ear is dominated by the ear that carries it.
    """
    refs = np.asarray(reference_sources, np.float64)
    ests = np.asarray(estimated_sources, np.float64)
    if refs.shape != ests.shape or refs.ndim != 3 or refs.shape[1] != 2:
        raise ValueError(f"expected (S, 2, L) stems, got {refs.shape} / {ests.shape}")
    S = refs.shape[0]
    # channel-summed energies per source: |s_t|², |e_i|², |e_i+e_a|²,
    # |s_t+e_i|², |e_a|² — enough for all three ratios
    acc = np.zeros((S, 5))
    for c in range(2):
        rc, ec = refs[:, c], ests[:, c]
        active = [j for j in range(S) if np.sum(rc[j] ** 2) > 0]
        if not active:
            continue
        # projection basis: this channel's reference, or — for hard-panned
        # sources silent in this channel — the source's OTHER-channel
        # content, so leakage into the wrong ear counts as interference
        # (not artifact) while keeping the Gram nonsingular
        basis_rows, basis_idx = [], []
        for j in range(S):
            if j in active:
                basis_rows.append(rc[j])
                basis_idx.append(j)
            elif np.sum(refs[j, 1 - c] ** 2) > 0:
                basis_rows.append(refs[j, 1 - c])
                basis_idx.append(j)
        basis = np.stack(basis_rows)
        for j in range(S):
            if j in active:
                s_true = _project(ec[j], rc[j : j + 1], flen)
            else:  # no target in this channel: everything is interf/artif
                s_true = np.zeros_like(ec[j])
            p_all = _project(ec[j], basis, flen)
            e_interf = p_all - s_true
            e_artif = ec[j] - p_all
            acc[j, 0] += np.sum(s_true**2)
            acc[j, 1] += np.sum(e_interf**2)
            acc[j, 2] += np.sum((e_interf + e_artif) ** 2)
            acc[j, 3] += np.sum((s_true + e_interf) ** 2)
            acc[j, 4] += np.sum(e_artif**2)
    eps = 1e-30
    sdr = 10 * np.log10((acc[:, 0] + eps) / (acc[:, 2] + eps))
    sir = 10 * np.log10((acc[:, 0] + eps) / (acc[:, 1] + eps))
    sar = 10 * np.log10((acc[:, 3] + eps) / (acc[:, 4] + eps))
    return sdr, sir, sar


def sdr_only(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Plain (filter-free) SNR-style SDR — fast proxy for smoke tests.

    Zero-energy references (synthetic fixtures can produce silent stems)
    return -inf instead of warning/raising like the main path.
    """
    ref = np.asarray(reference, np.float64)
    est = np.asarray(estimate, np.float64)
    ref_energy = np.sum(ref**2)
    if ref_energy == 0.0:
        return float("-inf")
    return float(10 * np.log10(ref_energy / (np.sum((ref - est) ** 2) + 1e-30)))
