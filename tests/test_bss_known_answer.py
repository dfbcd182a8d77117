"""Known-answer BSS Eval validation (VERDICT r2 #5).

tests/test_bss_eval.py checks the metric's *properties*; these tests check
its *values* against closed-form answers, so a wrong Gram solve (the
(S·flen)² autocorrelation system in eval/bss_eval.py::_project) cannot
survive, not merely an inconsistent one.

Method: build estimates whose Vincent decomposition is known EXACTLY by
construction, using an INDEPENDENT projector — an explicit (L, S·flen)
delayed-source design matrix + np.linalg.lstsq, no FFT correlations, no
shared code with the implementation under test:

* references carry flen−1 trailing zeros, so every delayed copy lives in
  R^L and the implementation's convolution-truncation is a no-op for any
  in-subspace signal — closed forms are exact, not approximate;
* `n_perp` is noise orthogonalized against the FULL delayed-source span →
  pure artifact; `q` is ref_j orthogonalized against span(delayed ref_i)
  but still inside the full span → pure interference for estimate i;
* a short FIR (len ≤ flen) of ref_i is pure target.

Every energy in the expected SDR/SIR/SAR is computed from the constructed
pieces themselves, to <0.1 dB.
"""

import numpy as np
import pytest

from convsep_tpu.eval import (
    bss_eval_sources,
    bss_eval_stereo,
    bss_eval_windowed,
)

FLEN = 16
L = 4000


def _design(sources: np.ndarray, flen: int) -> np.ndarray:
    """(S, L) zero-tailed sources → (L, S*flen) explicit delayed columns."""
    S, n = sources.shape
    A = np.zeros((n, S * flen))
    for j in range(S):
        for b in range(flen):
            A[b:, j * flen + b] = sources[j, : n - b]
    return A


def _perp(v: np.ndarray, A: np.ndarray) -> np.ndarray:
    """Component of v orthogonal to span(A) via independent lstsq."""
    coef, *_ = np.linalg.lstsq(A, v, rcond=None)
    return v - A @ coef


def _db(num: float, den: float) -> float:
    return 10 * np.log10(num / den)


@pytest.fixture
def refs(rng):
    r = rng.standard_normal((2, L))
    r[:, -(FLEN - 1):] = 0.0  # keep every delayed copy inside R^L
    return r


def test_known_answer_scale_plus_orthogonal_noise(refs, rng):
    """est = a·ref + b·n_perp → SDR = SAR = closed form, SIR ≈ ∞."""
    A_full = _design(refs, FLEN)
    n_perp = _perp(rng.standard_normal(L), A_full)
    a, b = 0.7, 0.05
    ests = np.stack([a * refs[0] + b * n_perp, refs[1]])
    sdr, sir, sar, _ = bss_eval_sources(refs, ests, flen=FLEN)
    expected = _db(a**2 * np.sum(refs[0] ** 2), b**2 * np.sum(n_perp**2))
    assert abs(sdr[0] - expected) < 0.1, (sdr[0], expected)
    assert abs(sar[0] - expected) < 0.1, (sar[0], expected)
    assert sir[0] > 60  # zero interference by construction
    assert sdr[1] > 60  # untouched source stays perfect


def test_known_answer_pure_interference(refs):
    """est = ref_i + c·q, q ⟂ span_i but inside span_all → SIR = SDR =
    closed form, SAR ≈ ∞ (no artifact)."""
    A_1 = _design(refs[:1], FLEN)
    q = _perp(refs[1], A_1)  # ref2 minus its span_1 component: in span_all
    c = 0.2
    ests = np.stack([refs[0] + c * q, refs[1]])
    sdr, sir, sar, _ = bss_eval_sources(refs, ests, flen=FLEN)
    expected = _db(np.sum(refs[0] ** 2), c**2 * np.sum(q**2))
    assert abs(sir[0] - expected) < 0.1, (sir[0], expected)
    assert abs(sdr[0] - expected) < 0.1, (sdr[0], expected)
    assert sar[0] > 60


def test_known_answer_in_subspace_filter(refs):
    """est = h*ref (len(h) ≤ flen) is ALL target: every ratio huge."""
    h = np.array([0.9, -0.2, 0.1, 0.05, -0.03, 0.02, 0.01, -0.01])
    est0 = np.convolve(refs[0], h)[:L]
    ests = np.stack([est0, refs[1]])
    sdr, sir, sar, _ = bss_eval_sources(refs, ests, flen=FLEN)
    assert sdr[0] > 60 and sir[0] > 60 and sar[0] > 60


def test_known_answer_full_decomposition(refs, rng):
    """est = h*ref_i + c·q + b·n_perp: all three ratios closed-form — the
    test a wrong Gram solve cannot pass."""
    A_full = _design(refs, FLEN)
    A_1 = _design(refs[:1], FLEN)
    h = np.array([0.8, 0.15, -0.05, 0.02])
    target = np.convolve(refs[0], h)[:L]
    q = _perp(refs[1], A_1)
    n_perp = _perp(rng.standard_normal(L), A_full)
    c, b = 0.15, 0.04
    interf = c * q
    artif = b * n_perp
    ests = np.stack([target + interf + artif, refs[1]])
    sdr, sir, sar, _ = bss_eval_sources(refs, ests, flen=FLEN)
    e_t = np.sum(target**2)
    e_i = np.sum(interf**2)
    e_a = np.sum(artif**2)
    # n_perp ⟂ span ∋ target, interf — cross terms vanish by construction
    exp_sdr = _db(e_t, np.sum((interf + artif) ** 2))
    exp_sir = _db(e_t, e_i)
    exp_sar = _db(np.sum((target + interf) ** 2), e_a)
    assert abs(sdr[0] - exp_sdr) < 0.1, (sdr[0], exp_sdr)
    assert abs(sir[0] - exp_sir) < 0.1, (sir[0], exp_sir)
    assert abs(sar[0] - exp_sar) < 0.1, (sar[0], exp_sar)


def test_known_answer_windowed_single_window_matches_global(refs, rng):
    """window ≥ L degenerates to one global evaluation — the windowed path
    must reproduce bss_eval_sources' known-answer values exactly."""
    A_full = _design(refs, FLEN)
    n_perp = _perp(rng.standard_normal(L), A_full)
    ests = np.stack([0.7 * refs[0] + 0.05 * n_perp, refs[1]])
    g_sdr, g_sir, g_sar, _ = bss_eval_sources(refs, ests, flen=FLEN)
    w = bss_eval_windowed(refs, ests, fs=1000, window_s=100.0, flen=FLEN)
    assert w["windows"] == 1
    np.testing.assert_allclose(w["SDR"], g_sdr, atol=1e-9)
    np.testing.assert_allclose(w["SIR"], g_sir, atol=1e-9)
    np.testing.assert_allclose(w["SAR"], g_sar, atol=1e-9)


def test_known_answer_stereo(rng):
    """Per-channel scale + per-channel orthogonal artifact noise: the
    channel-energy-combined SDR has a closed form."""
    refs = rng.standard_normal((2, 2, L))
    refs[..., -(FLEN - 1):] = 0.0
    a, b = 0.8, 0.06
    ests = np.empty_like(refs)
    exp_t = np.zeros(2)
    exp_a = np.zeros(2)
    for c in range(2):
        A_c = _design(refs[:, c], FLEN)
        for j in range(2):
            n_perp = _perp(rng.standard_normal(L), A_c)
            ests[j, c] = a * refs[j, c] + b * n_perp
            exp_t[j] += a**2 * np.sum(refs[j, c] ** 2)
            exp_a[j] += b**2 * np.sum(n_perp**2)
    sdr, sir, sar = bss_eval_stereo(refs, ests, flen=FLEN)
    for j in range(2):
        expected = _db(exp_t[j], exp_a[j])
        assert abs(sdr[j] - expected) < 0.1, (j, sdr[j], expected)
        assert abs(sar[j] - expected) < 0.1, (j, sar[j], expected)
        assert sir[j] > 60
