"""BSS Eval self-consistency tests (no mir_eval in env — property-based).

Properties pinned: a filtered copy of the true source is all target
(SDR≈SIR≈∞, SAR high); added interference shows up in SIR but not SAR;
added noise shows up in SAR; permutation search recovers swapped estimates.
"""

import numpy as np
import pytest

from convsep_tpu.eval import bss_eval_sources, sdr_only


@pytest.fixture
def sources(rng):
    n = 4000
    s1 = np.sin(2 * np.pi * 440 * np.arange(n) / 8000)
    s2 = rng.standard_normal(n) * 0.3
    return np.stack([s1, s2])


def test_perfect_estimate_has_huge_sdr(sources):
    sdr, sir, sar, perm = bss_eval_sources(sources, sources.copy(), flen=32)
    assert (sdr > 50).all() and (sir > 50).all()
    np.testing.assert_array_equal(perm, [0, 1])


def test_filtered_estimate_is_still_target(sources):
    """A short FIR of the true source must count as target, not artifact."""
    h = np.array([0.8, 0.15, -0.05])
    est0 = np.convolve(sources[0], h)[: sources.shape[1]]
    ests = np.stack([est0, sources[1]])
    sdr, sir, sar, _ = bss_eval_sources(sources, ests, flen=32)
    assert sdr[0] > 40, f"filtered target scored SDR {sdr[0]:.1f}"


def test_interference_lowers_sir_not_sar(sources):
    ests = np.stack([sources[0] + 0.3 * sources[1], sources[1]])
    sdr, sir, sar, _ = bss_eval_sources(sources, ests, flen=32)
    assert sir[0] < 20
    assert sar[0] > 40  # leakage is interference, not artifact


def test_noise_lowers_sar(sources, rng):
    noise = 0.1 * rng.standard_normal(sources.shape[1])
    ests = np.stack([sources[0] + noise, sources[1]])
    sdr, sir, sar, _ = bss_eval_sources(sources, ests, flen=32)
    assert sar[0] < 25
    assert sir[0] > sar[0]


def test_permutation_recovery(sources):
    ests = sources[::-1].copy()
    _, _, _, perm = bss_eval_sources(sources, ests, flen=32, compute_permutation=True)
    np.testing.assert_array_equal(perm, [1, 0])


def test_shape_and_zero_energy_errors(sources):
    with pytest.raises(ValueError):
        bss_eval_sources(sources, sources[:, :-5])
    bad = sources.copy()
    bad[1] = 0
    with pytest.raises(ValueError, match="zero energy"):
        bss_eval_sources(bad, sources)


def test_sdr_only_proxy(sources):
    assert sdr_only(sources[0], sources[0]) > 100
    assert sdr_only(sources[0], sources[0] + 0.1 * sources[1]) < 30
