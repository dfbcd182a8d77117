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


def test_sdr_only_zero_reference():
    assert sdr_only(np.zeros(100), np.ones(100)) == float("-inf")


def test_windowed_eval(rng):
    """Windowed (SiSEC-style) evaluation: per-window rows + median agg."""
    from convsep_tpu.eval import bss_eval_windowed

    fs = 8000
    n = fs * 4
    s1 = np.sin(2 * np.pi * 440 * np.arange(n) / fs)
    s2 = rng.standard_normal(n) * 0.3
    refs = np.stack([s1, s2])
    w = bss_eval_windowed(refs, refs.copy(), fs, window_s=1.0, hop_s=0.5, flen=32)
    assert w["windows"] == 7 and w["per_window"].shape == (7, 2, 3)
    assert (w["SDR"] > 50).all()
    # degrade only the LAST quarter: the median over windows stays high for
    # s1 (most windows clean) while the bad windows still show up
    ests = refs.copy()
    ests[0, 3 * n // 4 :] += 0.5 * s2[3 * n // 4 :]
    w2 = bss_eval_windowed(refs, ests, fs, window_s=1.0, hop_s=0.5, flen=32)
    assert w2["SDR"][0] > 40  # median robust to the bad tail
    assert w2["per_window"][:, 0, 0].min() < 15  # but the bad windows show


def test_windowed_eval_skips_silent_windows(rng):
    from convsep_tpu.eval import bss_eval_windowed

    fs = 8000
    n = fs * 3
    s1 = np.zeros(n)
    s1[: fs * 2] = np.sin(2 * np.pi * 220 * np.arange(fs * 2) / fs)
    s2 = rng.standard_normal(n) * 0.2
    refs = np.stack([s1, s2])
    w = bss_eval_windowed(refs, refs.copy(), fs, window_s=1.0, hop_s=1.0, flen=16)
    assert w["windows"] == 2  # the all-silent-s1 window was skipped


def test_stereo_eval(rng):
    """Channel-combined stereo metric: perfect stems score high; hard-panned
    sources are dominated by the ear that carries them."""
    from convsep_tpu.eval import bss_eval_stereo

    fs = 8000
    n = fs * 2
    v = np.sin(2 * np.pi * 330 * np.arange(n) / fs)
    a = rng.standard_normal(n) * 0.3
    # vocals hard-left, accompaniment hard-right
    refs = np.zeros((2, 2, n))
    refs[0, 0] = v
    refs[1, 1] = a
    sdr, sir, sar = bss_eval_stereo(refs, refs.copy(), flen=32)
    assert (sdr > 50).all()
    # interference in the carrying ear lowers that source's SIR
    ests = refs.copy()
    ests[0, 0] += 0.3 * a
    sdr2, sir2, _ = bss_eval_stereo(refs, ests, flen=32)
    assert sir2[0] < sir[0] - 10


def test_oracle_stems_upper_bound(rng):
    """The ideal-soft-mask oracle nearly reconstructs well-separated
    sources and always beats a mediocre estimate."""
    from convsep_tpu.configs import get_preset
    from convsep_tpu.configs.presets import TransformConfig
    from convsep_tpu.eval import oracle_stems
    import dataclasses

    preset = get_preset("ikala")
    preset = dataclasses.replace(
        preset, transform=TransformConfig(fs=8000, frame_size=256, hop_size=128)
    )
    fs = 8000
    n = fs * 2
    s1 = np.sin(2 * np.pi * 440 * np.arange(n) / fs).astype(np.float32)
    s2 = (0.3 * rng.standard_normal(n)).astype(np.float32)
    stems = np.stack([s1, s2])
    mix = stems.sum(0)
    orc = oracle_stems(mix, stems, preset)
    assert orc.shape == (2, n)
    # oracle SDR of the tone vs the raw mixture-as-estimate baseline
    assert sdr_only(s1, orc[0]) > 10 * np.log10(
        np.sum(s1**2) / np.sum((s1 - mix) ** 2)
    ) + 10
    assert sdr_only(s1, orc[0]) > 10
