"""Fused whole-track separation tests (SURVEY.md §4 'Integration').

The oracle-model test feeds the true stem magnitudes through the fused
pipeline — if segmentation, masking, phase reuse, overlap-add, or
truncation were wrong anywhere, reconstruction SNR would collapse.

Tests run scaled-down presets (small FFTs / filter counts) so the CPU CI
mesh compiles them in seconds; geometry-bearing ratios (window = 2×hop,
VALID convs, bucketing) match the real presets.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.configs import get_preset
from convsep_tpu.configs.presets import SepConfig, TransformConfig
from convsep_tpu.data import sine_mixture, segment_frames
from convsep_tpu.dsp import sinebell, stft, magphase, num_frames
from convsep_tpu.models import ConvSep
from convsep_tpu.separate import Separator, bucket_length


def _snr(ref, est):
    return 10 * np.log10(np.sum(ref**2) / (np.sum((ref - est) ** 2) + 1e-12))


def tiny_preset(name: str, **sep_kw):
    """Shrink a real preset to CPU-test scale, preserving its structure."""
    p = get_preset(name)
    t = TransformConfig(fs=8000, frame_size=256, hop_size=128)
    model = dataclasses.replace(
        p.model,
        time_context=10,
        feat_size=t.bins,
        conv1_filters=4,
        conv1_freq=8,
        conv2_filters=4,
        bottleneck=16,
    )
    return dataclasses.replace(
        p,
        transform=t,
        model=model,
        sep=dataclasses.replace(p.sep, segment_bucket=2, **sep_kw),
    )


@pytest.fixture(scope="module")
def ikala():
    return tiny_preset("ikala")


def test_bucket_length():
    p = get_preset("ikala")
    unit = 512 * 30 * 16
    assert bucket_length(1, p) == unit
    assert bucket_length(unit, p) == unit
    assert bucket_length(unit + 1, p) == 2 * unit
    assert bucket_length(unit // 2, p) == bucket_length(unit // 3, p)


def test_separator_shapes_and_truncation(ikala, rng):
    cfg = ikala.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.time_context, cfg.feat_size, 1))
    )
    sep = Separator(ikala, params)
    L = 8000
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    stems = sep(audio)
    assert stems.shape == (2, L)
    assert np.isfinite(stems).all()


def _oracle_separator(preset, stems, L):
    t = preset.transform
    Lb = bucket_length(L, preset)
    win = sinebell(t.frame_size)
    true_mag = np.stack(
        [
            np.asarray(magphase(stft(np.pad(s, (0, Lb - L)), win, t.hop_size))[0])
            for s in stems
        ]
    )  # (S, nf, F)
    segs = np.asarray(segment_frames(true_mag, preset.model.time_context))
    oracle_out = jnp.asarray(segs.transpose(1, 2, 3, 0))
    return Separator(preset, params={}, apply_fn=lambda p, x: oracle_out)


def test_oracle_model_recovers_stems(ikala):
    """Ideal per-source magnitudes through the fused pipeline → high SNR."""
    L = 8000
    stems, mix = sine_mixture(2, L, fs=ikala.transform.fs, freqs=(220.0, 1400.0), seed=3)
    sep = _oracle_separator(ikala, stems, L)
    est = sep(mix)
    assert est.shape == (2, L)
    for s in range(2):
        snr = _snr(stems[s], est[s])
        assert snr > 10.0, f"stem {s} SNR {snr:.1f} dB too low"
    assert _snr(mix, est.sum(0)) > 20.0


def test_oracle_model_four_sources_dsd():
    preset = tiny_preset("dsd100")
    L = 9000  # not a bucket multiple → exercises padding + truncation
    stems, mix = sine_mixture(
        4, L, fs=preset.transform.fs, freqs=(220.0, 500.0, 1200.0, 2800.0), seed=7
    )
    sep = _oracle_separator(preset, stems, L)
    est = sep(mix)
    assert est.shape == (4, L)
    for s in range(4):
        assert _snr(stems[s], est[s]) > 8.0, f"stem {s}"


def test_wiener_p2_changes_but_preserves_mixture(ikala):
    L = 8000
    stems, mix = sine_mixture(2, L, fs=ikala.transform.fs, freqs=(220.0, 1400.0), seed=3)
    p2 = dataclasses.replace(ikala, sep=SepConfig(wiener_p=2.0, segment_bucket=2))
    est1 = _oracle_separator(ikala, stems, L)(mix)
    est2 = _oracle_separator(p2, stems, L)(mix)
    assert not np.allclose(est1, est2)
    assert _snr(mix, est2.sum(0)) > 20.0


def test_score_informed_extra_channels(rng):
    preset = tiny_preset("bach10")
    cfg = preset.model
    assert cfg.channels_in == 5
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    sep = Separator(preset, params)
    L = preset.transform.hop_size * cfg.time_context * preset.sep.segment_bucket
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    nf = num_frames(L, preset.transform.hop_size)
    extra = np.abs(rng.standard_normal((nf, cfg.feat_size, cfg.channels_in - 1))).astype(
        np.float32
    )
    stems = sep(audio, extra=extra)
    assert stems.shape == (cfg.num_sources, L)
    assert np.isfinite(stems).all()


def test_separator_rejects_stereo(ikala):
    sep = Separator(ikala, params={}, apply_fn=lambda p, x: x)
    with pytest.raises(ValueError):
        sep(np.zeros((100, 2), np.float32))


def test_int16_output_dtype(ikala):
    L = 8000
    stems, mix = sine_mixture(2, L, fs=ikala.transform.fs, freqs=(220.0, 1400.0), seed=3)
    sep_f = _oracle_separator(ikala, stems, L)
    sep_i = Separator(ikala, params={}, apply_fn=sep_f.apply_fn, output_dtype="int16")
    est_f = sep_f(mix)
    est_i = sep_i(mix)
    assert est_i.dtype == np.int16
    np.testing.assert_allclose(est_i / 32768.0, est_f, atol=1.1 / 32768)
    import pytest as _pt

    with _pt.raises(ValueError, match="output_dtype"):
        Separator(ikala, params={}, output_dtype="int8")
