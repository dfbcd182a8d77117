"""Score-informed mask tests (Bach10 pipeline, SURVEY.md §3.4)."""

import numpy as np
import pytest

from convsep_tpu.score import (
    Note,
    parse_note_annotations,
    score_mask,
    score_filtered_channels,
    shift_notes,
    stretch_notes,
)
from convsep_tpu.score.masks import midi_to_hz


def test_midi_to_hz():
    assert abs(midi_to_hz(69) - 440.0) < 1e-9
    assert abs(midi_to_hz(57) - 220.0) < 1e-9


def test_parse_annotations(tmp_path):
    p = tmp_path / "violin.txt"
    p.write_text("# onset offset pitch\n0.0 0.5 69\n0.5 1.0 72\n\n")
    notes = parse_note_annotations(str(p))
    assert len(notes) == 2
    assert notes[0] == Note(69.0, 0.0, 0.5)
    bad = tmp_path / "bad.txt"
    bad.write_text("0.0 0.5\n")
    with pytest.raises(ValueError, match="expected"):
        parse_note_annotations(str(bad))


def test_score_mask_harmonic_structure():
    fs, hop, bins = 8000, 128, 129  # 256-pt FFT
    notes = [Note(pitch_midi=69.0, start_sec=0.2, end_sec=0.8)]  # A440
    m = score_mask(notes, n_frames=80, bins=bins, fs=fs, hop=hop, n_harmonics=5)
    assert m.shape == (80, 129)
    freq_per_bin = fs / 256
    t_active = int(0.5 * fs / hop)
    t_silent = 70
    b440 = int(round(440 / freq_per_bin))
    b880 = int(round(880 / freq_per_bin))
    assert m[t_active, b440] > 0.5, "fundamental not masked in"
    assert m[t_active, b880] > 0.5, "harmonic not masked in"
    # off-harmonic region suppressed
    b_off = int(round(660 / freq_per_bin))
    assert m[t_active, b_off] < 0.2
    # silent frames empty
    assert m[t_silent].max() == 0.0
    assert m.max() <= 1.0 and m.min() >= 0.0


def test_score_mask_respects_nyquist():
    m = score_mask([Note(100.0, 0.0, 1.0)], 10, 65, fs=8000, hop=128, n_harmonics=50)
    assert np.isfinite(m).all()


def test_augmentations():
    notes = [Note(60, 1.0, 2.0)]
    shifted = shift_notes(notes, -0.5)
    assert shifted[0].start_sec == 0.5
    clamped = shift_notes(notes, -3.0)
    assert clamped[0].start_sec == 0.0
    stretched = stretch_notes(notes, 2.0)
    assert stretched[0].end_sec == 4.0
    with pytest.raises(ValueError):
        stretch_notes(notes, 0.0)


def test_score_filtered_channels(rng):
    mix = np.abs(rng.standard_normal((40, 129))).astype(np.float32)
    per_source = [
        [Note(69.0, 0.0, 0.4)],
        [Note(57.0, 0.3, 0.7)],
    ]
    chans = score_filtered_channels(mix, per_source, fs=8000, hop=128)
    assert chans.shape == (40, 129, 2)
    assert (chans <= mix[..., None] + 1e-6).all()
    assert chans.dtype == np.float32


def _sine_mix_mag(freqs_a, freqs_b, fs, hop, bins, seconds, gate_a, gate_b):
    """STFT magnitude of two harmonic sources with time gates (numpy DFT)."""
    n = int(seconds * fs)
    t = np.arange(n) / fs
    a = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate(freqs_a))
    b = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate(freqs_b))
    ga = ((t >= gate_a[0]) & (t <= gate_a[1])).astype(np.float64)
    gb = ((t >= gate_b[0]) & (t <= gate_b[1])).astype(np.float64)
    mix = a * ga + b * gb
    frame = 2 * (bins - 1)
    n_frames = max(1, (n - frame) // hop + 1)
    win = np.hanning(frame)
    mags = np.stack(
        [
            np.abs(np.fft.rfft(mix[i * hop : i * hop + frame] * win))
            for i in range(n_frames)
        ]
    )
    return mags.astype(np.float32), (a * ga).astype(np.float32), (b * gb).astype(np.float32)


def test_score_nmf_separates_disjoint_pitches():
    """Two sources with different pitches, overlapping in time: the NMF
    channels must route each fundamental's energy to the right source."""
    from convsep_tpu.score import score_nmf_channels

    fs, hop, bins = 8000, 128, 257
    # A3 (220 Hz) vs E4 (~330 Hz): MIDI 57 and 64
    mag, _, _ = _sine_mix_mag(
        [220.0, 440.0, 660.0], [329.6, 659.3, 988.9],
        fs, hop, bins, seconds=2.0, gate_a=(0.0, 2.0), gate_b=(0.0, 2.0),
    )
    notes_a = [Note(57.0, 0.0, 2.0)]
    notes_b = [Note(64.0, 0.0, 2.0)]
    chans = score_nmf_channels(mag, [notes_a, notes_b], fs=fs, hop=hop)
    assert chans.shape == (*mag.shape, 2)
    assert np.isfinite(chans).all() and (chans >= 0).all()
    freq_per_bin = fs / (2.0 * (bins - 1))
    b220 = int(round(220.0 / freq_per_bin))
    b330 = int(round(329.6 / freq_per_bin))
    e_a_at_220 = chans[:, b220 - 1 : b220 + 2, 0].sum()
    e_b_at_220 = chans[:, b220 - 1 : b220 + 2, 1].sum()
    e_a_at_330 = chans[:, b330 - 1 : b330 + 2, 0].sum()
    e_b_at_330 = chans[:, b330 - 1 : b330 + 2, 1].sum()
    assert e_a_at_220 > 5 * e_b_at_220
    assert e_b_at_330 > 5 * e_a_at_330


def test_score_nmf_gates_silence():
    """Activations start at zero outside a source's notes and multiplicative
    updates preserve zeros — the source's channel must be (near) silent
    while its score is silent."""
    from convsep_tpu.score import score_nmf_channels

    fs, hop, bins = 8000, 128, 257
    mag, _, _ = _sine_mix_mag(
        [220.0, 440.0], [329.6, 659.3],
        fs, hop, bins, seconds=2.0, gate_a=(0.0, 2.0), gate_b=(1.0, 2.0),
    )
    notes_a = [Note(57.0, 0.0, 2.0)]
    notes_b = [Note(64.0, 1.0, 2.0)]
    chans = score_nmf_channels(mag, [notes_a, notes_b], fs=fs, hop=hop)
    frame_times = np.arange(mag.shape[0]) * hop / fs
    early = frame_times < 0.8  # clear of the onset pad
    late = frame_times > 1.2
    e_b_early = chans[early, :, 1].sum() / early.sum()
    e_b_late = chans[late, :, 1].sum() / late.sum()
    assert e_b_early < 0.05 * e_b_late


def test_score_nmf_empty_scores():
    from convsep_tpu.score import score_nmf_channels

    mag = np.abs(np.random.default_rng(0).normal(size=(20, 65))).astype(np.float32)
    chans = score_nmf_channels(mag, [[], []], fs=8000, hop=128)
    assert chans.shape == (20, 65, 2)
    assert np.allclose(chans, 0.0)


def test_score_channels_selector():
    """features.score_channels routes comb/nmf and rejects unknowns."""
    import pytest as _pytest

    from convsep_tpu.configs import get_preset
    from convsep_tpu.data.features import score_channels

    preset = get_preset("ikala")
    fs, hop = preset.transform.fs, preset.transform.hop_size
    mag = np.abs(np.random.default_rng(1).normal(size=(12, 513))).astype(np.float32)
    notes = [[Note(69.0, 0.0, 0.2)], [Note(57.0, 0.0, 0.2)]]
    comb = score_channels(mag, notes, preset, "comb")
    nmf = score_channels(mag, notes, preset, "nmf")
    assert comb.shape == nmf.shape == (12, 513, 2)
    with _pytest.raises(ValueError, match="score_filter"):
        score_channels(mag, notes, preset, "wavelet")


def test_score_gated_resynthesis_recovers_stems():
    """SepConfig.score_gate (r4, VERDICT r3 #5): with an uninformative model
    (uniform magnitude estimates) and IDEAL score masks as extra channels,
    g=1 turns the Wiener mask into the score mask itself — separation must
    then approach the ideal-mask result, while g=0 leaves the uniform
    mask's mix/S split. Pins both the gate math and the on-device mask
    recovery extra_i/(|mix|·mult)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from convsep_tpu.data import segment_frames, sine_mixture
    from convsep_tpu.dsp import magphase, sinebell, stft
    from convsep_tpu.separate import Separator
    from tests.test_separate import tiny_preset

    preset = tiny_preset("bach10")  # channels_in = 1 + 4 sources
    t, m = preset.transform, preset.model
    L = 8000
    stems, mix = sine_mixture(
        4, L, fs=t.fs, freqs=(200.0, 650.0, 1400.0, 3100.0), seed=11
    )
    from convsep_tpu.separate import bucket_length

    Lb = bucket_length(L, preset)
    win = sinebell(t.frame_size)
    mags = np.stack(
        [
            np.asarray(magphase(stft(np.pad(s, (0, Lb - L)), win, t.hop_size))[0])
            for s in stems
        ]
    )  # (S, nf, F)
    mix_mag = np.asarray(
        magphase(stft(np.pad(mix, (0, Lb - L)), win, t.hop_size))[0]
    )
    ideal = mags / (mags.sum(0, keepdims=True) + 1e-9)  # ideal ratio mask
    extra = (
        ideal.transpose(1, 2, 0) * mix_mag[..., None] * preset.train.mult_factor_in
    ).astype(np.float32)  # exactly score_channels' scaling contract

    nseg = -(-mix_mag.shape[0] // m.time_context)
    uniform = jnp.ones((nseg, m.time_context, m.feat_size, 4), jnp.float32)
    for g, min_snr, max_snr in ((1.0, 8.0, None), (0.0, None, 3.0)):
        p = dataclasses.replace(
            preset, sep=dataclasses.replace(preset.sep, score_gate=g)
        )
        sep = Separator(p, params={}, apply_fn=lambda pp, x: uniform)
        est = sep(mix, extra=extra)
        snrs = [
            10 * np.log10(np.sum(s**2) / (np.sum((s - e) ** 2) + 1e-12))
            for s, e in zip(stems, est)
        ]
        if min_snr is not None:
            assert min(snrs) > min_snr, f"g={g}: {snrs}"
        if max_snr is not None:
            assert max(snrs) < max_snr, f"g={g}: {snrs}"


def test_score_gate_blend_is_model_independent_at_g1():
    """score_gate_mode="blend" (r4): at g=1 the Wiener input is the score
    prior itself, so the stems must be IDENTICAL whatever the model says —
    the property that lets the blend reach mask-only separation where the
    model is weaker than the score (pinned bach10 battery 2026-08-20)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from convsep_tpu.data import sine_mixture
    from convsep_tpu.dsp import magphase, sinebell, stft
    from convsep_tpu.separate import Separator, bucket_length
    from tests.test_separate import tiny_preset

    preset = tiny_preset("bach10")
    t, m = preset.transform, preset.model
    L = 8000
    stems, mix = sine_mixture(
        4, L, fs=t.fs, freqs=(200.0, 650.0, 1400.0, 3100.0), seed=11
    )
    Lb = bucket_length(L, preset)
    win = sinebell(t.frame_size)
    mags = np.stack(
        [
            np.asarray(magphase(stft(np.pad(s, (0, Lb - L)), win, t.hop_size))[0])
            for s in stems
        ]
    )
    mix_mag = np.asarray(
        magphase(stft(np.pad(mix, (0, Lb - L)), win, t.hop_size))[0]
    )
    ideal = mags / (mags.sum(0, keepdims=True) + 1e-9)
    extra = (
        ideal.transpose(1, 2, 0) * mix_mag[..., None] * preset.train.mult_factor_in
    ).astype(np.float32)

    nseg = -(-mix_mag.shape[0] // m.time_context)
    shape = (nseg, m.time_context, m.feat_size, 4)
    p = dataclasses.replace(
        preset,
        sep=dataclasses.replace(preset.sep, score_gate=1.0, score_gate_mode="blend"),
    )
    outs = []
    for model_out in (
        jnp.ones(shape, jnp.float32),
        jax.random.uniform(jax.random.PRNGKey(0), shape),
    ):
        sep = Separator(p, params={}, apply_fn=lambda pp, x, mo=model_out: mo)
        outs.append(np.asarray(sep(mix, extra=extra)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    # and it actually separates: ideal-mask prior → high SNR
    snrs = [
        10 * np.log10(np.sum(s**2) / (np.sum((s - e) ** 2) + 1e-12))
        for s, e in zip(stems, outs[0])
    ]
    assert min(snrs) > 8.0, snrs
