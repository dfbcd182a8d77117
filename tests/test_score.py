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
