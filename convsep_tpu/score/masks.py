"""Score → time-frequency masks → score-filtered input channels.

Reference parity: the Bach10 score-informed pipeline (SURVEY.md §2.1 #9/#10,
§3.4): aligned note annotations per instrument yield per-source soft TF
masks around each note's harmonics; `mask_i * mix_mag` becomes an extra
input channel per source, conditioning the CNN at train AND separation
time. Augmentation = note-level time shifts/stretches [M].

This is host-side feature computation (numpy): masks are built once per
track, saved with data/io.save_tensor, and consumed as `extra_channels` by
the pipeline/Separator.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Note:
    pitch_midi: float
    start_sec: float
    end_sec: float

    def __post_init__(self):
        if self.end_sec < self.start_sec:
            raise ValueError(f"note ends before it starts: {self}")


def midi_to_hz(pitch: float) -> float:
    return 440.0 * 2.0 ** ((pitch - 69.0) / 12.0)


def parse_note_annotations(path: str) -> list[Note]:
    """Parse a text annotation: one `onset_sec offset_sec midi_pitch` per
    line (Bach10-style ASCII annotations; '#' comments allowed)."""
    notes = []
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) != 3:
                raise ValueError(f"{path}:{ln}: expected 'onset offset pitch', got {line!r}")
            on, off, pitch = (float(p) for p in parts)
            notes.append(Note(pitch_midi=pitch, start_sec=on, end_sec=off))
    return notes


def shift_notes(notes: list[Note], dt: float) -> list[Note]:
    """Time-shift augmentation (clamps at 0)."""
    return [
        Note(n.pitch_midi, max(0.0, n.start_sec + dt), max(0.0, n.end_sec + dt))
        for n in notes
    ]


def stretch_notes(notes: list[Note], factor: float) -> list[Note]:
    """Time-stretch augmentation."""
    if factor <= 0:
        raise ValueError("stretch factor must be positive")
    return [
        Note(n.pitch_midi, n.start_sec * factor, n.end_sec * factor) for n in notes
    ]


def score_mask(
    notes: list[Note],
    n_frames: int,
    bins: int,
    fs: int,
    hop: int,
    n_harmonics: int = 20,
    semitone_width: float = 1.0,
    onset_pad_sec: float = 0.05,
    floor: float = 0.0,
) -> np.ndarray:
    """Soft harmonic-comb TF mask (n_frames, bins) in [floor, 1].

    For each active note and harmonic k ≤ n_harmonics, a Gaussian bump
    centred at k·f0 whose width is ±`semitone_width` semitones of the
    harmonic (matching the score-filtering idea of the ISMIR 2017 pipeline
    [M]); `onset_pad_sec` widens note boundaries to absorb alignment slack.
    """
    nfft_bins = bins - 1
    freq_per_bin = fs / (2.0 * nfft_bins)
    freqs = np.arange(bins) * freq_per_bin  # (bins,)
    mask = np.full((n_frames, bins), float(floor), dtype=np.float32)
    # frame n covers samples around n*hop (analysis front pad centers frames)
    frame_times = np.arange(n_frames) * hop / float(fs)
    nyquist = fs / 2.0
    for note in notes:
        active = (frame_times >= note.start_sec - onset_pad_sec) & (
            frame_times <= note.end_sec + onset_pad_sec
        )
        if not active.any():
            continue
        f0 = midi_to_hz(note.pitch_midi)
        comb = np.zeros(bins, dtype=np.float32)
        for k in range(1, n_harmonics + 1):
            fk = k * f0
            if fk > nyquist:
                break
            sigma = fk * (2.0 ** (semitone_width / 12.0) - 1.0)
            comb = np.maximum(comb, np.exp(-0.5 * ((freqs - fk) / sigma) ** 2))
        mask[active] = np.maximum(mask[active], comb[None, :])
    return mask


def score_filtered_channels(
    mix_mag: np.ndarray, per_source_notes: list[list[Note]], fs: int, hop: int, **mask_kw
) -> np.ndarray:
    """Mixture magnitude (n_frames, bins) + per-source scores →
    score-filtered channels (n_frames, bins, S)."""
    n_frames, bins = mix_mag.shape
    chans = [
        score_mask(notes, n_frames, bins, fs, hop, **mask_kw) * mix_mag
        for notes in per_source_notes
    ]
    return np.stack(chans, axis=-1).astype(np.float32)
