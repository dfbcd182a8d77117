"""Synthetic fixtures: deterministic mixtures with known stems.

SURVEY.md §4 integration row: sine/band-noise mixtures where ideal masks
are known analytically — used by the training smoke tests, golden
end-to-end tests, and the benchmark when no dataset is mounted.
"""

from __future__ import annotations

import os

import numpy as np

from convsep_tpu.data.io import save_tensor

DEFAULT_FREQS = (220.0, 440.0, 1760.0, 3520.0)


def sine_mixture(
    num_sources: int,
    length: int,
    fs: int = 44100,
    freqs: tuple[float, ...] = DEFAULT_FREQS,
    amp: float = 0.2,
    vibrato: float = 5.0,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stems (S, length) + mixture (length,), float32.

    Each stem is a frequency-modulated sine at a well-separated carrier, so
    ideal time-frequency masks are (nearly) disjoint and separation quality
    is measurable analytically.
    """
    if num_sources > len(freqs):
        raise ValueError(f"need ≤{len(freqs)} sources, got {num_sources}")
    rng = np.random.default_rng(seed)
    t = np.arange(length) / float(fs)
    stems = []
    for s in range(num_sources):
        f0 = freqs[s]
        phase = rng.uniform(0, 2 * np.pi)
        mod = np.sin(2 * np.pi * vibrato * t + phase)
        inst_phase = 2 * np.pi * f0 * t + 0.5 * mod
        env = 0.5 * (1 + np.sin(2 * np.pi * (0.5 + 0.25 * s) * t))
        stems.append((amp * env * np.sin(inst_phase)).astype(np.float32))
    stems = np.stack(stems)
    return stems, stems.sum(axis=0)


def note_mixture(
    num_sources: int,
    length: int,
    fs: int = 44100,
    notes_per_source: int = 6,
    n_harmonics: int = 5,
    amp: float = 0.2,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, list]:
    """Score-informed fixture: per-source note sequences → harmonic stems.

    Each source walks a disjoint pitch register (viola/clarinet/sax/bassoon
    style spacing, one octave apart), playing `notes_per_source` legato
    notes with a 1/k-rolloff harmonic stack and a raised-cosine onset/offset
    ramp. Returns (stems (S, length), mix (length,), per_source_notes) with
    notes as `score.Note` — the synthetic analog of Bach10's aligned
    annotations (SURVEY.md §3.4), used by the score-informed quality loop
    and tests.
    """
    from convsep_tpu.score.masks import Note, midi_to_hz

    rng = np.random.default_rng(seed)
    t = np.arange(length) / float(fs)
    seconds = length / float(fs)
    base_pitch = (64, 57, 50, 43)  # E4, A3, D3, G2 — one register per source
    if num_sources > len(base_pitch):
        raise ValueError(f"need ≤{len(base_pitch)} sources, got {num_sources}")
    note_dur = seconds / notes_per_source
    stems, all_notes = [], []
    for s in range(num_sources):
        audio = np.zeros(length, np.float64)
        notes = []
        pitch = base_pitch[s]
        for i in range(notes_per_source):
            pitch = int(np.clip(pitch + rng.integers(-3, 4), base_pitch[s] - 4, base_pitch[s] + 7))
            on = round(i * note_dur, 4)
            off = round(min(seconds, on + note_dur * rng.uniform(0.7, 0.98)), 4)
            notes.append(Note(float(pitch), on, off))
            f0 = midi_to_hz(pitch)
            gate = (t >= on) & (t < off)
            seg_t = t[gate] - on
            dur = max(off - on, 1e-3)
            ramp = 0.02 * dur  # raised-cosine 2% attack/release
            env = np.minimum(1.0, np.minimum(seg_t, dur - seg_t) / max(ramp, 1e-4))
            env = 0.5 - 0.5 * np.cos(np.pi * np.clip(env, 0.0, 1.0))
            tone = sum(
                np.sin(2 * np.pi * k * f0 * seg_t + rng.uniform(0, 2 * np.pi)) / k
                for k in range(1, n_harmonics + 1)
                if k * f0 < fs / 2
            )
            audio[gate] += amp * env * tone
        stems.append(audio.astype(np.float32))
        all_notes.append(notes)
    stems = np.stack(stems)
    return stems, stems.sum(axis=0), all_notes


def synth_feature_dir(
    out_dir: str,
    sources: tuple[str, ...],
    num_tracks: int = 2,
    seconds: float = 2.0,
    fs: int = 44100,
    frame_size: int = 1024,
    hop_size: int = 512,
    seed: int = 0,
) -> list[str]:
    """Write mixture + per-source magnitude feature files for `num_tracks`
    synthetic tracks (reference compute_features.py analog over fixtures).
    Returns the track names written."""
    from convsep_tpu.dsp import sinebell, stft, magphase

    os.makedirs(out_dir, exist_ok=True)
    win = sinebell(frame_size)
    names = []
    for i in range(num_tracks):
        stems, mix = sine_mixture(
            len(sources), int(seconds * fs), fs=fs, seed=seed + i
        )
        name = f"track{i:03d}"
        mag_mix, _ = magphase(stft(mix, win, hop_size))
        save_tensor(np.asarray(mag_mix), os.path.join(out_dir, f"{name}.mix.data"))
        for s, sname in enumerate(sources):
            mag_s, _ = magphase(stft(stems[s], win, hop_size))
            save_tensor(np.asarray(mag_s), os.path.join(out_dir, f"{name}.{sname}.data"))
        names.append(name)
    return names
