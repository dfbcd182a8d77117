"""Offline feature computation: dataset audio → feature files.

Reference parity: examples/*/compute_features*.py (SURVEY.md §2.1 #9,
§3.1) — walk a dataset directory, read stems, build the mixture (sum of
stems when no mixture file exists), STFT each signal, write `.data`
feature files per track/stem.

Directory convention (generic across iKala/DSD100-style layouts):
``<audio_dir>/<track>/<stem>.wav`` with stems named by the preset's
sources plus optional ``mixture.wav``. Stereo is averaged to mono.
Score-informed runs additionally read ``<track>/<source>.notes.txt``
annotations and write score-filtered channels.
"""

from __future__ import annotations

import os

import numpy as np

from convsep_tpu.configs.presets import Preset
from convsep_tpu.data.io import read_wav, save_tensor
from convsep_tpu.dsp.transform import TransformFFT
from convsep_tpu.score.masks import parse_note_annotations, score_filtered_channels


def _mono(audio: np.ndarray) -> np.ndarray:
    return audio.mean(axis=1) if audio.ndim == 2 else audio


def _tracks_trackdirs(audio_dir: str, preset: Preset):
    """`<dir>/<track>/<stem>.wav` layout (DSD100/Bach10-style)."""
    tracks = sorted(
        d for d in os.listdir(audio_dir) if os.path.isdir(os.path.join(audio_dir, d))
    )
    if not tracks:
        raise FileNotFoundError(f"no track directories under {audio_dir}")
    for track in tracks:
        tdir = os.path.join(audio_dir, track)
        stems = {}
        for s in preset.sources:
            p = os.path.join(tdir, f"{s}.wav")
            if not os.path.exists(p):
                raise FileNotFoundError(f"missing stem {p}")
            fs, audio = read_wav(p)
            if fs != preset.transform.fs:
                raise ValueError(f"{p}: sample rate {fs} != preset {preset.transform.fs}")
            stems[s] = _mono(audio)
        n = min(len(a) for a in stems.values())
        stems = {s: a[:n] for s, a in stems.items()}
        mix_path = os.path.join(tdir, "mixture.wav")
        if os.path.exists(mix_path):
            _, mix = read_wav(mix_path)
            mix = _mono(mix)[:n]
        else:  # reference behavior: mixture = sum of stems
            mix = np.sum(list(stems.values()), axis=0)
        yield track, tdir, stems, mix


def _tracks_ikala_stereo(audio_dir: str, preset: Preset):
    """iKala layout: flat stereo wavs, one channel per stem.

    MIREX iKala clips carry the accompaniment in channel 0 and the voice in
    channel 1 [M]; `preset.sources` order (vocals, accompaniment) maps to
    channels (1, 0). Mixture = channel sum (reference behavior)."""
    wavs = sorted(f for f in os.listdir(audio_dir) if f.endswith(".wav"))
    if not wavs:
        raise FileNotFoundError(f"no wav files under {audio_dir}")
    chan = {"vocals": 1, "accompaniment": 0}
    for f in wavs:
        p = os.path.join(audio_dir, f)
        fs, audio = read_wav(p)
        if fs != preset.transform.fs:
            raise ValueError(f"{p}: sample rate {fs} != preset {preset.transform.fs}")
        if audio.ndim != 2 or audio.shape[1] != 2:
            raise ValueError(f"{p}: ikala-stereo layout needs stereo wavs, got {audio.shape}")
        stems = {s: audio[:, chan[s]] for s in preset.sources}
        yield f[:-4], audio_dir, stems, audio.sum(axis=1)


_LAYOUTS = {"trackdirs": _tracks_trackdirs, "ikala-stereo": _tracks_ikala_stereo}


def _emit_track(
    out_dir: str,
    name: str,
    stems: dict[str, np.ndarray],
    mix: np.ndarray,
    notes: list | None,
    preset: Preset,
    t: TransformFFT,
    score_filter: str = "comb",
) -> None:
    """Write one track's feature files (mix/stems, multires, score chans)."""
    mix_mag = t.compute_file(mix)
    save_tensor(mix_mag, os.path.join(out_dir, f"{name}.mix.data"))
    for s, audio in stems.items():
        save_tensor(t.compute_file(audio), os.path.join(out_dir, f"{name}.{s}.data"))

    if preset.transform.multires:
        import jax.numpy as jnp

        from convsep_tpu.dsp.multires import multires_channels
        from convsep_tpu.dsp.stft import scale_magnitude

        ex = np.asarray(
            scale_magnitude(
                multires_channels(jnp.asarray(mix, jnp.float32), preset.transform),
                preset.transform.iscale,
            )
        )
        for i, size in enumerate(preset.transform.multires):
            save_tensor(ex[..., i], os.path.join(out_dir, f"{name}.res{size}.data"))

    if notes is not None:
        chans = score_channels(
            mix_mag, notes, preset, score_filter
        )
        for i, s in enumerate(preset.sources):
            save_tensor(chans[..., i], os.path.join(out_dir, f"{name}.score_{s}.data"))


def score_channels(
    mix_mag: np.ndarray, notes: list, preset: Preset, score_filter: str = "comb"
) -> np.ndarray:
    """Score-filtered extra input channels (n_frames, bins, S) by filter
    kind: "comb" = harmonic-comb gating (score/masks.py), "nmf" =
    score-constrained KL-NMF refinement (score/nmf.py, the reference
    pipeline's source-filter excitation variant — SURVEY.md §2.1 #9 [M])."""
    kw = dict(fs=preset.transform.fs, hop=preset.transform.hop_size)
    if score_filter == "comb":
        return score_filtered_channels(mix_mag, notes, **kw)
    if score_filter == "nmf":
        from convsep_tpu.score.nmf import score_nmf_channels

        return score_nmf_channels(mix_mag, notes, **kw)
    raise ValueError(f"unknown score_filter {score_filter!r}; have comb | nmf")


def compute_features(
    audio_dir: str,
    out_dir: str,
    preset: Preset,
    score_informed: bool = False,
    layout: str = "trackdirs",
    augment: int = 0,
    score_filter: str = "comb",
) -> list[str]:
    """Compute feature files for every track; returns track names.

    `augment=N` additionally emits N augmented copies per track
    (`<track>.aug<i>`), cycling note/audio time shifts and time stretches
    applied CONSISTENTLY to audio, mixture, and score annotations — the
    reference's Bach10 augmentation (SURVEY.md §2.1 #9 [M]). Augmented
    copies are full training tracks: SegmentDataset picks them up by their
    `.mix.data` files like any other.
    """
    from convsep_tpu.score.masks import augment_track, augmentation_plan

    t = TransformFFT(preset.transform)
    os.makedirs(out_dir, exist_ok=True)
    try:
        walker = _LAYOUTS[layout]
    except KeyError:
        raise ValueError(f"unknown layout {layout!r}; have {sorted(_LAYOUTS)}") from None
    plan = augmentation_plan(augment)
    done = []
    for track, tdir, stems, mix in walker(audio_dir, preset):
        notes = None
        if score_informed:
            notes = []
            for s in preset.sources:
                ann = os.path.join(tdir, f"{s}.notes.txt")
                if not os.path.exists(ann):
                    raise FileNotFoundError(f"score-informed run missing {ann}")
                notes.append(parse_note_annotations(ann))

        _emit_track(out_dir, track, stems, mix, notes, preset, t, score_filter)
        done.append(track)
        for i, (kind, value) in enumerate(plan, 1):
            a_stems, a_mix, a_notes = augment_track(
                stems, mix, notes, preset.transform.fs, kind, value
            )
            name = f"{track}.aug{i}"
            _emit_track(out_dir, name, a_stems, a_mix, a_notes, preset, t, score_filter)
            done.append(name)
    return done
