"""Golden-case constructions shared by test_golden.py and tools/gen_golden.py.

Each case deterministically builds (preset, params, fixture input), runs the
separation path it pins, and returns {"mix": ..., "stems": ...} (float32 or
int16 per path). One case per preset family (VERDICT r2 #6): ikala mono,
dsd100 4-stem, ikala-stereo joint-channel, multires conditioning, bach10
score-informed, plus the chunked int16 path (pins PCM16 rounding).

All cases are regression pins of THIS repo's CPU output, not reference
parity (the reference mount has been empty every round — SURVEY.md §0.1).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from convsep_tpu.data import sine_mixture
from convsep_tpu.models import ConvSep
from tests.test_separate import tiny_preset


def _params(preset, seed=42):
    cfg = preset.model
    return ConvSep(cfg).init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )


def case_ikala():
    from convsep_tpu.separate import Separator

    preset = tiny_preset("ikala")
    params = _params(preset)
    _, mix = sine_mixture(2, 8000, fs=8000, freqs=(220.0, 1400.0), seed=11)
    out = Separator(preset, params)(mix)
    return {"mix": mix, "stems": np.asarray(out)}


def case_dsd100():
    from convsep_tpu.separate import Separator

    preset = tiny_preset("dsd100")
    params = _params(preset)
    _, mix = sine_mixture(4, 8000, fs=8000, seed=13)
    out = Separator(preset, params)(mix)
    return {"mix": mix, "stems": np.asarray(out)}


def case_ikala_stereo():
    from convsep_tpu.separate.stereo import StereoSeparator

    preset = tiny_preset("ikala-stereo")
    params = _params(preset)
    _, left = sine_mixture(2, 8000, fs=8000, freqs=(220.0, 1400.0), seed=17)
    _, right = sine_mixture(2, 8000, fs=8000, freqs=(220.0, 1400.0), seed=18)
    mix = np.stack([left, 0.6 * left + 0.4 * right])  # correlated ears
    out = StereoSeparator(preset, params)(mix)
    return {"mix": mix, "stems": np.asarray(out)}


def case_multires():
    from convsep_tpu.separate import Separator

    p = tiny_preset("ikala")
    preset = dataclasses.replace(
        p,
        transform=dataclasses.replace(p.transform, multires=(64, 128)),
        model=dataclasses.replace(p.model, channels_in=3),
    )
    params = _params(preset)
    _, mix = sine_mixture(2, 8000, fs=8000, seed=19)
    out = Separator(preset, params)(mix)
    return {"mix": mix, "stems": np.asarray(out)}


def case_bach10_score():
    from convsep_tpu.data.features import score_channels
    from convsep_tpu.dsp.transform import TransformFFT
    from convsep_tpu.score import Note
    from convsep_tpu.separate import Separator

    preset = tiny_preset("bach10")  # channels_in = 5, num_sources = 4
    params = _params(preset)
    _, mix = sine_mixture(4, 8000, fs=8000, seed=23)
    mag = TransformFFT(preset.transform).compute_file(np.asarray(mix))
    notes = [
        [Note(57.0, 0.0, 0.6)],
        [Note(64.0, 0.2, 0.8)],
        [Note(69.0, 0.0, 1.0)],
        [Note(76.0, 0.4, 1.0)],
    ]
    extra = score_channels(mag, notes, preset, "comb") * preset.train.mult_factor_in
    out = Separator(preset, params)(mix, extra=extra)
    return {"mix": mix, "stems": np.asarray(out)}


def case_chunked_int16():
    from convsep_tpu.separate import ChunkedSeparator

    preset = tiny_preset("dsd100")
    params = _params(preset)
    _, mix = sine_mixture(4, 9000, fs=8000, seed=29)
    out = ChunkedSeparator(
        preset, params, chunk_segments=2, output_dtype="int16", input_dtype="int16"
    )(mix)
    return {"mix": mix, "stems": np.asarray(out)}


CASES = {
    "ikala_tiny_stems": case_ikala,
    "dsd100_tiny_stems": case_dsd100,
    "ikala_stereo_tiny_stems": case_ikala_stereo,
    "multires_tiny_stems": case_multires,
    "bach10_score_tiny_stems": case_bach10_score,
    "chunked_int16_tiny_stems": case_chunked_int16,
}
