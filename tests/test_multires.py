"""Multi-resolution spectrogram tests (BASELINE config #5)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.configs.presets import TransformConfig
from convsep_tpu.data import sine_mixture
from convsep_tpu.dsp import sinebell, stft, num_frames
from convsep_tpu.dsp.multires import freq_interp_matrix, multires_channels
from convsep_tpu.models import ConvSep
from convsep_tpu.separate import Separator
from tests.test_separate import tiny_preset


def test_freq_interp_matrix_endpoints_and_rows():
    m = freq_interp_matrix(65, 129)
    assert m.shape == (65, 129)
    np.testing.assert_allclose(m.sum(axis=0), 1.0, atol=1e-6)  # partition of unity
    assert m[0, 0] == 1.0 and m[-1, -1] == 1.0
    # interpolating a linear ramp is exact
    ramp = np.linspace(0, 1, 65, dtype=np.float32)
    np.testing.assert_allclose(ramp @ m, np.linspace(0, 1, 129), atol=1e-6)


def test_multires_channels_alignment_and_shape(rng):
    t = TransformConfig(fs=8000, frame_size=256, hop_size=128, multires=(64, 128))
    x = (0.3 * rng.standard_normal(6000)).astype(np.float32)
    ch = np.asarray(multires_channels(jnp.asarray(x), t))
    nf = num_frames(6000, 128)
    assert ch.shape == (nf, t.bins, 2)
    assert (ch >= 0).all()
    # the 128-window channel matches a direct stft + interp
    mag = np.abs(np.asarray(stft(x, sinebell(128), 128)))
    want = mag @ freq_interp_matrix(65, t.bins)
    np.testing.assert_allclose(ch[..., 1], want, atol=2e-3 * mag.max())


def test_multires_requires_config(rng):
    t = TransformConfig(fs=8000, frame_size=256, hop_size=128)
    with pytest.raises(ValueError, match="multires"):
        multires_channels(jnp.zeros(1000), t)


def test_multires_separation_end_to_end(rng):
    p = tiny_preset("ikala")
    t = dataclasses.replace(p.transform, multires=(64, 128))
    model = dataclasses.replace(p.model, channels_in=3)
    preset = dataclasses.replace(p, transform=t, model=model)
    params = ConvSep(model).init(
        jax.random.PRNGKey(0), jnp.zeros((1, model.time_context, model.feat_size, 3))
    )
    _, mix = sine_mixture(2, 8000, fs=8000, seed=4)
    stems = Separator(preset, params)(mix)
    assert stems.shape == (2, 8000)
    assert np.isfinite(stems).all()


def test_multires_feature_files(tmp_path):
    from convsep_tpu.data import load_tensor, write_wav
    from convsep_tpu.data.features import compute_features

    p = tiny_preset("ikala")
    preset = dataclasses.replace(
        p,
        transform=dataclasses.replace(p.transform, multires=(64, 128)),
        model=dataclasses.replace(p.model, channels_in=3),
    )
    adir = tmp_path / "audio"
    d = adir / "t0"
    d.mkdir(parents=True)
    stems, _ = sine_mixture(2, 8000, fs=8000, seed=0)
    write_wav(d / "vocals.wav", 8000, stems[0])
    write_wav(d / "accompaniment.wav", 8000, stems[1])
    out = tmp_path / "feats"
    compute_features(str(adir), str(out), preset)
    mix = load_tensor(str(out / "t0.mix.data"))
    for size in (64, 128):
        r = load_tensor(str(out / f"t0.res{size}.data"))
        assert r.shape == mix.shape

    from convsep_tpu.data import SegmentDataset

    ds = SegmentDataset(
        str(out),
        ("vocals", "accompaniment"),
        time_context=10,
        overlap=5,
        extra_channels=("res64", "res128"),
    )
    x, y = ds.get(0)
    assert x.shape == (10, preset.transform.bins, 3)
