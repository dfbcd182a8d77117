"""TransformFFT user-facing API tests (reference transformFFT parity)."""

import numpy as np
import pytest

from convsep_tpu.configs.presets import TransformConfig
from convsep_tpu.data.io import load_tensor
from convsep_tpu.dsp.transform import TransformFFT

CFG = TransformConfig(fs=8000, frame_size=256, hop_size=128)


def test_compute_file_and_inverse_roundtrip(rng):
    t = TransformFFT(CFG)
    x = (0.3 * rng.standard_normal(8000)).astype(np.float32)
    mag, ph = t.compute_file(x, phase=True)
    assert mag.shape == ph.shape and mag.shape[1] == t.bins == 129
    assert mag.dtype == np.float32 and (mag >= 0).all()
    y = t.compute_inverse(mag, ph, length=len(x))
    np.testing.assert_allclose(y, x, atol=2e-4)


def test_compute_file_log_scale(rng):
    t = TransformFFT(TransformConfig(fs=8000, frame_size=256, hop_size=128, iscale="log"))
    x = (0.3 * rng.standard_normal(4000)).astype(np.float32)
    mag, ph = t.compute_file(x, phase=True)
    y = t.compute_inverse(mag, ph, length=len(x))
    np.testing.assert_allclose(y, x, atol=5e-4)


def test_compute_inverse_default_length(rng):
    t = TransformFFT(CFG)
    x = (0.3 * rng.standard_normal(4096)).astype(np.float32)
    mag, ph = t.compute_file(x, phase=True)
    y = t.compute_inverse(mag, ph)
    assert abs(len(y) - len(x)) <= CFG.hop_size
    np.testing.assert_allclose(y[: len(x) - 128], x[: len(x) - 128], atol=2e-4)


def test_compute_transform_writes_files(tmp_path, rng):
    t = TransformFFT(CFG)
    x = (0.3 * rng.standard_normal(4000)).astype(np.float32)
    out = str(tmp_path / "trk.mix")
    t.compute_transform(x, out, phase=True)
    mag = load_tensor(out + ".data")
    ph = load_tensor(out + ".phase.data")
    assert mag.shape == ph.shape
    np.testing.assert_allclose(mag, t.compute_file(x), atol=1e-6)


def test_rejects_stereo():
    with pytest.raises(ValueError):
        TransformFFT(CFG).compute_file(np.zeros((100, 2), np.float32))
