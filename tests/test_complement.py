"""Complement-fetch of the last stem across ALL separator entry points.

VERDICT r3 #4: the conserve-mask + host-side last-stem derivation
(separate/complement.py) was wired only into ChunkedSeparator; r4 extends
it to Separator, StereoSeparator, and StreamSeparator. These tests pin
the invariant every path relies on: under conservative Wiener masks the
derived last stem equals the device-computed last stem up to the
iSTFT∘STFT roundtrip float error (and quantization in int16 mode), and
the non-last stems are byte-identical between the two modes.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.configs.presets import stereo_preset
from convsep_tpu.data import sine_mixture
from convsep_tpu.models import ConvSep
from convsep_tpu.separate import Separator, StreamSeparator
from convsep_tpu.separate.complement import derive_last_stem
from convsep_tpu.separate.stereo import StereoSeparator

from tests.test_separate import tiny_preset


def _params(preset, seed=0):
    cfg = preset.model
    return ConvSep(cfg).init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )


@pytest.fixture(scope="module")
def ikala():
    return tiny_preset("ikala")


@pytest.fixture(scope="module")
def mix(ikala):
    _, m = sine_mixture(2, 8000, fs=ikala.transform.fs, freqs=(220.0, 1400.0), seed=3)
    return m.astype(np.float32)


def test_derive_last_stem_float32():
    rng = np.random.default_rng(0)
    mix = rng.standard_normal(100).astype(np.float32) * 0.1
    others = rng.standard_normal((3, 100)).astype(np.float32) * 0.02
    last = derive_last_stem(others, mix, "float32", "float32")
    np.testing.assert_allclose(last, mix - others.sum(0), atol=1e-7)


def test_derive_last_stem_int16_roundtrip():
    from convsep_tpu.utils.pcm import quantize_pcm16_host

    rng = np.random.default_rng(1)
    mix = (0.3 * rng.standard_normal(200)).astype(np.float32)
    others = (0.05 * rng.standard_normal((1, 200))).astype(np.float32)
    mix16 = quantize_pcm16_host(mix)
    o16 = quantize_pcm16_host(others)
    last = derive_last_stem(o16, mix16, "int16", "int16")
    assert last.dtype == np.int16
    expect = quantize_pcm16_host(
        mix16.astype(np.float32) / 32768.0 - o16.astype(np.float32).sum(0) / 32768.0
    )
    # exact: both sides quantize the same float difference
    np.testing.assert_array_equal(last, expect)


def test_separator_complement_matches_device_conserve(ikala, mix):
    params = _params(ikala)
    dev = Separator(ikala, params, conserve_last=True)(mix)
    comp = Separator(ikala, params, complement_last=True)(mix)
    # non-last stems: identical program, identical bytes
    np.testing.assert_array_equal(dev[:-1], comp[:-1])
    # derived last stem: roundtrip float error only
    np.testing.assert_allclose(dev[-1], comp[-1], atol=1e-4)
    # conservation: stems sum back to the mixture (roundtrip error)
    np.testing.assert_allclose(comp.sum(0), mix, atol=1e-4)


def test_separator_complement_int16(ikala, mix):
    params = _params(ikala)
    comp = Separator(
        ikala, params, complement_last=True, output_dtype="int16", input_dtype="int16"
    )(mix)
    assert comp.dtype == np.int16
    # conservation within (S−1)/2 + 1 LSB of quantization error
    total = comp.astype(np.float32).sum(0) / 32768.0
    assert np.abs(total - mix).max() < 3.0 / 32768.0


def test_separator_complement_differs_from_plain(ikala, mix):
    """Conservative masks reroute unclaimed energy to the LAST stem, so the
    last stem must differ from the plain-mask run (else the knob is dead)."""
    params = _params(ikala)
    plain = Separator(ikala, params)(mix)
    comp = Separator(ikala, params, complement_last=True)(mix)
    assert not np.allclose(plain[-1], comp[-1], atol=1e-6)


def test_stream_separator_complement(ikala, mix):
    params = _params(ikala)
    tracks = [mix, (0.5 * mix).astype(np.float32)]
    dev = StreamSeparator(ikala, params, conserve_last=True).separate_many(tracks)
    comp = StreamSeparator(ikala, params, complement_last=True).separate_many(tracks)
    for d, c in zip(dev, comp):
        np.testing.assert_array_equal(d[:-1], c[:-1])
        np.testing.assert_allclose(d[-1], c[-1], atol=1e-4)


def test_stream_separator_complement_generator(ikala, mix):
    params = _params(ikala)
    tracks = [mix, (0.5 * mix).astype(np.float32), (0.25 * mix).astype(np.float32)]
    ss = StreamSeparator(ikala, params, complement_last=True)
    got = [s for batch in ss.stream(iter(tracks), batch_size=2) for s in batch]
    assert len(got) == 3
    for t, s in zip(tracks, got):
        assert s.shape == (2, len(t))
        np.testing.assert_allclose(s.sum(0), t, atol=1e-4)


def test_stereo_separator_complement():
    preset = stereo_preset(tiny_preset("ikala"))
    params = _params(preset)
    _, m = sine_mixture(2, 6000, fs=preset.transform.fs, freqs=(220.0, 900.0), seed=5)
    audio = np.stack([m, 0.5 * m], axis=1).astype(np.float32)  # (L, 2) wav layout
    dev = StereoSeparator(preset, params, conserve_last=True)(audio)
    comp = StereoSeparator(preset, params, complement_last=True)(audio)
    assert comp.shape == dev.shape == (2, 6000, 2)
    np.testing.assert_array_equal(dev[:-1], comp[:-1])
    np.testing.assert_allclose(dev[-1], comp[-1], atol=1e-4)
    np.testing.assert_allclose(comp.sum(0), audio, atol=1e-4)


def test_complement_requires_two_sources(ikala):
    params = _params(ikala)
    one = dataclasses.replace(
        ikala, model=dataclasses.replace(ikala.model, num_sources=1)
    )
    with pytest.raises(ValueError, match="2 sources"):
        Separator(one, params, complement_last=True)
    with pytest.raises(ValueError, match="2 sources"):
        StreamSeparator(one, params, complement_last=True)


def test_complement_rejects_pallas_mask(ikala):
    params = _params(ikala)
    pl = dataclasses.replace(
        ikala, transform=dataclasses.replace(ikala.transform, fft_impl="pallas")
    )
    with pytest.raises(ValueError, match="pallas"):
        Separator(pl, params, complement_last=True)
    with pytest.raises(ValueError, match="pallas"):
        StreamSeparator(pl, params, conserve_last=True)
