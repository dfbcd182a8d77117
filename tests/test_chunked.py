"""Chunked single-track streaming separation (VERDICT r1 #2).

The contract: chunked output == whole-track fused output to float
tolerance, for every chunk-boundary geometry (track shorter than one
chunk, exact multiples, ragged tails, hop = W/2 and the W/4 spill
boundary), with the OLA spill carried across seams on device.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.configs import get_preset
from convsep_tpu.configs.presets import TransformConfig
from convsep_tpu.models import ConvSep
from convsep_tpu.separate import ChunkedSeparator, Separator


def tiny_preset(frame_size=256, hop_size=128, name="dsd100"):
    p = get_preset(name)
    t = TransformConfig(fs=8000, frame_size=frame_size, hop_size=hop_size)
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
        p, transform=t, model=model, sep=dataclasses.replace(p.sep, segment_bucket=2)
    )


def _params(preset, seed=0):
    cfg = preset.model
    return ConvSep(cfg).init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )


@pytest.mark.parametrize("seconds", [0.4, 1.0, 2.37])
@pytest.mark.parametrize("chunk_segments", [1, 3])
def test_chunked_equals_whole_track(rng, seconds, chunk_segments):
    preset = tiny_preset()
    params = _params(preset)
    L = int(seconds * preset.transform.fs)
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    whole = Separator(preset, params)(audio)
    chunked = ChunkedSeparator(preset, params, chunk_segments=chunk_segments)(audio)
    assert chunked.shape == whole.shape == (4, L)
    np.testing.assert_allclose(chunked, whole, atol=2e-5)


def test_chunked_hop_quarter_window(rng):
    """hop == W/4: the spill margin spans 3 hops (k=4 OLA depth)."""
    preset = tiny_preset(frame_size=256, hop_size=64)
    params = _params(preset)
    L = 11_111
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    whole = Separator(preset, params)(audio)
    chunked = ChunkedSeparator(preset, params, chunk_segments=2)(audio)
    np.testing.assert_allclose(chunked, whole, atol=2e-5)


def test_chunked_pcm16_roundtrip(rng):
    """int16-in/int16-out chunked == int16 whole-track (exact: same
    quantization applied to near-identical floats)."""
    preset = tiny_preset(name="ikala")
    params = _params(preset)
    L = 9_000
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    whole = Separator(preset, params, output_dtype="int16", input_dtype="int16")(audio)
    chunked = ChunkedSeparator(
        preset, params, chunk_segments=2, output_dtype="int16", input_dtype="int16"
    )(audio)
    assert chunked.dtype == np.int16
    diff = np.abs(chunked.astype(np.int32) - whole.astype(np.int32))
    assert diff.max() <= 1  # ±1 LSB where a float lands on a rounding edge


def test_chunked_norm_cache_reused(rng):
    preset = tiny_preset()
    params = _params(preset)
    cs = ChunkedSeparator(preset, params, chunk_segments=2)
    for L in (6_000, 9_000, 12_345):
        audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
        out = cs(audio)
        assert out.shape == (4, L) and np.isfinite(out).all()
    assert "first" in cs._norm_cache and "mid" in cs._norm_cache


def test_chunked_rejects_unsupported_presets():
    # multires sizes larger than the main window would need context the
    # chunk slice does not carry
    multires = tiny_preset(name="dsd100")
    multires = dataclasses.replace(
        multires,
        transform=dataclasses.replace(multires.transform, multires=(512,)),
        model=dataclasses.replace(multires.model, channels_in=2),
    )
    with pytest.raises(ValueError, match="multires"):
        ChunkedSeparator(multires, None)
    bad_hop = tiny_preset(frame_size=256, hop_size=32)
    with pytest.raises(ValueError, match="hop"):
        ChunkedSeparator(bad_hop, None)


def test_chunked_factored_dft_equals_whole_track(rng):
    """At nfft >= 2048 the chunk program uses the factored Cooley-Tukey
    DFT (dsp/dft.py auto threshold) — must still match the whole-track
    Separator, which routes through the same factored stft/istft."""
    preset = tiny_preset(frame_size=2048, hop_size=512)
    params = _params(preset)
    L = 20_000
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    whole = Separator(preset, params)(audio)
    chunked = ChunkedSeparator(preset, params, chunk_segments=2)(audio)
    assert chunked.shape == whole.shape == (4, L)
    np.testing.assert_allclose(chunked, whole, atol=2e-5)


def test_chunked_multires_equals_whole_track(rng):
    """Multi-res conditioned chunked == whole-track: the extra channels are
    recomputed inside each chunk program from the same slice (all
    resolutions share the hop, smaller windows need less context)."""
    preset = tiny_preset(name="dsd100")
    preset = dataclasses.replace(
        preset,
        transform=dataclasses.replace(preset.transform, multires=(64, 128)),
        model=dataclasses.replace(preset.model, channels_in=3),
    )
    params = _params(preset)
    L = 10_000
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    whole = Separator(preset, params)(audio)
    chunked = ChunkedSeparator(preset, params, chunk_segments=2)(audio)
    assert chunked.shape == whole.shape == (4, L)
    np.testing.assert_allclose(chunked, whole, atol=2e-5)


def test_chunked_score_informed_equals_whole_track(rng):
    """Score-conditioned (extra-channels) chunked == whole-track: the
    conditioning channels are sliced per chunk on the same frame grid
    (SURVEY.md §3.4 separation path)."""
    preset = tiny_preset(name="bach10")
    preset = dataclasses.replace(
        preset, model=dataclasses.replace(preset.model, channels_in=5)
    )
    params = _params(preset)
    L = 10_000
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    from convsep_tpu.dsp.stft import num_frames

    nf = num_frames(L, preset.transform.hop_size)
    extra = rng.random((nf, preset.model.feat_size, 4)).astype(np.float32)
    whole = Separator(preset, params)(audio, extra=extra)
    chunked = ChunkedSeparator(preset, params, chunk_segments=2)(audio, extra=extra)
    assert chunked.shape == whole.shape == (4, L)
    np.testing.assert_allclose(chunked, whole, atol=2e-5)
    # missing conditioning is a hard error, not a silent unconditioned run
    with pytest.raises(ValueError, match="extra"):
        ChunkedSeparator(preset, params, chunk_segments=2)(audio)


def test_chunked_stereo_equals_whole_track(rng):
    """Stereo-native chunked == StereoSeparator (joint-channel model with
    the OLA spill carried per channel)."""
    from convsep_tpu.configs.presets import stereo_preset
    from convsep_tpu.separate import StereoSeparator

    base = tiny_preset(name="ikala")
    preset = stereo_preset(
        dataclasses.replace(
            base, model=dataclasses.replace(base.model, channels_in=1)
        )
    )
    params = _params(preset)
    L = 9_321
    audio = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    audio[1] *= 0.3  # asymmetric ears exercise per-channel masks
    whole = StereoSeparator(preset, params)(audio)  # (S, L, 2)
    chunked = ChunkedSeparator(preset, params, chunk_segments=2)(audio)
    assert chunked.shape == whole.shape == (2, L, 2)
    np.testing.assert_allclose(chunked, whole, atol=2e-5)
    # (L, 2) wav-layout input accepted too
    chunked2 = ChunkedSeparator(preset, params, chunk_segments=3)(audio.T)
    np.testing.assert_allclose(chunked2, whole, atol=2e-5)


def test_conserve_last_stems_sum_to_mixture(rng):
    """conserve_last makes the device masks sum to exactly 1, so the stems
    sum back to the (iSTFT∘STFT-roundtripped) mixture — unlike the plain
    eps masks, under which ReLU-dead bins leak energy."""
    preset = tiny_preset()
    params = _params(preset)
    L = int(1.3 * preset.transform.fs)
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    plain = ChunkedSeparator(preset, params, chunk_segments=3)(audio)
    cons = ChunkedSeparator(
        preset, params, chunk_segments=3, conserve_last=True
    )(audio)
    np.testing.assert_allclose(cons[:-1], plain[:-1], atol=1e-6)
    cons_resid = np.abs(cons.sum(0) - audio).max()
    np.testing.assert_allclose(cons.sum(0), audio, atol=1e-4)
    # plain masks leak wherever ReLU-dead bins leave TF energy unclaimed;
    # assert RELATIVE to the conservative path's residual so the test does
    # not depend on the dead-bin density of one particular random init
    assert np.abs(plain.sum(0) - audio).max() > 10 * max(cons_resid, 1e-7)


def test_complement_last_matches_conserve_direct(rng):
    """complement_last derives the last stem as mixture − Σ others on the
    host; under conservative masks that must equal the directly-fetched
    device stem up to iSTFT-roundtrip float error."""
    preset = tiny_preset()
    params = _params(preset)
    L = int(1.3 * preset.transform.fs)
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    direct = ChunkedSeparator(
        preset, params, chunk_segments=3, conserve_last=True
    )(audio)
    comp = ChunkedSeparator(
        preset, params, chunk_segments=3, complement_last=True
    )(audio)
    assert comp.shape == direct.shape
    np.testing.assert_allclose(comp[:-1], direct[:-1], atol=1e-6)
    np.testing.assert_allclose(comp[-1], direct[-1], atol=1e-4)


def test_complement_last_int16_within_quantization(rng):
    """int16 mode: with round-to-nearest quantization (utils/pcm.py) the
    derived stem differs from the direct fetch by the other stems'
    quantization error, ≤(S−1)/2 LSB, plus the derived stem's own final
    rounding (≤0.5 LSB) and iSTFT-roundtrip float error → ≤2 LSBs for
    S=2."""
    preset = tiny_preset()
    params = _params(preset)
    L = int(0.9 * preset.transform.fs)
    audio = (0.1 * rng.standard_normal(L)).astype(np.float32)
    kw = dict(chunk_segments=2, output_dtype="int16", input_dtype="int16")
    direct = ChunkedSeparator(preset, params, conserve_last=True, **kw)(audio)
    comp = ChunkedSeparator(preset, params, complement_last=True, **kw)(audio)
    assert comp.dtype == np.int16
    np.testing.assert_array_equal(comp[:-1], direct[:-1])
    assert np.abs(comp[-1].astype(np.int32) - direct[-1].astype(np.int32)).max() <= 2


def test_complement_last_rejects_single_source():
    """S=1 complement fetch is degenerate (nothing to subtract) and used to
    fail later with an opaque np.stack([]) ValueError (ADVICE r2)."""
    preset = tiny_preset()
    preset = dataclasses.replace(
        preset, model=dataclasses.replace(preset.model, num_sources=1)
    )
    with pytest.raises(ValueError, match="complement_last requires"):
        ChunkedSeparator(preset, _params(preset), complement_last=True)


def test_complement_last_stereo(rng):
    """stereo presets: the derived stem is (2, span)-shaped per chunk."""
    preset = tiny_preset(name="ikala-stereo")
    params = _params(preset)
    L = int(1.1 * preset.transform.fs)
    audio = (0.1 * rng.standard_normal((2, L))).astype(np.float32)
    direct = ChunkedSeparator(
        preset, params, chunk_segments=2, conserve_last=True
    )(audio)
    comp = ChunkedSeparator(
        preset, params, chunk_segments=2, complement_last=True
    )(audio)
    np.testing.assert_allclose(comp[:-1], direct[:-1], atol=1e-6)
    np.testing.assert_allclose(comp[-1], direct[-1], atol=1e-4)
