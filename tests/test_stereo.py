"""Stereo-native joint-channel model tests (ROADMAP r1 #4).

The reference is mono-only (SURVEY.md §2.1 #5 [H]); the stereo-native
variant is a capability extension: one forward consumes both channel
magnitudes (channels_in=2) and the tied decoder keeps per-channel source
estimates (decoder_reduce="all").
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.configs import get_preset
from convsep_tpu.configs.presets import stereo_preset
from convsep_tpu.data import sine_mixture, write_wav
from convsep_tpu.data.audio_dataset import AudioSegmentDataset, segment_samples
from convsep_tpu.models.convsep import ConvSep, ConvSepConfig
from convsep_tpu.separate.stereo import StereoSeparator, separate_fused_stereo
from convsep_tpu.separate.pipeline import bucket_length
from tests.test_train import tiny_train_preset

FS = 8000


def tiny_stereo_preset(**train_kw):
    return stereo_preset(tiny_train_preset(**train_kw))


@pytest.fixture(scope="module")
def preset():
    return tiny_stereo_preset()


@pytest.fixture(scope="module")
def params(preset):
    cfg = preset.model
    return ConvSep(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )


def stereo_mix(seconds=1.0, seed=0):
    """Two sources panned oppositely → a genuinely stereo mixture (2, L)."""
    stems, _ = sine_mixture(2, int(seconds * FS), fs=FS, freqs=(220.0, 1400.0), seed=seed)
    left = 0.8 * stems[0] + 0.2 * stems[1]
    right = 0.2 * stems[0] + 0.8 * stems[1]
    return stems, np.stack([left, right]).astype(np.float32)


def test_model_shapes_all_reduce(preset):
    cfg = preset.model
    assert cfg.channels_in == 2 and cfg.decoder_reduce == "all"
    x = jnp.ones((3, cfg.time_context, cfg.feat_size, 2))
    m = ConvSep(cfg)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x, method=ConvSep.sources)
    assert y.shape == (3, cfg.num_sources, cfg.time_context, cfg.feat_size, 2)
    yc = m.apply(p, x)
    assert yc.shape == (3, cfg.time_context, cfg.feat_size, cfg.num_sources, 2)
    np.testing.assert_allclose(
        np.asarray(yc), np.asarray(y).transpose(0, 2, 3, 1, 4), rtol=1e-6
    )
    assert (np.asarray(y) >= 0).all()  # relu output


def test_stereo_preset_rejects_multichannel_base():
    with pytest.raises(ValueError, match="not a plain mono preset"):
        stereo_preset(get_preset("bach10"))
    with pytest.raises(ValueError, match="not a plain mono preset"):
        stereo_preset(get_preset("multires4096"))


def test_registered_stereo_presets():
    for name in ("ikala-stereo", "dsd100-stereo", "highres4096-stereo"):
        p = get_preset(name)
        assert p.model.channels_in == 2 and p.model.decoder_reduce == "all"


def test_separate_fused_stereo_shapes(preset, params):
    _, mix = stereo_mix()
    L = mix.shape[1]
    Lb = bucket_length(L, preset)
    padded = jnp.asarray(np.pad(mix, ((0, 0), (0, Lb - L))))
    stems = separate_fused_stereo(params, padded, preset, Lb)
    assert stems.shape == (preset.model.num_sources, 2, Lb)
    assert np.isfinite(np.asarray(stems)).all()


def test_separate_fused_stereo_fft_matmul_agree(preset, params):
    """Two independent DSP implementations of the same stereo program."""
    _, mix = stereo_mix()
    L = mix.shape[1]
    Lb = bucket_length(L, preset)
    padded = jnp.asarray(np.pad(mix, ((0, 0), (0, Lb - L))))
    p_fft = dataclasses.replace(
        preset, transform=dataclasses.replace(preset.transform, fft_impl="fft")
    )
    p_mm = dataclasses.replace(
        preset, transform=dataclasses.replace(preset.transform, fft_impl="matmul")
    )
    s_fft = np.asarray(separate_fused_stereo(params, padded, p_fft, Lb))
    s_mm = np.asarray(separate_fused_stereo(params, padded, p_mm, Lb))
    np.testing.assert_allclose(s_fft, s_mm, atol=5e-4)


def test_stereo_separator_wav_layout(preset, params):
    _, mix = stereo_mix()
    sep = StereoSeparator(preset, params)
    stems = sep(mix.T)  # (L, 2) wav layout
    assert stems.shape == (preset.model.num_sources, mix.shape[1], 2)
    stems2 = sep(mix)  # (2, L) layout
    np.testing.assert_allclose(stems, stems2, rtol=1e-6)


def test_stereo_separator_pcm16_roundtrip(preset, params):
    _, mix = stereo_mix()
    f32 = StereoSeparator(preset, params)(mix)
    i16 = StereoSeparator(preset, params, output_dtype="int16", input_dtype="int16")(mix)
    assert i16.dtype == np.int16
    np.testing.assert_allclose(i16 / 32768.0, f32, atol=2e-4)


def test_separate_fused_stereo_rejects_mono_preset(params):
    mono = tiny_train_preset()
    with pytest.raises(ValueError, match="stereo preset"):
        separate_fused_stereo(params, jnp.zeros((2, 1024)), mono, 1024)


@pytest.fixture(scope="module")
def stereo_audio_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("stereo_audio")
    for i in range(2):
        d = root / f"t{i}"
        d.mkdir()
        stems, _ = sine_mixture(2, 2 * FS, fs=FS, freqs=(220.0, 1400.0), seed=i)
        # opposite panning: the joint model's stereo cue
        v = np.stack([0.9 * stems[0], 0.3 * stems[0]], axis=1)
        a = np.stack([0.3 * stems[1], 0.9 * stems[1]], axis=1)
        write_wav(d / "vocals.wav", FS, v)
        write_wav(d / "accompaniment.wav", FS, a)
        write_wav(d / "mixture.wav", FS, v + a)
    return str(root)


def test_stereo_audio_dataset_shapes(stereo_audio_root, preset):
    seg = segment_samples(preset)
    ds = AudioSegmentDataset(
        stereo_audio_root, ("vocals", "accompaniment"), seg, fs=FS, stereo=True
    )
    mix, stems = ds.get(0)
    assert mix.shape == (2, seg) and stems.shape == (2, 2, seg)
    np.testing.assert_allclose(mix, stems.sum(0), atol=2e-3)
    x, y = next(ds.batches(4, shuffle=False))
    assert x.shape == (4, 2, seg) and y.shape == (4, 2, 2, seg)


def test_stereo_audio_dataset_duplicates_mono_stem(tmp_path, preset):
    d = tmp_path / "t0"
    d.mkdir()
    stems, mix = sine_mixture(2, FS, fs=FS, seed=0)
    write_wav(d / "vocals.wav", FS, stems[0])  # mono stem
    write_wav(d / "accompaniment.wav", FS, np.stack([stems[1]] * 2, axis=1))
    seg = segment_samples(preset)
    ds = AudioSegmentDataset(str(tmp_path), ("vocals", "accompaniment"), seg, fs=FS, stereo=True)
    _, got = ds.get(0)
    np.testing.assert_allclose(got[0, 0], got[0, 1])  # center-panned


def test_stereo_e2e_train_loss_decreases(stereo_audio_root, preset):
    from convsep_tpu.train.e2e import make_audio_train_step
    from convsep_tpu.train.loop import create_train_state

    seg = segment_samples(preset)
    ds = AudioSegmentDataset(
        stereo_audio_root,
        ("vocals", "accompaniment"),
        seg,
        overlap_samples=seg // 2,
        fs=FS,
        stereo=True,
    )
    state, opt = create_train_state(preset, 0)
    step = make_audio_train_step(preset, opt)
    # Per-batch losses are very noisy on this tiny fixture (0.005-0.09 within
    # one epoch) and adadelta over-shoots after ~6 epochs, so compare EPOCH
    # MEANS with a margin instead of single first/last batch losses.
    epoch_means = []
    for epoch in range(6):
        losses = []
        for mix, stems in ds.batches(4, shuffle=True, seed=epoch):
            state, m = step(state, jnp.asarray(mix), jnp.asarray(stems))
            losses.append(float(m["loss"]))
        epoch_means.append(float(np.mean(losses)))
    assert np.isfinite(epoch_means).all()
    assert min(epoch_means[1:]) < 0.9 * epoch_means[0], (
        f"stereo e2e loss did not decrease: epoch means {epoch_means}"
    )


def stereo_tracks(n, seconds=1.0):
    return [stereo_mix(seconds=seconds + 0.1 * i, seed=i)[1] for i in range(n)]


def test_stereo_stream_matches_single(preset, params):
    from convsep_tpu.separate import StereoSeparator, StreamSeparator

    tracks = stereo_tracks(3)
    ss = StreamSeparator(preset, params)
    outs = [o for b in ss.stream(iter(tracks), batch_size=2) for o in b]
    single = StereoSeparator(preset, params)
    for t, o in zip(tracks, outs):
        assert o.shape == (2, 2, t.shape[-1])  # (S, 2, L)
        np.testing.assert_allclose(o.transpose(0, 2, 1), single(t), atol=1e-4)


def test_stereo_batch_scan_matches_vmap(preset, params):
    """lax.map stereo batch (single-dispatch bench path) == vmap batch."""
    import jax.numpy as jnp

    from convsep_tpu.separate.pipeline import bucket_length
    from convsep_tpu.separate.stream import (
        separate_batch_scan_stereo,
        separate_batch_stereo,
    )

    tracks = stereo_tracks(3, seconds=0.9)
    Lb = bucket_length(max(t.shape[-1] for t in tracks), preset)
    stacked = jnp.stack(
        [jnp.pad(jnp.asarray(t), ((0, 0), (0, Lb - t.shape[-1]))) for t in tracks]
    )
    a = separate_batch_stereo(params, stacked, preset, Lb)
    b = separate_batch_scan_stereo(params, stacked, preset, Lb)
    assert a.shape == b.shape == (3, 2, 2, Lb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stereo_stream_mesh_matches_unsharded(preset, params):
    from convsep_tpu.distributed import make_mesh
    from convsep_tpu.separate import StreamSeparator

    tracks = stereo_tracks(4)
    plain = StreamSeparator(preset, params).separate_many(tracks)
    mesh = make_mesh(data=4, model=1)
    sharded = StreamSeparator(preset, params, mesh=mesh).separate_many(tracks)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_stereo_separate_batch_cli(tmp_path, monkeypatch):
    import scipy.io.wavfile as wavfile

    from convsep_tpu import cli
    from convsep_tpu.configs import presets as presets_mod
    from convsep_tpu.data import write_wav
    from tests.test_cli import _tiny_ikala

    monkeypatch.setitem(
        presets_mod.PRESETS, "tinyikala-stereo", lambda: stereo_preset(_tiny_ikala())
    )
    mixes = tmp_path / "mixes"
    mixes.mkdir()
    for i in range(3):
        _, mix = stereo_mix(seconds=1.0, seed=i)
        write_wav(mixes / f"m{i}.wav", FS, mix.T)
    import pickle

    from tests.test_convert import _random_reference_values

    tiny = stereo_preset(_tiny_ikala())
    vals = _random_reference_values(tiny.model, np.random.default_rng(0))
    pkl = str(tmp_path / "m.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(vals, f, protocol=2)
    out = str(tmp_path / "est")
    assert cli.main([
        "separate-batch", "--preset", "tinyikala-stereo", "--params", pkl,
        "--input-dir", str(mixes), "-o", out, "--batch-size", "2",
    ]) == 0
    import os

    fs, v = wavfile.read(os.path.join(out, "m0", "vocals.wav"))
    assert v.ndim == 2 and v.shape[1] == 2 and v.dtype == np.int16
