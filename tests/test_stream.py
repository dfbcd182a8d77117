"""Batched multi-track streaming tests (BASELINE config #4) on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.data import sine_mixture
from convsep_tpu.distributed import make_mesh
from convsep_tpu.models import ConvSep
from convsep_tpu.separate import Separator, StreamSeparator
from tests.test_separate import tiny_preset


@pytest.fixture(scope="module")
def setup():
    preset = tiny_preset("ikala")
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.time_context, cfg.feat_size, 1))
    )
    return preset, params


def _tracks(n, fs=8000, seed=0):
    return [
        sine_mixture(2, fs + 137 * i, fs=fs, freqs=(220.0, 1400.0), seed=seed + i)[1]
        for i in range(n)
    ]


def test_separate_many_matches_single_track(setup):
    preset, params = setup
    tracks = _tracks(3)
    ss = StreamSeparator(preset, params)
    outs = ss.separate_many(tracks)
    single = Separator(preset, params)
    for t, o in zip(tracks, outs):
        assert o.shape == (2, len(t))
        np.testing.assert_allclose(o, single(t), atol=1e-4)


def test_separate_many_sharded_matches_unsharded(setup):
    preset, params = setup
    tracks = _tracks(8)
    plain = StreamSeparator(preset, params).separate_many(tracks)
    mesh = make_mesh(data=8, model=1)
    sharded = StreamSeparator(preset, params, mesh=mesh).separate_many(tracks)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_stream_batches(setup):
    preset, params = setup
    tracks = _tracks(5)
    ss = StreamSeparator(preset, params)
    got = [o for batch in ss.stream(iter(tracks), batch_size=2) for o in batch]
    assert len(got) == 5
    single = Separator(preset, params)
    for t, o in zip(tracks, got):
        np.testing.assert_allclose(o, single(t), atol=1e-4)


def test_stream_propagates_errors(setup):
    preset, params = setup

    def bad():
        yield _tracks(1)[0]
        raise RuntimeError("source died")

    ss = StreamSeparator(preset, params)
    with pytest.raises(RuntimeError, match="source died"):
        list(ss.stream(bad(), batch_size=4))


def test_sharded_single_track_matches_unsharded():
    """One track sharded across 8 chips == unsharded fused separation."""
    import dataclasses

    from convsep_tpu.separate.sharded import ShardedSeparator

    p = tiny_preset("ikala")
    preset = dataclasses.replace(
        p,
        transform=dataclasses.replace(p.transform, fft_impl="matmul"),
        sep=dataclasses.replace(p.sep, segment_bucket=8),
    )
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.time_context, cfg.feat_size, 1))
    )
    _, mix = sine_mixture(2, 12000, fs=8000, freqs=(220.0, 1400.0), seed=5)
    want = Separator(preset, params)(mix)
    mesh = make_mesh(data=8, model=1)
    got = ShardedSeparator(preset, params, mesh)(mix)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sharded_rejects_fft_impl():
    import dataclasses

    from convsep_tpu.separate.sharded import separate_track_sharded

    p = tiny_preset("ikala")
    p = dataclasses.replace(
        p, transform=dataclasses.replace(p.transform, fft_impl="fft")
    )
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="matmul"):
        separate_track_sharded({}, jnp.zeros(8000), p, mesh, 8000)


def test_sharded_separator_various_mesh_shapes():
    import dataclasses

    from convsep_tpu.separate.sharded import ShardedSeparator

    p = tiny_preset("ikala")
    preset = dataclasses.replace(
        p,
        transform=dataclasses.replace(p.transform, fft_impl="matmul"),
        sep=dataclasses.replace(p.sep, segment_bucket=8),
    )
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.time_context, cfg.feat_size, 1))
    )
    _, mix = sine_mixture(2, 10000, fs=8000, freqs=(220.0, 1400.0), seed=6)
    want = Separator(preset, params)(mix)
    for d in (2, 4):
        mesh = make_mesh(data=d, model=1)
        got = ShardedSeparator(preset, params, mesh)(mix)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_separate_batch_scan_matches_vmap(setup):
    from convsep_tpu.separate.stream import separate_batch, separate_batch_scan
    from convsep_tpu.separate import bucket_length

    preset, params = setup
    tracks = _tracks(3)
    Lb = bucket_length(max(len(t) for t in tracks), preset)
    stacked = np.zeros((3, Lb), np.float32)
    for i, t in enumerate(tracks):
        stacked[i, : len(t)] = t
    a = np.asarray(separate_batch(params, jnp.asarray(stacked), preset, Lb))
    b = np.asarray(separate_batch_scan(params, jnp.asarray(stacked), preset, Lb))
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_separate_batch_scan_grouped_matches_ungrouped(setup):
    """group=k (k tracks vmapped per lax.map iteration) is a pure batching
    reassociation — outputs must match group=1 exactly; a B not divisible
    by the group falls back to the plain per-track map."""
    from convsep_tpu.separate.stream import separate_batch_scan
    from convsep_tpu.separate import bucket_length

    preset, params = setup
    tracks = _tracks(4)
    Lb = bucket_length(max(len(t) for t in tracks), preset)
    stacked = np.zeros((4, Lb), np.float32)
    for i, t in enumerate(tracks):
        stacked[i, : len(t)] = t
    a = np.asarray(separate_batch_scan(params, jnp.asarray(stacked), preset, Lb))
    b = np.asarray(
        separate_batch_scan(params, jnp.asarray(stacked), preset, Lb, group=2)
    )
    np.testing.assert_allclose(b, a, atol=1e-6)
    # indivisible group → fallback path, still correct
    c = np.asarray(
        separate_batch_scan(params, jnp.asarray(stacked), preset, Lb, group=3)
    )
    np.testing.assert_allclose(c, a, atol=1e-6)


def test_stream_int16_input_not_requantized(setup):
    """PCM16 tracks through stream(input_dtype=int16) must match the float
    path — regression: int16 inputs were converted to float32 VALUES and
    then re-quantized with a second x32768 (full-scale saturation)."""
    preset, params = setup
    tracks = _tracks(3)
    pcm = [np.clip(t * 32768.0, -32768, 32767).astype(np.int16) for t in tracks]
    f32 = list(StreamSeparator(preset, params).stream(iter(tracks), batch_size=2))
    i16 = list(
        StreamSeparator(preset, params, input_dtype="int16").stream(
            iter(pcm), batch_size=2
        )
    )
    got = [o for b in i16 for o in b]
    want = [o for b in f32 for o in b]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-3)


def test_batch_scan_collapsed_encoder_matches_conv(setup):
    """The batched scan path with encoder_impl="collapsed" (composition
    precomposed OUTSIDE the lax.map body by separate_batch_scan) matches
    the conv-encoder output — validates the precompose wiring end to end,
    plus the ChunkedSeparator construction-time precompose."""
    import dataclasses

    from convsep_tpu.separate import bucket_length
    from convsep_tpu.separate.chunked import ChunkedSeparator
    from convsep_tpu.separate.stream import separate_batch_scan

    preset, params = setup
    pc = dataclasses.replace(
        preset, model=dataclasses.replace(preset.model, encoder_impl="collapsed")
    )
    tracks = _tracks(2)
    Lb = bucket_length(max(len(t) for t in tracks), preset)
    stacked = np.zeros((2, Lb), np.float32)
    for i, t in enumerate(tracks):
        stacked[i, : len(t)] = t
    a = np.asarray(separate_batch_scan(params, jnp.asarray(stacked), preset, Lb))
    b = np.asarray(separate_batch_scan(params, jnp.asarray(stacked), pc, Lb))
    np.testing.assert_allclose(b, a, atol=1e-4)

    cs = ChunkedSeparator(pc, params, chunk_segments=2)
    assert "enc_cache" in cs.params
    got = cs(tracks[0])
    want = np.asarray(
        separate_batch_scan(params, jnp.asarray(stacked), preset, Lb)
    )[0][:, : len(tracks[0])]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_separate_batch_extra_channels_shared_and_per_track():
    """Score-informed batched separation: separate_batch/_scan accept extra
    channels shared across tracks (ndim 3) or per-track (ndim 4), matching
    per-track separate_fused (the path the bach10 bench rides)."""
    import dataclasses

    from convsep_tpu.dsp import num_frames
    from convsep_tpu.separate.pipeline import bucket_length, separate_fused
    from convsep_tpu.separate.stream import separate_batch, separate_batch_scan

    preset = tiny_preset("bach10")
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    rng = np.random.default_rng(3)
    L = bucket_length(4000, preset)
    B = 3
    tracks = jnp.asarray(0.1 * rng.standard_normal((B, L)), jnp.float32)
    nf = num_frames(L, preset.transform.hop_size)
    ex1 = jnp.asarray(
        np.abs(rng.standard_normal((nf, cfg.feat_size, cfg.channels_in - 1))),
        jnp.float32,
    )
    exB = jnp.asarray(
        np.abs(rng.standard_normal((B, nf, cfg.feat_size, cfg.channels_in - 1))),
        jnp.float32,
    )
    want_shared = np.stack(
        [separate_fused(params, tracks[i], ex1, preset, L) for i in range(B)]
    )
    want_per = np.stack(
        [separate_fused(params, tracks[i], exB[i], preset, L) for i in range(B)]
    )
    for fn in (separate_batch, separate_batch_scan):
        got_shared = fn(params, tracks, preset, L, extra=ex1)
        got_per = fn(params, tracks, preset, L, extra=exB)
        np.testing.assert_allclose(got_shared, want_shared, atol=1e-5)
        np.testing.assert_allclose(got_per, want_per, atol=1e-5)
    # the collapsed-encoder path composes OUTSIDE the vmap — same numbers
    collapsed = dataclasses.replace(
        preset, model=dataclasses.replace(cfg, encoder_impl="collapsed")
    )
    got_c = separate_batch(params, tracks, collapsed, L, extra=exB)
    np.testing.assert_allclose(got_c, want_per, atol=1e-4)


def test_separate_many_with_score_extras():
    """StreamSeparator.separate_many(extras=...) == per-track Separator
    with the same score channels, on and off the mesh."""
    from convsep_tpu.dsp import num_frames

    preset = tiny_preset("bach10")
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    rng = np.random.default_rng(5)
    fs = preset.transform.fs
    tracks = [(0.1 * rng.standard_normal(fs + 99 * i)).astype(np.float32) for i in range(3)]
    extras = []
    for t in tracks:
        nf = num_frames(len(t), preset.transform.hop_size)
        extras.append(
            np.abs(rng.standard_normal((nf, cfg.feat_size, cfg.channels_in - 1))).astype(np.float32)
        )
    single = Separator(preset, params)
    want = [single(t, extra=e) for t, e in zip(tracks, extras)]
    for mesh in (None, make_mesh(data=2)):
        ss = StreamSeparator(preset, params, mesh=mesh)
        outs = ss.separate_many(tracks, extras=extras)
        for w, o in zip(want, outs):
            np.testing.assert_allclose(o, w, atol=1e-4)
    with pytest.raises(ValueError, match="extras"):
        StreamSeparator(preset, params).separate_many(tracks, extras=extras[:1])


def test_separate_batch_native_matches_vmap(setup):
    """The native-batch fused pipeline (separate_fused_batch) must equal
    the vmap-of-single-track program — including a multires preset whose
    extra channels are synthesized inside the program."""
    from convsep_tpu.separate.pipeline import bucket_length
    from convsep_tpu.separate.stream import separate_batch, separate_batch_vmap

    preset, params = setup
    tracks = _tracks(4)
    Lb = max(bucket_length(len(t), preset) for t in tracks)
    stacked = jnp.asarray(
        np.stack([np.pad(t, (0, Lb - len(t))) for t in tracks]), jnp.float32
    )
    a = np.asarray(separate_batch(params, stacked, preset, Lb))
    b = np.asarray(separate_batch_vmap(params, stacked, preset, Lb))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # int16 output path too
    ai = np.asarray(separate_batch(params, stacked, preset, Lb, None, "int16"))
    bi = np.asarray(separate_batch_vmap(params, stacked, preset, Lb, None, "int16"))
    assert ai.dtype == np.int16
    np.testing.assert_array_equal(ai, bi)


def test_separate_batch_native_multires():
    """Native-batch path with in-program multires extra channels == vmap."""
    import dataclasses

    from tests.test_separate import tiny_preset
    from convsep_tpu.configs.presets import TransformConfig
    from convsep_tpu.separate.pipeline import bucket_length
    from convsep_tpu.separate.stream import separate_batch, separate_batch_vmap

    base = tiny_preset("multires4096")
    t = TransformConfig(fs=8000, frame_size=256, hop_size=128, multires=(64, 128))
    preset = dataclasses.replace(
        base,
        transform=t,
        model=dataclasses.replace(base.model, feat_size=t.bins, channels_in=3),
    )
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(2),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    tracks = _tracks(3)
    Lb = max(bucket_length(len(tr), preset) for tr in tracks)
    stacked = jnp.asarray(
        np.stack([np.pad(tr, (0, Lb - len(tr))) for tr in tracks]), jnp.float32
    )
    a = np.asarray(separate_batch(params, stacked, preset, Lb))
    b = np.asarray(separate_batch_vmap(params, stacked, preset, Lb))
    np.testing.assert_allclose(a, b, atol=1e-5)
