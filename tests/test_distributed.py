"""Distributed primitives on the simulated 8-device CPU mesh.

SURVEY.md §4 'Distributed w/o cluster': numerical equality vs single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convsep_tpu.distributed import make_mesh, halo_overlap_add, batch_sharding
from convsep_tpu.dsp.istft import overlap_add
from tests.oracles import overlap_add_np


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(data=3, model=2)  # subset of the 8 devices
    assert mesh.shape == {"data": 3, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=5, model=2)


def test_halo_overlap_add_matches_single_device(rng):
    mesh = make_mesh(data=8, model=1)
    frames = rng.standard_normal((32, 256)).astype(np.float32)  # 4 frames/device
    got = np.asarray(halo_overlap_add(jnp.asarray(frames), 128, mesh, "data"))
    np.testing.assert_allclose(got, overlap_add_np(frames, 128), atol=1e-5)
    np.testing.assert_allclose(got, np.asarray(overlap_add(frames, 128)), atol=1e-5)


def test_halo_overlap_add_leading_axes(rng):
    mesh = make_mesh(data=4, model=2)
    frames = rng.standard_normal((3, 16, 64)).astype(np.float32)
    got = np.asarray(halo_overlap_add(jnp.asarray(frames), 32, mesh, "data"))
    for s in range(3):
        np.testing.assert_allclose(got[s], overlap_add_np(frames[s], 32), atol=1e-5)


def test_halo_overlap_add_sharded_input_jit(rng):
    """Under jit with the frame axis actually sharded across the mesh."""
    mesh = make_mesh(data=8, model=1)
    frames = rng.standard_normal((64, 256)).astype(np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    fr = jax.device_put(jnp.asarray(frames), NamedSharding(mesh, P("data", None)))
    f = jax.jit(lambda a: halo_overlap_add(a, 128, mesh, "data"))
    got = np.asarray(f(fr))
    np.testing.assert_allclose(got, overlap_add_np(frames, 128), atol=1e-5)


def test_halo_validation_errors(rng):
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="not divisible"):
        halo_overlap_add(jnp.zeros((30, 64)), 32, mesh, "data")
    with pytest.raises(ValueError, match="too short"):
        # 1 frame/device × hop 16 < halo 48
        halo_overlap_add(jnp.zeros((8, 64)), 16, mesh, "data")


def test_batch_sharding_spec():
    mesh = make_mesh()
    sh = batch_sharding(mesh, 4)
    x = jax.device_put(jnp.zeros((16, 3, 4, 5)), sh)
    assert x.sharding.spec == ("data", None, None, None)


# ---- multi-slice (DCN) mesh axis (SURVEY.md §5.8, ROADMAP r1 #6) ----


def test_make_mesh_dcn_shapes():
    mesh = make_mesh(dcn=2, data=2, model=2)
    assert mesh.shape == {"dcn": 2, "data": 2, "model": 2}
    mesh = make_mesh(dcn=2, model=1)  # data inferred: 8 // (1*2)
    assert mesh.shape == {"dcn": 2, "data": 4, "model": 1}
    with pytest.raises(ValueError, match="2x4x2"):
        make_mesh(dcn=2, data=4, model=2)


def test_batch_sharding_spec_dcn():
    mesh = make_mesh(dcn=2, data=4, model=1)
    sh = batch_sharding(mesh, 4)
    x = jax.device_put(jnp.zeros((16, 3, 4, 5)), sh)
    assert x.sharding.spec == (("dcn", "data"), None, None, None)
    from convsep_tpu.distributed.mesh import put_leading

    tree = put_leading(mesh, {"a": jnp.zeros((8, 2)), "b": jnp.zeros((8, 2, 3))})
    assert tree["a"].sharding.spec == (("dcn", "data"), None)
    assert tree["b"].sharding.spec == (("dcn", "data"), None, None)


def test_dcn_train_step_matches_single_device():
    """Hierarchical (dcn×data) gradient reduction == single-device step."""
    from convsep_tpu.train.loop import Trainer, create_train_state, make_train_step
    from tests.test_train import tiny_train_preset
    from convsep_tpu.data.synth import synth_feature_dir
    from convsep_tpu.data.pipeline import SegmentDataset
    import tempfile

    preset = tiny_train_preset(num_epochs=1)
    with tempfile.TemporaryDirectory() as d:
        synth_feature_dir(
            d, ("vocals", "accompaniment"), num_tracks=2, seconds=1.5,
            fs=8000, frame_size=256, hop_size=128,
        )
        ds = SegmentDataset(
            d, ("vocals", "accompaniment"),
            time_context=preset.train.time_context, overlap=preset.train.overlap,
            mult_factor_in=preset.train.mult_factor_in,
            mult_factor_out=preset.train.mult_factor_out,
        )
        batches = list(ds.batches(8, shuffle=True, seed=0))[:2]

    state_a, opt_a = create_train_state(preset, 0)
    step_a = make_train_step(preset, opt_a)
    for x, y in batches:
        state_a, m_a = step_a(state_a, jnp.asarray(x), jnp.asarray(y))
    loss_a = m_a["loss"]

    mesh = make_mesh(dcn=2, data=2, model=2)
    trainer = Trainer(preset, mesh=mesh)
    state_b = trainer.state
    sh = batch_sharding(mesh, 4)
    for x, y in batches:
        state_b, m_b = trainer.train_step(
            state_b, jax.device_put(x, sh), jax.device_put(y, sh)
        )
    loss_b = m_b["loss"]
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dcn_stream_separation_matches_unsharded():
    from convsep_tpu.separate import StreamSeparator, Separator
    from tests.test_train import tiny_train_preset
    from convsep_tpu.models.convsep import ConvSep
    from convsep_tpu.data.synth import sine_mixture

    preset = tiny_train_preset()
    cfg = preset.model
    params = ConvSep(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.time_context, cfg.feat_size, cfg.channels_in)),
    )
    tracks = [
        sine_mixture(2, 8000 + 123 * i, fs=8000, seed=i)[1] for i in range(8)
    ]
    plain = StreamSeparator(preset, params).separate_many(tracks)
    mesh = make_mesh(dcn=2, data=4, model=1)
    sharded = StreamSeparator(preset, params, mesh=mesh).separate_many(tracks)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_mesh_multi_step_dispatch_matches_single_device():
    """K-steps-per-dispatch under dp sharding == unsharded K single steps."""
    from tests.test_train import tiny_train_preset, _dataset
    from convsep_tpu.data import synth_feature_dir
    from convsep_tpu.distributed.mesh import put_stacked, replicated
    from convsep_tpu.train.loop import (
        create_train_state,
        make_train_step,
        make_train_step_multi,
    )
    import tempfile

    preset = tiny_train_preset(num_epochs=1)
    with tempfile.TemporaryDirectory() as d:
        synth_feature_dir(
            d, ("vocals", "accompaniment"), num_tracks=2, seconds=1.5,
            fs=8000, frame_size=256, hop_size=128,
        )
        ds = _dataset(d, preset)
        batches = list(ds.batches(8, shuffle=True, seed=0))[:3]

    state_a, opt_a = create_train_state(preset, 0)
    step_a = make_train_step(preset, opt_a)
    la = []
    for x, y in batches:
        state_a, m = step_a(state_a, jnp.asarray(x), jnp.asarray(y))
        la.append(float(m["loss"]))

    mesh = make_mesh(data=4, model=2)
    state_b, opt_b = create_train_state(preset, 0)
    state_b = jax.device_put(state_b, replicated(mesh))
    stepk = make_train_step_multi(preset, opt_b)
    xs = put_stacked(mesh, np.stack([x for x, _ in batches]))
    ys = put_stacked(mesh, np.stack([y for _, y in batches]))
    state_b, mk = stepk(state_b, xs, ys)
    np.testing.assert_allclose(np.asarray(mk["loss"]), la, rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
