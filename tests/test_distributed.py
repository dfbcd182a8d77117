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
