"""Test configuration: run the suite on a simulated 8-device CPU mesh.

SURVEY.md §4 "Distributed w/o cluster": sharding tests use
``--xla_force_host_platform_device_count=8`` so mesh-sharded programs
compile and execute without TPU hardware. Must run before jax is imported.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests
# must run on the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize imports jax before any conftest runs, so the
# env var alone is read too late — update the live config as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
