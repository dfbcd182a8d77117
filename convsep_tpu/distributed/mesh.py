"""Device mesh helpers.

The reference is strictly single-process/single-GPU (SURVEY.md §5.8 [H]);
scaling here is first-class: a `jax.sharding.Mesh` with a `data` axis (and
an optional `model` axis for sharding the dense bottleneck later), XLA
collectives over ICI. No custom transport — `psum`/`ppermute` compile to
ICI ops.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices=None, data: int | None = None, model: int = 1, axis_names=("data", "model")
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=axis_names)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def put_leading(mesh: Mesh, item):
    """device_put a pytree sharding each leaf's LEADING axis over `data`.

    Unlike a single fixed-rank NamedSharding broadcast over the tree, this
    handles mixed-rank batches — e.g. from-audio training batches are
    (B, seg) / (B, S, seg) while feature batches are (B, T, F, C)."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P("data", *([None] * (max(np.ndim(a), 1) - 1))))
        ),
        item,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, axis: str = "model"):
    """Tensor-parallel sharding rules for ConvSep params.

    The FLOP-dominant weights are the bottleneck denses; shard `fc`'s input
    axis and `fc_expand`'s output axis over the `model` mesh axis (row/col
    parallel pair — the activation stays small either side). Everything
    else (conv kernels, biases) is replicated.
    """

    def rule(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", None)) for k in path)
        if "fc" in keys and keys[-1] == "kernel":
            return NamedSharding(mesh, P(axis, None))
        if "fc_expand" in keys and keys[-1] == "kernel":
            return NamedSharding(mesh, P(None, axis))
        if "fc_expand" in keys and keys[-1] == "bias":
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
