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
    devices=None,
    data: int | None = None,
    model: int = 1,
    dcn: int = 1,
    axis_names=("data", "model"),
) -> Mesh:
    """Build a (data, model) — or multi-slice (dcn, data, model) — mesh.

    ``dcn > 1`` adds a leading inter-slice axis (SURVEY.md §5.8 / ROADMAP
    r1 #6): the batch is sharded over ``("dcn", "data")`` jointly (see
    `batch_sharding`), so gradient `psum`s reduce hierarchically — XLA
    lowers the intra-slice part to ICI all-reduces and only the per-slice
    partials cross the slower DCN links. On real multi-slice hardware pass
    `devices` ordered slice-major (e.g. from
    ``mesh_utils.create_hybrid_device_mesh``); anywhere else any device
    list works — the axis semantics are identical.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * dcn)
    need = data * model * dcn
    if need > n:
        raise ValueError(
            f"mesh {dcn}x{data}x{model} needs {need} devices, have {n}"
            if dcn > 1
            else f"mesh {data}x{model} needs {need} devices, have {n}"
        )
    if dcn > 1:
        arr = np.asarray(devices[:need]).reshape(dcn, data, model)
        return Mesh(arr, axis_names=("dcn",) + tuple(axis_names))
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, axis_names=axis_names)


def _batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension shards over (dcn+data when multi-slice)."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else "data"


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over `data` (and `dcn` when present),
    replicate the rest."""
    return NamedSharding(mesh, P(_batch_axes(mesh), *([None] * (ndim - 1))))


def put_leading(mesh: Mesh, item):
    """device_put a pytree sharding each leaf's LEADING axis over the batch
    mesh axes.

    Unlike a single fixed-rank NamedSharding broadcast over the tree, this
    handles mixed-rank batches — e.g. from-audio training batches are
    (B, seg) / (B, S, seg) while feature batches are (B, T, F, C)."""
    axes = _batch_axes(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(axes, *([None] * (max(np.ndim(a), 1) - 1))))
        ),
        item,
    )


def put_stacked(mesh: Mesh, item):
    """device_put a (K, B, …) multi-step batch pytree: axis 0 is the scan
    (steps-per-dispatch) axis — replicated — and axis 1 is the per-step
    batch axis, sharded over the batch mesh axes."""
    axes = _batch_axes(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(None, axes, *([None] * (max(np.ndim(a), 2) - 2))))
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
