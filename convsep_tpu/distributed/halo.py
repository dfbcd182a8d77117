"""halo_overlap_add: frame-axis-sharded overlap-add with ICI halo exchange.

The conv/OLA analog of context parallelism (SURVEY.md §5.7): a whole
track's iSTFT frames are sharded across the mesh's `data` axis; each device
overlap-adds its local block, then the ``win_length - hop`` seam samples
that spill into the right neighbor's region travel over ICI with ONE
`ppermute` per boundary and are added to the neighbor's head. No
gather/scatter, no full-track replication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from convsep_tpu.dsp.istft import overlap_add


def halo_overlap_add(
    frames: jnp.ndarray, hop: int, mesh: Mesh, axis: str = "data"
) -> jnp.ndarray:
    """Distributed OLA of (..., n_frames, win_length) → (..., (n_frames-1)*hop + W).

    `frames` is (to be) sharded along the frame axis (-2) over mesh axis
    `axis`; leading axes (sources, channels) are replicated. Requires
    n_frames divisible by the axis size and local blocks long enough that a
    seam only touches the immediate neighbor
    (``n_frames/n * hop >= win_length - hop``).
    """
    n = mesh.shape[axis]
    *lead, nf, w = frames.shape
    if nf % n:
        raise ValueError(f"n_frames {nf} not divisible by mesh axis {axis}={n}")
    nf_local = nf // n
    halo = w - hop
    if halo < 0:
        raise ValueError(f"hop {hop} > win_length {w}")
    if nf_local * hop < halo:
        raise ValueError(
            f"local block too short: {nf_local} frames x hop {hop} < halo {halo}"
        )

    def local(fr):
        ola = overlap_add(fr, hop)  # (..., (nf_local-1)*hop + w)
        body = ola[..., : nf_local * hop]
        tail = ola[..., nf_local * hop :]  # (..., halo)
        if n > 1:
            from_left = jax.lax.ppermute(
                tail, axis, [(i, (i + 1) % n) for i in range(n)]
            )
            idx = jax.lax.axis_index(axis)
            from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
            body = body.at[..., :halo].add(from_left)
            # only the last device's spill extends past the concatenated bodies
            tail = jax.lax.psum(
                jnp.where(idx == n - 1, tail, jnp.zeros_like(tail)), axis
            )
        return body, tail

    spec_in = P(*([None] * len(lead)), axis, None)
    body, tail = shard_map(
        local,
        mesh=mesh,
        in_specs=spec_in,
        out_specs=(P(*([None] * len(lead)), axis), P(*([None] * (len(lead) + 1)))),
    )(frames)
    body = body.reshape(*lead, nf * hop)
    # nf*hop body + (w-hop) spill == (nf-1)*hop + w total samples
    return jnp.concatenate([body, tail.reshape(*lead, halo)], axis=-1)
