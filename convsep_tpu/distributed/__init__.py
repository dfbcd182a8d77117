"""Distributed layer: mesh construction + halo overlap-add primitive."""

from convsep_tpu.distributed.mesh import make_mesh, batch_sharding, replicated
from convsep_tpu.distributed.halo import halo_overlap_add

__all__ = ["make_mesh", "batch_sharding", "replicated", "halo_overlap_add"]
