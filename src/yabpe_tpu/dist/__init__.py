"""Distributed layer: device meshes, shard_map wrappers, psum reductions."""

from yabpe_tpu.dist.mesh import make_2d_mesh, make_data_mesh, multihost_initialize
from yabpe_tpu.dist.sharded import run_sharded_merge_loop, state_partition_specs

__all__ = [
    "make_data_mesh",
    "make_2d_mesh",
    "multihost_initialize",
    "run_sharded_merge_loop",
    "state_partition_specs",
]
