"""SPMD sharding of the configuration and sample axes across TPU meshes."""

from collide2d_tpu.parallel.sharding import (
    make_mesh,
    shard_configs,
    sharded_mc_round,
    sample_sharded_probability,
)

__all__ = [
    "make_mesh",
    "shard_configs",
    "sharded_mc_round",
    "sample_sharded_probability",
]
