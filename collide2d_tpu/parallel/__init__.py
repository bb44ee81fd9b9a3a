"""SPMD sharding of the configuration and sample axes across TPU meshes."""

from collide2d_tpu.parallel.sharding import (
    make_mesh,
    shard_configs,
    sharded_mc_round,
    sample_sharded_probability,
)
from collide2d_tpu.parallel.distributed import (
    global_mesh,
    initialize_multihost,
    process_batch_range,
)

__all__ = [
    "make_mesh",
    "shard_configs",
    "sharded_mc_round",
    "sample_sharded_probability",
    "global_mesh",
    "initialize_multihost",
    "process_batch_range",
]
