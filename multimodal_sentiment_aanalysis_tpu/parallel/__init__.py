from .mesh import make_mesh, shard_batch, replicate
from .dp import make_dp_train_step, make_dp_eval_step, pad_batch_to_devices
from .tp import (
    batch_sharding,
    make_mesh_2d,
    param_partition_specs,
    shard_by_specs,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_dp_train_step",
    "make_dp_eval_step",
    "pad_batch_to_devices",
    "make_mesh_2d",
    "param_partition_specs",
    "shard_by_specs",
    "batch_sharding",
]
