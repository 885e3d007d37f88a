from .mesh import make_mesh, shard_batch, replicate
from .dp import make_dp_train_step, make_dp_eval_step, pad_batch_to_devices

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_dp_train_step",
    "make_dp_eval_step",
    "pad_batch_to_devices",
]
