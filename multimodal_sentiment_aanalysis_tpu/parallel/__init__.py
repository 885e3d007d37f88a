"""Multi-chip parallelism (net-new: the reference is single-device).

Three flavors, each with a CPU-mesh equivalence test and a
``dryrun_multichip`` validation at flagship dims:

- **Batch DP** (:mod:`.dp`): batch rows sharded over a 1-D ``data``
  mesh; explicit ``shard_map`` + ``psum`` or GSPMD annotations. Used by
  ``cli.py phased --dp`` (sequential loop).
- **Subject sharding** (:mod:`..train.vloso` / ``vphased`` ``mesh=``):
  the LOSO experiment's natural decomposition — one independent model
  per held-out subject, subject axis sharded, ZERO collectives.
  This is the production scale-out path (``cli.py vloso --dp``).
- **Tensor parallelism** (:mod:`.tp`): Megatron-style ``PartitionSpec``
  rules on a 2-D ``(data, model)`` mesh; GSPMD inserts the collectives.

Scope note — why there is no pipeline or expert parallelism here: the
flagship model is ~5 M params (fits any single chip thousands of times
over) with a 3-subnet + fusion graph only a few "layers" deep, so a
pipeline would be all bubble and no depth, and there are no MoE experts
to shard. The parallelism that matters for this workload is the
subject axis (24 independent curricula), which the vectorized trainers
shard with zero communication; DP and TP exist for the
bigger-batch / bigger-model regimes and are validated for correctness,
not because this model needs them.
"""

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
