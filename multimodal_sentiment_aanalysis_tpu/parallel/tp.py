"""Tensor-parallel (TP) sharding over a 2-D ``(data, model)`` mesh.

Net-new relative to the reference (single-device; SURVEY.md §2
"Parallelism strategies: none"), completing the parallel story next to
:mod:`.dp` (batch DP) and the subject-sharded vectorized LOSO
(:mod:`..train.vloso`): intra-model parallelism for when one model's
activations/weights should spread across chips.

Built the TPU way — **GSPMD, not manual collectives**: we annotate the
parameter pytree with Megatron-style ``PartitionSpec``\\ s and ``jit``
the unchanged train step; XLA propagates the shardings through the graph
and inserts the ``all_gather``/``reduce_scatter``/``psum`` collectives
on ICI. The step function is byte-identical to the single-device one —
sharding is layout, not semantics.

Placement rules (:func:`param_partition_specs`), per module family:

- transformer FFN: ``linear1`` column-parallel ``P(None, 'model')`` with
  its bias sharded, ``linear2`` row-parallel ``P('model', None)`` with a
  replicated bias — the classic Megatron pair: one collective per FFN,
  not two.
- attention: packed qkv ``in_proj_weight`` (torch ``(3E, E)`` layout)
  column-parallel ``P('model', None)``; ``out_proj_weight`` (``(E, E)``,
  out×in) row-parallel on its *input* dim ``P(None, 'model')``.
- BiLSTM: the gate dim (``4H``) is the wide output of both ``w_ih`` and
  ``w_hh`` (``(4H, X)`` layout) → ``P('model', None)``, biases sharded.
  The recurrence consumes the full ``h`` each step, so GSPMD places one
  all-gather per step inside the scan — correct, and the right default
  for a hidden size this small; a head-sharded LSTM would need ``2H %
  tp == 0`` anyway, which these rules require before sharding.
- conv stems: output channels ``P('model', None, None)`` (``(O, I, K)``
  layout), biases + their BN scale/bias sharded on the same channel dim.
- LayerNorm / scalars / anything whose dim does not divide ``tp``:
  replicated ``P()``.

There is deliberately no step-builder here: commit the inputs (params
via :func:`shard_by_specs`, optimizer state via a jitted ``tx.init`` on
the sharded params — GSPMD gives the moments the params' layout
automatically — batch via :func:`batch_sharding`) and ``jax.jit`` the
unchanged step function; jit reads the placements off the arguments,
and outputs inherit them, so the state stays sharded across steps with
no host round-trip.

Pallas note: the fused kernels dispatch only on the TPU backend at
whole-array shapes; under TP the per-device shards flow through the jnp
paths (the dispatch predicate in ``models/eeg.py`` and ``ops/rnn.py``
already checks shapes), so TP composes without kernel changes.

Validated by equivalence tests on the 8-device CPU mesh
(``tests/test_parallel_tp.py``): a ``(data=2, model=4)`` step equals the
single-device step to float-accumulation tolerance, and
``__graft_entry__.dryrun_multichip`` runs a TP flavor at flagship dims.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(
    dp: int,
    tp: int,
    devices=None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """``(dp, tp)`` mesh; the model axis is innermost so TP collectives
    ride the fastest ICI links (adjacent devices)."""
    if devices is None:
        devices = jax.devices()
    need = dp * tp
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    return Mesh(np.array(devices[:need]).reshape(dp, tp), axis_names)


# torch-layout (out, in) matrices that are column-parallel (wide OUTPUT
# dim is axis 0): packed qkv + LSTM gate projections
_COL_PARALLEL_T = ("in_proj_weight",)
# torch-layout matrices that are row-parallel (shard the INPUT dim,
# axis 1, the partial sums are psum'd): attention output projection
_ROW_PARALLEL_T = ("out_proj_weight",)


def _is_lstm_w(name: str) -> bool:
    return name.startswith("lstm") and "_w_" in name


def _is_lstm_b(name: str) -> bool:
    return name.startswith("lstm") and "_b_" in name


def _specs_for_module(module: Mapping[str, Any], parent: str, tp: int, model: str):
    """Specs for one flat module dict (sees kernel+bias siblings together)."""
    out: dict[str, Any] = {}
    for name, leaf in module.items():
        if isinstance(leaf, Mapping):
            out[name] = _specs_for_module(leaf, name, tp, model)
            continue
        shape = leaf.shape
        if name in _COL_PARALLEL_T and shape[0] % tp == 0:
            out[name] = P(model, None)
        elif name in _ROW_PARALLEL_T and shape[1] % tp == 0:
            out[name] = P(None, model)
        elif _is_lstm_w(name) and shape[0] % tp == 0:
            out[name] = P(model, None)
        elif _is_lstm_b(name) and shape[0] % tp == 0:
            out[name] = P(model)
        elif name == "in_proj_bias" and shape[0] % tp == 0:
            out[name] = P(model)
        elif name == "kernel" and len(shape) == 2:
            # flax (in, out) layout: linear2 closes a Megatron pair
            # (row-parallel); every other Dense is column-parallel
            if parent == "linear2" and shape[0] % tp == 0:
                out[name] = P(model, None)
            elif parent != "linear2" and shape[1] % tp == 0:
                out[name] = P(None, model)
            else:
                out[name] = P()
        elif name == "bias" and len(shape) == 1:
            # bias follows its kernel: sharded iff the kernel output dim
            # is sharded (column-parallel); row-parallel outputs are
            # replicated after the psum
            if parent == "linear2" or parent.startswith("norm"):
                out[name] = P()
            elif shape[0] % tp == 0:
                out[name] = P(model)
            else:
                out[name] = P()
        elif name.endswith("_weight") and len(shape) == 3 and shape[0] % tp == 0:
            out[name] = P(model, None, None)  # conv (O, I, K): out channels
        elif name.endswith("_bias") and shape[0] % tp == 0:
            out[name] = P(model)  # conv bias on the sharded channel dim
        elif (
            parent.startswith("bn")
            and name in ("scale", "bias")
            and shape[0] % tp == 0
        ):
            out[name] = P(model)  # stem BN params live on conv channels
        else:
            out[name] = P()
    return out


def param_partition_specs(params: Mapping[str, Any], tp: int, model: str = "model"):
    """Megatron-style ``PartitionSpec`` pytree for the flagship param tree.

    Shape-guarded: any dim that does not divide ``tp`` falls back to
    replicated, so the same rules serve the tiny test model and the
    flagship one.
    """
    if tp <= 1:
        return jax.tree.map(lambda _: P(), dict(params))
    return _specs_for_module(params, "", tp, model)


def shard_by_specs(mesh: Mesh, tree: Any, specs: Any) -> Any:
    """``device_put`` every leaf with its spec's ``NamedSharding``."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        specs,
        is_leaf=lambda x: x is None,
    )


def batch_sharding(mesh: Mesh, batch: Mapping[str, Any], data_axis: str = "data"):
    """Shard a host batch over the data axis (model axis replicated)."""
    sh = NamedSharding(mesh, P(data_axis))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
