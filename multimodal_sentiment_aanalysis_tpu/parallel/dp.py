"""Data-parallel training step over a device mesh.

Net-new relative to the reference (which is single-device; SURVEY.md §2
"Parallelism strategies in the reference: none implemented"). Two idiomatic
TPU flavors are provided:

1. **Explicit SPMD** via ``shard_map``: the batch is sharded over the
   ``data`` axis, each device computes grads on its shard, and a
   ``jax.lax.pmean`` all-reduce over ICI averages grads and metrics; the
   optimizer update runs replicated so params never leave HBM. This is the
   path used by ``__graft_entry__.dryrun_multichip``.

2. **GSPMD** via sharding annotations: jit with ``in_shardings`` (batch
   ``P('data')``, state ``P()``) and let XLA insert the collectives. Same
   program, less code — exposed through :func:`gspmd_jit_step`.

BatchNorm note: per-device batch statistics are pmean-reduced before the
running-stat update, so DP training matches the single-device numerics
(global-batch statistics) — stronger than torch DataParallel, which keeps
per-replica stats.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..train.state import clip_by_global_norm, zero_masked_grads


def pad_batch_to_devices(batch: dict, mask: jnp.ndarray, n_devices: int):
    """Pad a (B, ...) batch so B divides n_devices; padding is masked out."""
    b = mask.shape[0]
    rem = (-b) % n_devices
    if rem == 0:
        return batch, mask
    pad = lambda x: jnp.concatenate([x, jnp.repeat(x[:1], rem, axis=0)], axis=0)
    batch = {k: pad(v) for k, v in batch.items()}
    mask = jnp.concatenate([mask, jnp.zeros((rem,), mask.dtype)])
    return batch, mask


def make_dp_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "data",
    clip_norm: float | None = 1.0,
    grad_mask: Any | None = None,
    update_mask: Any | None = None,
) -> Callable:
    """Build a jitted DP train step.

    ``loss_fn(params, batch_stats, batch, key) -> (loss, (new_batch_stats,
    metrics))`` where ``batch['mask']`` flags valid rows and every metric in
    ``metrics`` is summed over valid rows (so cross-device reduction is a
    plain psum). Returns ``step(params, batch_stats, opt_state, key, batch)
    -> (params, batch_stats, opt_state, metrics)``.
    """

    def device_step(params, batch_stats, opt_state, key, batch):
        # per-device shard computes local grads; weight by local valid count
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch, key)

        # weighted grad average: each shard's loss is a mean over its valid
        # rows; weight by valid fraction so the result equals the global mean
        n_local = batch["mask"].sum()
        n_global = jax.lax.psum(n_local, axis_name)
        w = jnp.where(n_global > 0, n_local / jnp.maximum(n_global, 1.0), 0.0)
        grads = jax.tree.map(lambda g: jax.lax.psum(g * w, axis_name), grads)

        # batch stats: pmean across devices -> global-batch statistics
        new_bs = jax.tree.map(lambda s: jax.lax.pmean(s, axis_name), new_bs)
        metrics = jax.tree.map(lambda m: jax.lax.psum(m, axis_name), metrics)

        if grad_mask is not None:
            grads = zero_masked_grads(grads, grad_mask)
        if clip_norm is not None:
            grads, _ = clip_by_global_norm(grads, clip_norm)
        if update_mask is not None:
            grads = zero_masked_grads(grads, update_mask)
        updates, new_opt = tx.update(grads, opt_state, params)
        if update_mask is not None:
            updates = zero_masked_grads(updates, update_mask)
        params = optax.apply_updates(params, updates)
        return params, new_bs, new_opt, metrics

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis_name)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_eval_step(
    metrics_fn: Callable,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """Build a jitted DP eval step.

    ``metrics_fn(params, batch_stats, batch) -> metrics`` where every metric
    is summed over the shard's valid rows; shards psum so the caller divides
    by the global count once. Returns ``eval_step(params, batch_stats,
    batch) -> metrics``.
    """

    def device_step(params, batch_stats, batch):
        metrics = metrics_fn(params, batch_stats, batch)
        return jax.tree.map(lambda m: jax.lax.psum(m, axis_name), metrics)

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def gspmd_jit_step(step_fn: Callable, mesh: Mesh, axis_name: str = "data"):
    """GSPMD flavor: jit with sharding annotations; XLA inserts collectives.

    ``step_fn(state_tree, batch) -> (state_tree, metrics)`` with batch
    leaves sharded on their leading axis and state replicated.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    return jax.jit(step_fn, in_shardings=(repl, shard), out_shardings=(repl, repl))
