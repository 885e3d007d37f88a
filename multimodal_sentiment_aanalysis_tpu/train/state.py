"""Train state + parameter partitioning.

The reference freezes/unfreezes torch submodules with ``requires_grad`` flags
and per-phase optimizers (``dataLoader/MultiTaskTrainer.py:50-177``). The JAX
equivalent is parameter partitioning over the param pytree:

- ``module_mask(params, names)`` builds a boolean pytree selecting top-level
  submodules — the analog of a ``requires_grad`` set;
- ``zero_masked_grads`` zeroes gradients outside a mask *before* global-norm
  clipping, mirroring torch where frozen params have no ``.grad`` and
  therefore don't contribute to ``clip_grad_norm_``;
- ``optax.masked`` applies the update only to the optimizer's coverage set,
  which in phase 3 of the curriculum is *smaller* than the requires-grad set
  (reference ``MultiTaskTrainer.py:147-177`` unfreezes the fusion modules but
  optimizes the valence head only) — hence the two separate masks.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """Pure pytree train state: params + BN stats + optimizer + RNG."""

    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray  # scalar int32

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def module_mask(params: Any, module_names: set[str] | list[str]) -> Any:
    """Boolean pytree: True for leaves under the named top-level modules.

    Top-level param entries that are bare arrays (e.g. ``contrastive_weight``,
    ``temperature``) are selected when their own name is listed.
    """
    names = set(module_names)

    def sub(tree, selected: bool):
        if isinstance(tree, dict):
            return {k: sub(v, selected) for k, v in tree.items()}
        return selected

    return {k: sub(v, k in names) for k, v in params.items()}


def zero_masked_grads(grads: Any, mask: Any) -> Any:
    """Zero gradients where mask is False (torch frozen-param analog)."""
    return jax.tree.map(
        lambda g, m: g if m else jnp.zeros_like(g),
        grads,
        mask,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def clip_by_global_norm(grads: Any, max_norm: float) -> tuple[Any, jnp.ndarray]:
    """torch ``clip_grad_norm_`` semantics: scale all grads by
    ``max_norm / max(norm, max_norm)``. Returns (clipped, global_norm)."""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm


def make_masked_adamw(
    update_mask: Any,
    weight_decay: float,
) -> optax.GradientTransformation:
    """AdamW whose update covers only ``update_mask``; LR injected at
    step time (changing it never recompiles, resetting moments is a cheap
    re-init of ``opt_state``)."""
    return optax.masked(
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=1e-4, weight_decay=weight_decay
        ),
        update_mask,
    )


class _AdamLowpState(NamedTuple):
    """State for :func:`scale_by_adam_lowp` — an optax-style NamedTuple
    (registered pytree) holding the step count + low-precision moments."""

    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with the PERSISTENT moments stored in
    ``moment_dtype`` (bfloat16 halves the optimizer state's HBM footprint
    and traffic; the per-step moment math still runs in float32).

    Rationale: the AdamW update is pure HBM bandwidth at this model's
    shapes — the fp32 step budget (CLAUDE.md) has it at 4.5 ms for
    read{p,g,m,v} + write{p,m,v} = 3.8 GB/update, which is v5e roofline.
    Only the m/v state can shrink without touching the fp32 master params
    or the gradient numerics, so this is the one remaining optimizer
    lever. bfloat16 keeps float32's exponent range (no over/underflow on
    v = E[g^2]); the cost is ~8-bit mantissa noise on the update scale,
    acceptable for the bf16 compute config and kept OUT of the fp32
    parity config (reference twin tests pin that one against torch).

    Hardware A/B (v5e, fused 20-epoch vloso, ``scripts/ab_moment_dtype.py``
    2026-08-17): bf16 compute 39.8k -> 40.2k samples/s (+1.2%, sanity
    accuracy identical) — wired into the bench bf16 config. fp32 compute
    is a measured LOSS (33.0k -> 32.2k: the extra converts cost more
    than the saved traffic there), so the fp32 config keeps optax.adamw.
    """

    md = jnp.dtype(moment_dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=md) if jnp.issubdtype(
            jnp.asarray(p).dtype, jnp.floating) else jnp.zeros_like(p)
        return _AdamLowpState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)

        def m32(g, m):
            return b1 * m.astype(jnp.float32) + \
                (1.0 - b1) * g.astype(jnp.float32)

        def v32(g, v):
            return b2 * v.astype(jnp.float32) + \
                (1.0 - b2) * jnp.square(g.astype(jnp.float32))

        # three maps; XLA CSEs the recomputed fp32 moments, and the update
        # is formed from the PRE-cast fp32 values (the cast loses mantissa
        # only on what is carried to the next step)
        upd = jax.tree.map(
            lambda g, m, v: ((m32(g, m) / b1c) /
                             (jnp.sqrt(v32(g, v) / b2c) + eps)
                             ).astype(g.dtype),
            updates, state.mu, state.nu)
        mu = jax.tree.map(lambda g, m: m32(g, m).astype(m.dtype),
                          updates, state.mu)
        nu = jax.tree.map(lambda g, v: v32(g, v).astype(v.dtype),
                          updates, state.nu)
        return upd, _AdamLowpState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lowp(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    moment_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """AdamW with low-precision moment storage (see
    :func:`scale_by_adam_lowp`). Same transformation chain as
    ``optax.adamw``: adam scaling, then decoupled weight decay, then
    ``-lr``; with ``moment_dtype=float32`` the update is bit-identical to
    ``optax.adamw`` (pinned in ``tests/test_train.py``)."""
    return optax.chain(
        scale_by_adam_lowp(b1=b1, b2=b2, eps=eps, moment_dtype=moment_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate),
    )


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating leaves to ``dtype`` (mixed-precision compute cast).

    Used for bf16 training: master params stay float32 in the optimizer;
    the loss function casts them (and the batch) to bfloat16 for the
    forward/backward — the cast is differentiable, so gradients come back
    float32 automatically.
    """
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )


def strong_typed(tree: Any) -> Any:
    """Canonicalize every leaf to a strong-typed device array.

    ``optax`` init states (notably ``inject_hyperparams``) hold Python
    scalars as weak-typed arrays; after one compiled update they come back
    strong-typed, which changes the jit signature and silently recompiles
    the whole epoch program on its *second* call (tens of seconds on TPU).
    Canonicalizing right after ``tx.init`` keeps a single signature.
    """

    def fix(x):
        a = jnp.asarray(x)
        # astype always returns weak_type=False, even for a no-op cast
        return a.astype(a.dtype)

    return jax.tree.map(fix, tree)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Functionally set the injected learning rate inside a masked/chained
    optimizer state."""

    def walk(state):
        if isinstance(state, optax.MaskedState):
            return optax.MaskedState(inner_state=walk(state.inner_state))
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            new_hp = dict(state.hyperparams)
            new_hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
            return state._replace(hyperparams=new_hp)
        return state

    return walk(opt_state)
