"""SimCLR-style contrastive pretraining + frozen-encoder finetuning.

TPU-native rebuild of reference ``train.py:45-138``:

- :func:`contrastive_pretrain` — Adam(1e-3) over encoder + projection head;
  each step encodes two pair views and applies the two-view supervised
  NT-Xent (reference ``:45-80``, loss ``:16-40``). Pairs come from the
  balanced pair-index array (:mod:`..data.pairs`); views are gathered from
  the device-resident dataset with ``jnp.take`` inside jit — the reference
  materializes six full tensors per pair dataset instead.
- :func:`finetune` — encoder frozen, Adam(1e-4) on the classifier only,
  joint CE over both heads (reference ``:83-138``). Features use the
  encoder's eval mode (deterministic, running BN stats); the reference
  leaves the encoder in train mode here, which mutates BN running stats
  during "frozen" finetuning — a quirk we do not reproduce (documented
  deviation).

Both engines run each epoch as one jitted ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import DeviceDataset, epoch_batch_indices
from .state import strong_typed
from ..ops.losses import masked_accuracy, masked_cross_entropy, ntxent_supervised_two_view


def contrastive_pretrain(
    encoder,
    projector,
    data: DeviceDataset,
    pair_indices: np.ndarray,
    pair_labels: np.ndarray,
    num_epochs: int = 50,
    lr: float = 1e-3,
    batch_size: int = 64,
    temperature: float = 0.1,
    seed: int = 42,
    verbose: bool = True,
    init_variables: tuple[dict, dict] | None = None,
) -> tuple[dict, dict, list[float]]:
    """Pretrain encoder+projector on balanced pairs. Returns
    (encoder_vars, projector_vars, per-epoch losses).

    ``init_variables``: optional ``(encoder_vars, projector_vars)`` to
    start from instead of a fresh init — the migration bridge for
    reference users' torch weights
    (``models.torch_import.simclr_*_variables_from_torch_state_dict``)
    and for resuming pretraining; exercised against the ACTUAL reference
    trainer in ``tests/test_reference_oracle.py``."""
    host_rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    init_key, dropout_key = jax.random.split(key)

    sample = {k: v[:2] for k, v in data.arrays.items()}
    if init_variables is not None:
        enc_vars, proj_vars = (
            jax.tree.map(jnp.asarray, dict(v)) for v in init_variables
        )
    else:
        enc_vars = encoder.init(
            {"params": init_key, "dropout": dropout_key},
            sample["eeg"], sample["eye"], sample["pps"],
        )
        feat = encoder.apply(
            enc_vars, sample["eeg"], sample["eye"], sample["pps"]
        )
        proj_vars = projector.init(jax.random.key(seed + 1), feat)

    params = strong_typed(
        {"enc": enc_vars["params"], "proj": proj_vars["params"]}
    )  # weak-typed init scalars would retrace the epoch on its 2nd call
    batch_stats = {
        "enc": enc_vars.get("batch_stats", {}),
        "proj": proj_vars.get("batch_stats", {}),
    }
    tx = optax.adam(lr)
    opt_state = strong_typed(tx.init(params))

    pair_idx_dev = jnp.asarray(pair_indices)
    pair_lab_dev = jnp.asarray(pair_labels)
    arrays = data.arrays

    def encode(params, batch_stats, idx, dk):
        batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
        k1, k2 = jax.random.split(dk)
        feat, enc_mut = encoder.apply(
            {"params": params["enc"], "batch_stats": batch_stats["enc"]},
            batch["eeg"], batch["eye"], batch["pps"],
            train=True, mutable=["batch_stats"], rngs={"dropout": k1},
        )
        z, proj_mut = projector.apply(
            {"params": params["proj"], "batch_stats": batch_stats["proj"]},
            feat, train=True, mutable=["batch_stats"], rngs={"dropout": k2},
        )
        new_bs = {"enc": enc_mut["batch_stats"], "proj": proj_mut["batch_stats"]}
        return z, new_bs

    def loss_fn(params, batch_stats, pidx, plab, dk):
        ka, kb = jax.random.split(dk)
        z1, bs1 = encode(params, batch_stats, pidx[:, 0], ka)
        z2, bs2 = encode(params, bs1, pidx[:, 1], kb)
        loss = ntxent_supervised_two_view(z1, z2, plab, temperature)
        return loss, bs2

    @jax.jit
    def train_epoch(params, batch_stats, opt_state, key, plan_idx):
        def step(carry, bidx):
            params, batch_stats, opt_state, key = carry
            key, dk = jax.random.split(key)
            pidx = jnp.take(pair_idx_dev, bidx, axis=0)
            plab = jnp.take(pair_lab_dev, bidx, axis=0)
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, pidx, plab, dk
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, key), loss

        (params, batch_stats, opt_state, key), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state, key), plan_idx
        )
        return params, batch_stats, opt_state, key, losses.mean()

    epoch_losses = []
    for epoch in range(num_epochs):
        plan_idx, _ = epoch_batch_indices(len(pair_indices), batch_size, host_rng)
        params, batch_stats, opt_state, dropout_key, avg = train_epoch(
            params, batch_stats, opt_state, dropout_key, jnp.asarray(plan_idx)
        )
        epoch_losses.append(float(avg))
        if verbose:
            print(f"[Contrastive Epoch {epoch + 1}] loss {epoch_losses[-1]:.4f}")

    enc_out = {"params": params["enc"], "batch_stats": batch_stats["enc"]}
    proj_out = {"params": params["proj"], "batch_stats": batch_stats["proj"]}
    return enc_out, proj_out, epoch_losses


def finetune(
    encoder,
    encoder_vars: dict,
    classifier,
    train_data: DeviceDataset,
    test_data: DeviceDataset,
    num_epochs: int = 30,
    lr: float = 1e-4,
    batch_size: int = 64,
    seed: int = 42,
    verbose: bool = True,
    init_classifier_vars: dict | None = None,
) -> tuple[dict, dict[str, float]]:
    """Train the classifier on frozen encoder features; returns
    (classifier_vars, final test metrics — incl. a ``loss_history``
    list of per-epoch train losses).

    ``init_classifier_vars``: optional classifier variables to start
    from (reference torch-weight migration / resume; see
    :func:`contrastive_pretrain`)."""
    host_rng = np.random.default_rng(seed)
    key = jax.random.key(seed)

    sample = {k: v[:2] for k, v in train_data.arrays.items()}
    if init_classifier_vars is not None:
        clf_vars = jax.tree.map(jnp.asarray, dict(init_classifier_vars))
    else:
        feat = encoder.apply(
            encoder_vars, sample["eeg"], sample["eye"], sample["pps"]
        )
        clf_vars = classifier.init(key, feat)
    params = strong_typed(clf_vars["params"])
    tx = optax.adam(lr)
    opt_state = strong_typed(tx.init(params))

    def features(arrays, idx):
        batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
        feat = encoder.apply(
            encoder_vars, batch["eeg"], batch["eye"], batch["pps"]
        )
        return jax.lax.stop_gradient(feat), batch

    def loss_fn(params, feat, batch, dk):
        out_a, out_v = classifier.apply(
            {"params": params}, feat, train=True, rngs={"dropout": dk}
        )
        loss = masked_cross_entropy(out_a, batch["arousal"], batch["mask"]) + \
            masked_cross_entropy(out_v, batch["valence"], batch["mask"])
        return loss

    @jax.jit
    def train_epoch(params, opt_state, key, arrays, plan_idx, plan_mask):
        def step(carry, xs):
            params, opt_state, key = carry
            idx, bmask = xs
            key, dk = jax.random.split(key)
            feat, batch = features(arrays, idx)
            batch["mask"] = bmask
            loss, grads = jax.value_and_grad(loss_fn)(params, feat, batch, dk)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            step, (params, opt_state, key), (plan_idx, plan_mask)
        )
        return params, opt_state, key, losses.mean()

    @jax.jit
    def eval_fn(params, arrays, plan_idx, plan_mask):
        def step(_, xs):
            idx, bmask = xs
            feat, batch = features(arrays, idx)
            out_a, out_v = classifier.apply({"params": params}, feat)
            n = bmask.sum()
            return None, {
                "a_acc": masked_accuracy(out_a, batch["arousal"], bmask) * n,
                "v_acc": masked_accuracy(out_v, batch["valence"], bmask) * n,
                "n": n,
            }

        _, ms = jax.lax.scan(step, None, (plan_idx, plan_mask))
        return jax.tree.map(jnp.sum, ms)

    dropout_key = jax.random.key(seed + 2)
    metrics: dict[str, Any] = {}
    loss_history: list[float] = []
    for epoch in range(num_epochs):
        plan_idx, plan_mask = train_data.epoch_plan(batch_size, host_rng)
        params, opt_state, dropout_key, avg = train_epoch(
            params, opt_state, dropout_key, train_data.arrays, plan_idx, plan_mask
        )
        loss_history.append(float(avg))
        tp_idx, tp_mask = test_data.epoch_plan(batch_size, shuffle=False)
        totals = jax.device_get(
            eval_fn(params, test_data.arrays, tp_idx, tp_mask)
        )
        n = max(float(totals["n"]), 1.0)
        metrics = {
            "a_acc": float(totals["a_acc"]) / n,
            "v_acc": float(totals["v_acc"]) / n,
        }
        if verbose:
            print(
                f"[Finetune Epoch {epoch + 1}] loss {float(avg):.4f} "
                f"test arousal {metrics['a_acc']:.4f} valence {metrics['v_acc']:.4f}"
            )
    metrics["loss_history"] = loss_history
    return {"params": params}, metrics
