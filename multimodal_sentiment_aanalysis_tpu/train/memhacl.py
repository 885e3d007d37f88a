"""ME-MHACL training engines: NT-Xent pretrain + joint finetune.

TPU-native rebuild of reference ``ME-MHACL/train.py:69-134``:

- pretrain: Adam(1e-3) over encoder+projector; per batch, TWO Gaussian-noise
  views (``data_loader.py:40-48``) -> encoder -> projector -> index-matched
  NT-Xent at temperature 0.5 (``train.py:47-66``)
- finetune: Adam(1e-4) over encoder+classifier JOINTLY (``train.py:44`` —
  unlike the main SimCLR stack, the encoder is NOT frozen); combined CE of
  the binary arousal and valence heads; per-epoch validation accuracies

TPU design: each epoch is one jitted ``lax.scan`` over the device-resident
dataset; the two augmented views are drawn *inside* the step from the scan's
threaded PRNG key (the reference pays host-side per-sample augmentation +
H2D per batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.augment import gaussian_views
from ..data.pipeline import DeviceDataset
from ..ops.losses import masked_accuracy, masked_cross_entropy, ntxent_indexed
from .state import strong_typed


def memhacl_pretrain(
    encoder,
    projector,
    data: DeviceDataset,
    num_epochs: int = 50,
    lr: float = 1e-3,
    batch_size: int = 32,
    temperature: float = 0.5,
    noise: tuple[float, float, float] = (0.01, 0.05, 0.05),
    seed: int = 0,
    verbose: bool = True,
    init_variables: tuple[dict, dict] | None = None,
) -> tuple[dict, dict, list[float]]:
    """Contrastive pretrain; returns (encoder_vars, projector_vars, losses).

    ``init_variables``: optional ``(encoder_vars, projector_vars)`` to start
    from — the torch-weight migration bridge
    (``models.torch_import.memhacl_encoder_variables_from_torch_state_dict``);
    exercised against the real reference ``ME-MHACL/train.py`` in
    ``tests/test_reference_oracle.py``."""
    host_rng = np.random.default_rng(seed)
    init_key = jax.random.key(seed)

    sample = {k: v[:2] for k, v in data.arrays.items()}
    if init_variables is not None:
        enc_vars, proj_vars = (
            jax.tree.map(jnp.asarray, dict(v)) for v in init_variables
        )
    else:
        enc_vars = encoder.init(
            init_key, sample["eeg"], sample["eye"], sample["pps"]
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
    arrays = data.arrays

    def encode(params, bs, eeg, eye, pps, key):
        h, mut = encoder.apply(
            {"params": params["enc"], "batch_stats": bs["enc"]},
            eeg, eye, pps, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        z, mut_p = projector.apply(
            {"params": params["proj"], "batch_stats": bs["proj"]},
            h, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return z, {"enc": mut["batch_stats"], "proj": mut_p["batch_stats"]}

    def loss_fn(params, bs, batch, key):
        k1, k2, kd = jax.random.split(key, 3)
        e1, y1, p1 = gaussian_views(k1, batch["eeg"], batch["eye"], batch["pps"],
                                    *noise)
        e2, y2, p2 = gaussian_views(k2, batch["eeg"], batch["eye"], batch["pps"],
                                    *noise)
        z1, bs1 = encode(params, bs, e1, y1, p1, kd)
        z2, bs2 = encode(params, bs1, e2, y2, p2, kd)
        return ntxent_indexed(z1, z2, temperature), bs2

    @jax.jit
    def train_epoch(params, bs, opt_state, key, plan_idx):
        def step(carry, idx):
            params, bs, opt_state, key = carry
            key, dk = jax.random.split(key)
            batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs, batch, dk
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, key), loss

        (params, bs, opt_state, key), losses = jax.lax.scan(
            step, (params, bs, opt_state, key), plan_idx
        )
        return params, bs, opt_state, key, losses.mean()

    key = jax.random.key(seed + 2)
    losses: list[float] = []
    for epoch in range(num_epochs):
        plan_idx, _ = data.epoch_plan(batch_size, host_rng)
        params, batch_stats, opt_state, key, avg = train_epoch(
            params, batch_stats, opt_state, key, plan_idx
        )
        losses.append(float(avg))
        if verbose:
            print(
                f"Epoch [{epoch + 1}/{num_epochs}], "
                f"Contrastive Loss: {losses[-1]:.4f}"
            )
    return (
        {"params": params["enc"], "batch_stats": batch_stats["enc"]},
        {"params": params["proj"], "batch_stats": batch_stats["proj"]},
        losses,
    )


def memhacl_finetune(
    encoder,
    encoder_vars: dict,
    classifier,
    train_data: DeviceDataset,
    val_data: DeviceDataset,
    num_epochs: int = 30,
    lr: float = 1e-4,
    batch_size: int = 32,
    seed: int = 0,
    verbose: bool = True,
    init_classifier_vars: dict | None = None,
) -> tuple[dict, dict, dict[str, float]]:
    """Joint encoder+classifier finetune; returns
    (encoder_vars, classifier_vars, final val metrics — incl. a
    ``loss_history`` list of per-epoch train losses).

    ``init_classifier_vars``: optional classifier variables to start from
    (torch-weight migration; see :func:`memhacl_pretrain`)."""
    host_rng = np.random.default_rng(seed)

    if init_classifier_vars is not None:
        clf_vars = jax.tree.map(jnp.asarray, dict(init_classifier_vars))
    else:
        sample = {k: v[:2] for k, v in train_data.arrays.items()}
        feat = encoder.apply(
            encoder_vars, sample["eeg"], sample["eye"], sample["pps"]
        )
        clf_vars = classifier.init(jax.random.key(seed + 3), feat)

    params = strong_typed(
        {"enc": encoder_vars["params"], "clf": clf_vars["params"]}
    )
    batch_stats = {"enc": encoder_vars.get("batch_stats", {})}
    tx = optax.adam(lr)
    opt_state = strong_typed(tx.init(params))

    def forward(params, bs, batch, key, train):
        if train:
            h, mut = encoder.apply(
                {"params": params["enc"], "batch_stats": bs["enc"]},
                batch["eeg"], batch["eye"], batch["pps"],
                train=True, mutable=["batch_stats"], rngs={"dropout": key},
            )
            out_a, out_v = classifier.apply(
                {"params": params["clf"]}, h, train=True, rngs={"dropout": key}
            )
            return out_a, out_v, {"enc": mut["batch_stats"]}
        h = encoder.apply(
            {"params": params["enc"], "batch_stats": bs["enc"]},
            batch["eeg"], batch["eye"], batch["pps"],
        )
        out_a, out_v = classifier.apply({"params": params["clf"]}, h)
        return out_a, out_v, bs

    def loss_fn(params, bs, batch, key):
        out_a, out_v, new_bs = forward(params, bs, batch, key, True)
        loss = masked_cross_entropy(out_a, batch["arousal"], batch["mask"]) + \
            masked_cross_entropy(out_v, batch["valence"], batch["mask"])
        return loss, new_bs

    @jax.jit
    def train_epoch(params, bs, opt_state, key, arrays, plan_idx, plan_mask):
        def step(carry, xs):
            params, bs, opt_state, key = carry
            idx, bmask = xs
            key, dk = jax.random.split(key)
            batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
            batch["mask"] = bmask
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs, batch, dk
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, key), loss

        (params, bs, opt_state, key), losses = jax.lax.scan(
            step, (params, bs, opt_state, key), (plan_idx, plan_mask)
        )
        return params, bs, opt_state, key, losses.mean()

    @jax.jit
    def eval_fn(params, bs, arrays, plan_idx, plan_mask):
        def step(_, xs):
            idx, bmask = xs
            batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
            out_a, out_v, _ = forward(params, bs, batch, None, False)
            n = bmask.sum()
            return None, {
                "a_acc": masked_accuracy(out_a, batch["arousal"], bmask) * n,
                "v_acc": masked_accuracy(out_v, batch["valence"], bmask) * n,
                "n": n,
            }

        _, ms = jax.lax.scan(step, None, (plan_idx, plan_mask))
        return jax.tree.map(jnp.sum, ms)

    key = jax.random.key(seed + 4)
    metrics: dict = {}
    loss_history: list[float] = []
    for epoch in range(num_epochs):
        plan_idx, plan_mask = train_data.epoch_plan(batch_size, host_rng)
        params, batch_stats, opt_state, key, avg = train_epoch(
            params, batch_stats, opt_state, key,
            train_data.arrays, plan_idx, plan_mask,
        )
        loss_history.append(float(avg))
        vp_idx, vp_mask = val_data.epoch_plan(batch_size, shuffle=False)
        totals = jax.device_get(
            eval_fn(params, batch_stats, val_data.arrays, vp_idx, vp_mask)
        )
        n = max(float(totals["n"]), 1.0)
        metrics = {
            "a_acc": float(totals["a_acc"]) / n,
            "v_acc": float(totals["v_acc"]) / n,
        }
        if verbose:
            print(
                f"Epoch [{epoch + 1}/{num_epochs}], Train Loss: "
                f"{float(avg):.4f}, Val Acc Arousal: {metrics['a_acc']:.1%}, "
                f"Val Acc Valence: {metrics['v_acc']:.1%}"
            )
    metrics["loss_history"] = loss_history
    return (
        {"params": params["enc"], "batch_stats": batch_stats["enc"]},
        {"params": params["clf"]},
        metrics,
    )
