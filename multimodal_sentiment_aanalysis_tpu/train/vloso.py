"""Vectorized leave-one-subject-out training: all LOSO models in one program.

The reference's primary experiment is a Python loop training one model per
held-out subject — 24 sequential runs (``main.py:62-68``, ``train.py:149``).
Each model is independent and every LOSO split has exactly the same shapes
(460 train / 20 test rows), so on TPU the natural formulation is a ``vmap``
over the subject axis: ONE jitted program trains all 24 models
simultaneously against the shared device-resident dataset, turning the
underutilized batch-64 step into a 24-model-wide step that actually feeds
the MXU.

Semantics per model are identical to :class:`.engine.Trainer`'s objective
(CE both heads + learnable-weighted contrastive sum, AdamW, global-norm
clip, NaN skip-batch): each model has its own parameters, optimizer state,
dropout stream, and per-subject shuffled index plan drawn from its own
LOSO train rows — BatchNorm batch statistics therefore see only that
model's rows, exactly as in the sequential loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import DeviceDataset
from ..data.splits import loso_split
from ..ops.losses import masked_accuracy, masked_cross_entropy
from .state import cast_floating, clip_by_global_norm, strong_typed


class VectorizedLOSOTrainer:
    """Trains one model per held-out subject, all at once."""

    def __init__(
        self,
        model,
        data: DeviceDataset,
        n_subjects: int,
        ex_nums: int = 20,
        lr: float = 1e-4,
        weight_decay: float = 0.01,
        batch_size: int = 64,
        clip_norm: float = 1.0,
        seed: int = 42,
        compute_dtype: str | None = None,
    ):
        # compute_dtype='bfloat16' runs forward/backward in bf16 at native
        # MXU rate while AdamW keeps float32 master params; losses and
        # BatchNorm running stats are carried in float32 regardless.
        self.model = model
        self.data = data
        self.n_subjects = n_subjects
        self.ex_nums = ex_nums
        self.batch_size = batch_size
        self.clip_norm = clip_norm
        self.compute_dtype = compute_dtype
        self.host_rng = np.random.default_rng(seed)

        # per-subject LOSO index tables; every split has identical shape
        self.train_idx = np.stack(
            [loso_split(n_subjects, ex_nums, s)[0] for s in range(n_subjects)]
        )  # (S, n_train)
        self.test_idx = np.stack(
            [loso_split(n_subjects, ex_nums, s)[1] for s in range(n_subjects)]
        )  # (S, ex_nums)

        sample = {k: v[:2] for k, v in data.arrays.items()}

        def init_one(key):
            variables = model.init(
                {"params": key, "dropout": key},
                sample["eeg"], sample["eye"], sample["pps"],
            )
            return variables["params"], variables.get("batch_stats", {})

        keys = jax.random.split(jax.random.key(seed), n_subjects)
        self.params, self.batch_stats = jax.vmap(init_one)(keys)
        self.params = {
            "model": self.params,
            "trainer": {
                "contrastive_weight": jnp.ones((n_subjects, 1), jnp.float32)
            },
        }

        self.tx = optax.adamw(lr, weight_decay=weight_decay)
        self.opt_state = strong_typed(jax.vmap(self.tx.init)(self.params))
        self.dropout_keys = jax.random.split(
            jax.random.key(seed + 1), n_subjects
        )

        self._train_epoch_fn = self._build_train_epoch()
        self._eval_fn = self._build_eval()

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch_stats, batch, key):
        if self.compute_dtype is not None:
            dt = jnp.dtype(self.compute_dtype)
            params = {
                "model": cast_floating(params["model"], dt),
                "trainer": params["trainer"],
            }
            batch = dict(batch)
            for k in ("eeg", "eye", "pps"):
                batch[k] = batch[k].astype(dt)
        outs, mutated = self.model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            batch["eeg"], batch["eye"], batch["pps"],
            labels=(batch["arousal"], batch["valence"], batch["mask"]),
            train=True, mutable=["batch_stats"], rngs={"dropout": key},
        )
        arousal, valence, c1, c2, c3 = outs
        arousal = jnp.nan_to_num(arousal).astype(jnp.float32)
        valence = jnp.nan_to_num(valence).astype(jnp.float32)
        c1, c2, c3 = (x.astype(jnp.float32) for x in (c1, c2, c3))
        mask = batch["mask"]
        ce = masked_cross_entropy(arousal, batch["arousal"], mask) + \
            masked_cross_entropy(valence, batch["valence"], mask)
        loss = ce + params["trainer"]["contrastive_weight"][0] * (c1 + c2 + c3)
        new_bs = mutated["batch_stats"]
        if self.compute_dtype is not None:
            new_bs = cast_floating(new_bs, jnp.float32)
        n = mask.sum()
        metrics = {
            "loss": loss * n,
            "a_acc": masked_accuracy(arousal, batch["arousal"], mask) * n,
            "v_acc": masked_accuracy(valence, batch["valence"], mask) * n,
            "n": n,
        }
        return loss, (new_bs, metrics)

    def _build_train_epoch(self) -> Callable:
        tx, clip_norm = self.tx, self.clip_norm
        arrays = self.data.arrays

        def one_model_epoch(params, batch_stats, opt_state, key, plan_idx):
            """Scan over this model's batches; plan_idx (nb, B) rows index
            the shared dataset."""

            def step(carry, idx):
                params, batch_stats, opt_state, key = carry
                batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
                batch["mask"] = jnp.ones(idx.shape[0], jnp.float32)
                key, dk = jax.random.split(key)
                (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(params, batch_stats, batch, dk)
                grads, _ = clip_by_global_norm(grads, clip_norm)
                updates, new_opt = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                ok = jnp.isfinite(loss)
                sel = lambda new, old: jnp.where(ok, new, old)
                params = jax.tree.map(sel, new_params, params)
                opt_state = jax.tree.map(sel, new_opt, opt_state)
                batch_stats = jax.tree.map(sel, new_bs, batch_stats)
                metrics = jax.tree.map(lambda m: jnp.where(ok, m, 0.0), metrics)
                return (params, batch_stats, opt_state, key), metrics

            (params, batch_stats, opt_state, key), ms = jax.lax.scan(
                step, (params, batch_stats, opt_state, key), plan_idx
            )
            return params, batch_stats, opt_state, key, jax.tree.map(
                jnp.sum, ms
            )

        return jax.jit(jax.vmap(one_model_epoch))

    def _build_eval(self) -> Callable:
        arrays = self.data.arrays
        model = self.model

        def one_model_eval(params, batch_stats, test_idx):
            batch = {k: jnp.take(v, test_idx, axis=0) for k, v in arrays.items()}
            a, v = model.apply(
                {"params": params["model"], "batch_stats": batch_stats},
                batch["eeg"], batch["eye"], batch["pps"],
            )
            ones = jnp.ones(test_idx.shape[0], jnp.float32)
            return {
                "a_acc": masked_accuracy(a, batch["arousal"], ones),
                "v_acc": masked_accuracy(v, batch["valence"], ones),
            }

        return jax.jit(jax.vmap(one_model_eval))

    # ------------------------------------------------------------------
    def _epoch_plans(self) -> np.ndarray:
        """Per-subject shuffled batch plans, (S, nb, B). Train rows per
        subject are identical in count, so plans stack into one array;
        the tail partial batch is dropped (full batches only keeps masks
        out of the vmapped scan — at 460 rows and B=64 that drops <14%
        per epoch, resampled every epoch)."""
        n_train = self.train_idx.shape[1]
        nb = n_train // self.batch_size
        plans = np.empty((self.n_subjects, nb, self.batch_size), np.int32)
        for s in range(self.n_subjects):
            order = self.host_rng.permutation(n_train)[: nb * self.batch_size]
            plans[s] = self.train_idx[s][order].reshape(nb, self.batch_size)
        return plans

    def train_epoch(self) -> dict[str, np.ndarray]:
        plans = jnp.asarray(self._epoch_plans())
        (
            self.params,
            self.batch_stats,
            self.opt_state,
            self.dropout_keys,
            totals,
        ) = self._train_epoch_fn(
            self.params, self.batch_stats, self.opt_state,
            self.dropout_keys, plans,
        )
        totals = jax.device_get(totals)
        n = np.maximum(totals.pop("n"), 1.0)
        return {k: v / n for k, v in totals.items()}

    def evaluate(self) -> dict[str, np.ndarray]:
        """Per-subject held-out accuracies, (S,) each."""
        out = jax.device_get(
            self._eval_fn(self.params, self.batch_stats, jnp.asarray(self.test_idx))
        )
        return out

    def run(self, epochs: int, verbose: bool = True) -> dict[str, float]:
        """Train all LOSO models; returns mean held-out accuracies."""
        for epoch in range(1, epochs + 1):
            tm = self.train_epoch()
            if verbose:
                print(
                    f"Epoch {epoch}: mean train loss {tm['loss'].mean():.4f} "
                    f"a_acc {tm['a_acc'].mean():.2%}"
                )
        ev = self.evaluate()
        result = {
            "mean_arousal_acc": float(ev["a_acc"].mean()),
            "mean_valence_acc": float(ev["v_acc"].mean()),
            "per_subject_arousal": ev["a_acc"],
            "per_subject_valence": ev["v_acc"],
        }
        if verbose:
            print(
                f"LOSO mean: arousal {result['mean_arousal_acc']:.2%} "
                f"valence {result['mean_valence_acc']:.2%}"
            )
        return result
