"""Vectorized SimCLR LOSO: every subject's pretrain+finetune in one program.

The reference's second experiment stack (``train.py:141-205``) loops the 24
held-out subjects sequentially: per subject, contrastive-pretrain the
encoder+projector on that subject's balanced pair set (``train.py:45-80``),
then finetune a classifier on frozen features (``:83-138``). Like the
single-stage objective (:class:`.vloso.VectorizedLOSOTrainer`) and the
phased curriculum (:class:`.vphased.VectorizedPhasedTrainer`), every LOSO
split has identical shapes and the per-subject runs are independent — so
the TPU-native form vmaps both engines over the subject axis and trains
all 24 pretrain (then finetune) runs simultaneously.

Differences from the sequential engines it parallelizes
(:mod:`.simclr` — semantics preserved unless noted):

- **Pair-count padding.** Each subject's balanced pair set has its own
  length; vmap needs one. Every epoch uses ``nb = ceil(max_pairs / B)``
  batches per subject, indices drawn from a fresh per-subject permutation
  and WRAPPED modulo that subject's true pair count — so subjects with
  fewer pairs repeat a few early-permutation pairs within the epoch
  (an oversample, never a dummy pair; same trade as the vloso wrap-pad
  tail). Pair sets themselves are the exact per-subject
  :func:`..data.pairs.build_contrastive_pairs` output.
- **Per-subject streams.** Subject ``s``'s init, dropout and shuffle
  streams derive from ``seed + s`` (the reference re-instantiates the
  model per subject, advancing torch's global RNG — fresh init per
  subject).
- The finetune engine's documented deviation (encoder features in eval
  mode rather than the reference's train-mode "frozen" encoder) carries
  over unchanged from :func:`.simclr.finetune`.

Scaling out: pass a ``jax.sharding.Mesh`` and the subject axis of every
per-model tensor is sharded — embarrassingly parallel, zero collectives,
identical to vloso's design.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pairs import build_contrastive_pairs
from ..data.pipeline import DeviceDataset, epoch_batch_indices
from ..data.splits import loso_split, subject_ids_array
from ..ops.losses import (
    masked_accuracy,
    masked_cross_entropy,
    ntxent_supervised_two_view,
)
from .state import strong_typed


class VectorizedSimCLRTrainer:
    """All subjects' contrastive pretrain + frozen finetune at once.

    ``pretrain(epochs)`` then ``finetune(epochs)`` mirror the reference's
    per-subject ``contrastive_pretrain_trainer`` / ``finetune_trainer``
    calls; ``run(...)`` does both and returns per-subject final metrics.
    """

    def __init__(
        self,
        encoder,
        projector,
        classifier,
        data: DeviceDataset,
        n_subjects: int,
        ex_nums: int = 20,
        pretrain_lr: float = 1e-3,
        finetune_lr: float = 1e-4,
        batch_size: int = 64,
        temperature: float = 0.1,
        seed: int = 42,
        mesh=None,
        rng_impl: str | None = None,
        verbose: bool = True,
    ):
        self.encoder, self.projector, self.classifier = (
            encoder, projector, classifier)
        self.data = data
        self.n_subjects = n_subjects
        self.batch_size = batch_size
        self.temperature = temperature
        self.verbose = verbose
        self.host_rng = np.random.default_rng(seed)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            nd = int(mesh.devices.size)
            self.n_total = n_subjects + ((-n_subjects) % nd)
            self._shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        else:
            self.n_total = n_subjects
            self._shard = None

        # LOSO index tables (identical shape per subject); padding models
        # (s >= n_subjects, mesh-divisibility only) reuse s % n_subjects
        self.train_idx = np.stack([
            loso_split(n_subjects, ex_nums, s % n_subjects)[0]
            for s in range(self.n_total)
        ])  # (S, n_train)
        self.test_idx = np.stack([
            loso_split(n_subjects, ex_nums, s % n_subjects)[1]
            for s in range(self.n_total)
        ])  # (S, ex_nums)

        # per-subject balanced pair sets in GLOBAL row indices, padded to
        # the max pair count by wrapping (every row is a real pair)
        arrays_host = {k: np.asarray(v) for k, v in data.arrays.items()}
        sids = subject_ids_array(n_subjects, ex_nums)
        pair_rows, pair_labs, counts = [], [], []
        for s in range(self.n_total):
            tr = self.train_idx[s]
            pidx, plab = build_contrastive_pairs(
                arrays_host["arousal"][tr], arrays_host["valence"][tr],
                sids[tr], seed=seed + (s % n_subjects),
            )
            pair_rows.append(tr[pidx])  # local -> global rows
            pair_labs.append(plab)
            counts.append(len(plab))
        self.n_pairs = np.asarray(counts)  # (S,)
        pmax = int(self.n_pairs.max())
        self.pair_idx = np.stack([
            r[np.arange(pmax) % len(r)] for r in pair_rows
        ]).astype(np.int32)  # (S, Pmax, 2)
        self.pair_lab = np.stack([
            l[np.arange(pmax) % len(l)] for l in pair_labs
        ]).astype(np.float32)  # (S, Pmax)

        # per-subject fresh inits (reference main-loop semantics)
        sample = {k: v[:2] for k, v in data.arrays.items()}

        def init_one(key):
            ke, kp, kc, kd = jax.random.split(key, 4)
            enc_vars = encoder.init(
                {"params": ke, "dropout": kd},
                sample["eeg"], sample["eye"], sample["pps"],
            )
            feat = encoder.apply(
                enc_vars, sample["eeg"], sample["eye"], sample["pps"])
            proj_vars = projector.init(kp, feat)
            clf_vars = classifier.init(kc, feat)
            return (
                {"enc": enc_vars["params"], "proj": proj_vars["params"]},
                {"enc": enc_vars.get("batch_stats", {}),
                 "proj": proj_vars.get("batch_stats", {})},
                clf_vars["params"],
            )

        keys = jnp.stack([
            jax.random.key(seed + (s % n_subjects))
            for s in range(self.n_total)
        ])
        self.params, self.batch_stats, self.clf_params = jax.vmap(init_one)(
            keys)
        self.params = strong_typed(self.params)
        self.batch_stats = strong_typed(self.batch_stats)
        self.clf_params = strong_typed(self.clf_params)

        self.pre_tx = optax.adam(pretrain_lr)
        self.pre_opt = strong_typed(jax.vmap(self.pre_tx.init)(self.params))
        self.ft_tx = optax.adam(finetune_lr)
        self.ft_opt = strong_typed(jax.vmap(self.ft_tx.init)(self.clf_params))
        # threefry by default: bit-identical under any vmap width (the
        # slicing-equivalence test relies on it). rng_impl='rbg' opts into
        # the faster XLA RngBitGenerator streams (same trade as vloso /
        # vphased) — rbg generation is NOT vmap-width-invariant, so only
        # full-width runs are comparable under it.
        if rng_impl == "rbg":
            self.dropout_keys = jnp.stack([
                jax.random.key(seed + 1_000_003 + s, impl="rbg")
                for s in range(self.n_total)
            ])
        else:
            self.dropout_keys = jax.random.split(
                jax.random.key(seed + 1), self.n_total)

        if self._shard is not None:
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, self._shard), t)
            (self.params, self.batch_stats, self.clf_params, self.pre_opt,
             self.ft_opt) = map(put, (
                 self.params, self.batch_stats, self.clf_params,
                 self.pre_opt, self.ft_opt))
            self.dropout_keys = jax.device_put(self.dropout_keys, self._shard)

        self.pair_idx_dev = jnp.asarray(self.pair_idx)
        self.pair_lab_dev = jnp.asarray(self.pair_lab)
        self._pre_epoch = jax.jit(jax.vmap(
            self._pretrain_epoch_one,
            in_axes=(0, 0, 0, 0, 0),
        ))
        self._ft_epoch = jax.jit(jax.vmap(
            self._finetune_epoch_one, in_axes=(0, 0, 0, 0, 0, 0)))
        self._ft_eval = jax.jit(jax.vmap(
            self._finetune_eval_one, in_axes=(0, 0, 0, 0)))

    # -- pretrain ----------------------------------------------------------
    def _encode(self, params, batch_stats, idx, dk):
        arrays = self.data.arrays
        batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
        k1, k2 = jax.random.split(dk)
        feat, enc_mut = self.encoder.apply(
            {"params": params["enc"], "batch_stats": batch_stats["enc"]},
            batch["eeg"], batch["eye"], batch["pps"],
            train=True, mutable=["batch_stats"], rngs={"dropout": k1},
        )
        z, proj_mut = self.projector.apply(
            {"params": params["proj"], "batch_stats": batch_stats["proj"]},
            feat, train=True, mutable=["batch_stats"], rngs={"dropout": k2},
        )
        return z, {"enc": enc_mut["batch_stats"],
                   "proj": proj_mut["batch_stats"]}

    def _pretrain_epoch_one(self, params, batch_stats, opt_state, key,
                            plan):
        """One subject's pretrain epoch; ``plan`` is
        ``(pair rows (nb, B, 2), labels (nb, B))``."""

        def loss_fn(params, batch_stats, pidx, plab, dk):
            ka, kb = jax.random.split(dk)
            z1, bs1 = self._encode(params, batch_stats, pidx[:, 0], ka)
            z2, bs2 = self._encode(params, bs1, pidx[:, 1], kb)
            return ntxent_supervised_two_view(
                z1, z2, plab, self.temperature), bs2

        def step(carry, xs):
            params, batch_stats, opt_state, key = carry
            pidx, plab = xs
            key, dk = jax.random.split(key)
            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, pidx, plab, dk)
            updates, opt_state = self.pre_tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, bs, opt_state, key), loss

        (params, batch_stats, opt_state, key), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state, key), plan)
        return params, batch_stats, opt_state, key, losses.mean()

    def _pretrain_plans(self):
        """Per-subject wrapped pair plans for one epoch:
        (rows (S, nb, B, 2) int32, labels (S, nb, B) f32)."""
        b = self.batch_size
        pmax = self.pair_idx.shape[1]
        nb = -(-pmax // b)
        rows_all = np.empty((self.n_total, nb * b, 2), np.int32)
        labs_all = np.empty((self.n_total, nb * b), np.float32)
        for s in range(self.n_total):
            n = int(self.n_pairs[s])
            perm = self.host_rng.permutation(n)
            rows = perm[np.arange(nb * b) % n]
            rows_all[s] = self.pair_idx[s, rows]
            labs_all[s] = self.pair_lab[s, rows]
        return (jnp.asarray(rows_all.reshape(self.n_total, nb, b, 2)),
                jnp.asarray(labs_all.reshape(self.n_total, nb, b)))

    def pretrain(self, num_epochs: int) -> list[np.ndarray]:
        """All subjects' contrastive pretraining; returns per-epoch
        (S,) mean-loss arrays."""
        history = []
        for epoch in range(num_epochs):
            (self.params, self.batch_stats, self.pre_opt,
             self.dropout_keys, losses) = self._pre_epoch(
                self.params, self.batch_stats, self.pre_opt,
                self.dropout_keys, self._pretrain_plans())
            history.append(np.asarray(jax.device_get(losses)))
            if self.verbose:
                print(f"[vSimCLR pretrain {epoch + 1}/{num_epochs}] "
                      f"mean loss {history[-1].mean():.4f}")
        return history

    # -- finetune ----------------------------------------------------------
    def _features(self, params, batch_stats, idx):
        arrays = self.data.arrays
        batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
        feat = self.encoder.apply(
            {"params": params["enc"], "batch_stats": batch_stats["enc"]},
            batch["eeg"], batch["eye"], batch["pps"],
        )
        return jax.lax.stop_gradient(feat), batch

    def _finetune_epoch_one(self, enc_params, enc_bs, clf_params, opt_state,
                            key, plan):
        plan_idx, plan_mask = plan

        def loss_fn(clf_params, feat, batch, dk):
            out_a, out_v = self.classifier.apply(
                {"params": clf_params}, feat, train=True,
                rngs={"dropout": dk})
            return (
                masked_cross_entropy(out_a, batch["arousal"], batch["mask"])
                + masked_cross_entropy(out_v, batch["valence"],
                                       batch["mask"]))

        def step(carry, xs):
            clf_params, opt_state, key = carry
            idx, bmask = xs
            key, dk = jax.random.split(key)
            feat, batch = self._features(enc_params, enc_bs, idx)
            batch["mask"] = bmask
            loss, grads = jax.value_and_grad(loss_fn)(
                clf_params, feat, batch, dk)
            updates, opt_state = self.ft_tx.update(
                grads, opt_state, clf_params)
            clf_params = optax.apply_updates(clf_params, updates)
            return (clf_params, opt_state, key), loss

        (clf_params, opt_state, key), losses = jax.lax.scan(
            step, (clf_params, opt_state, key), (plan_idx, plan_mask))
        return clf_params, opt_state, key, losses.mean()

    def _finetune_eval_one(self, enc_params, enc_bs, clf_params, test_idx):
        feat, batch = self._features(enc_params, enc_bs, test_idx)
        out_a, out_v = self.classifier.apply({"params": clf_params}, feat)
        ones = jnp.ones(test_idx.shape[0], jnp.float32)
        return {
            "a_acc": masked_accuracy(out_a, batch["arousal"], ones),
            "v_acc": masked_accuracy(out_v, batch["valence"], ones),
        }

    def _finetune_plans(self):
        b = self.batch_size
        n_train = self.train_idx.shape[1]
        nb = -(-n_train // b)
        idx = np.empty((self.n_total, nb * b), np.int32)
        mask = np.zeros((self.n_total, nb * b), np.float32)
        for s in range(self.n_total):
            perm = self.host_rng.permutation(n_train)
            rows = perm[np.arange(nb * b) % n_train]
            idx[s] = self.train_idx[s][rows]
            mask[s, :n_train] = 1.0
        return (jnp.asarray(idx.reshape(self.n_total, nb, b)),
                jnp.asarray(mask.reshape(self.n_total, nb, b)))

    def finetune(self, num_epochs: int) -> dict[str, np.ndarray]:
        """All subjects' frozen-encoder finetune; returns final per-subject
        test metrics (arrays of shape (S,))."""
        metrics = {}
        test_idx_dev = jnp.asarray(self.test_idx)
        for epoch in range(num_epochs):
            (self.clf_params, self.ft_opt, self.dropout_keys,
             losses) = self._ft_epoch(
                self.params, self.batch_stats, self.clf_params, self.ft_opt,
                self.dropout_keys, self._finetune_plans())
            metrics = jax.device_get(self._ft_eval(
                self.params, self.batch_stats, self.clf_params,
                test_idx_dev))
            if self.verbose:
                print(f"[vSimCLR finetune {epoch + 1}/{num_epochs}] "
                      f"mean loss {float(np.mean(losses)):.4f} "
                      f"arousal {float(np.mean(metrics['a_acc'])):.2%} "
                      f"valence {float(np.mean(metrics['v_acc'])):.2%}")
        return {k: np.asarray(v)[: self.n_subjects]
                for k, v in metrics.items()}

    def run(self, pretrain_epochs: int = 50,
            finetune_epochs: int = 30) -> dict[str, Any]:
        self.pretrain(pretrain_epochs)
        metrics = self.finetune(finetune_epochs)
        return {
            "per_subject": metrics,
            "mean_arousal_acc": float(np.mean(metrics["a_acc"])),
            "mean_valence_acc": float(np.mean(metrics["v_acc"])),
        }
