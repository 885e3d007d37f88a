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

Scaling out (net-new vs the reference, which is single-device): pass a
``jax.sharding.Mesh`` and the *subject* axis of every per-model state
tensor is sharded over it — the natural data-parallel decomposition for
LOSO (24 independent models / N devices). Because models are independent
there are ZERO collectives; XLA runs each device's subject shard as plain
SPMD, so an N-chip mesh is an embarrassingly parallel N-x scale-out and a
1-chip mesh degenerates to the single-device program.

Fused multi-epoch mode: :meth:`train_epochs_fused` compiles E epochs into ONE
program — an outer ``lax.scan`` over epochs whose per-epoch batch plans are
built on device by :func:`..data.pipeline.epoch_plan_on_device` (shuffle +
wrap-pad + mask inside jit). This removes every host round-trip from the
training loop. Both plan paths (host and on-device) cover ALL train rows
each epoch via the same wrap-pad + mask scheme, so they train on the same
data distribution and differ only in where the shuffle runs.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.pipeline import DeviceDataset, epoch_plan_on_device
from ..data.splits import loso_split
from ..ops.losses import masked_accuracy, masked_cross_entropy
from ..ops.rnn import wrap_with_dispatch
from .state import (
    adamw_lowp,
    cast_floating,
    clip_by_global_norm,
    strong_typed,
)


class VectorizedLOSOTrainer:
    """Trains one model per held-out subject, all at once.

    With ``mesh`` set, per-model state is sharded over the mesh's first
    axis along the subject dimension (padded up to a device multiple; the
    padding models train on subject-0's split and are sliced off every
    result).
    """

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
        moment_dtype: str | None = None,
        mesh: Mesh | None = None,
    ):
        # compute_dtype='bfloat16' runs forward/backward in bf16 at native
        # MXU rate while AdamW keeps float32 master params; losses and
        # BatchNorm running stats are carried in float32 regardless.
        # moment_dtype='bfloat16' additionally stores the Adam moments
        # low-precision (:func:`.state.adamw_lowp`) — the optimizer update
        # is HBM-roofline-bound, so halving the m/v traffic is the one
        # lever left there; keep it None for the fp32 parity config.
        self.model = model
        self.data = data
        self.n_subjects = n_subjects
        self.ex_nums = ex_nums
        self.batch_size = batch_size
        self.clip_norm = clip_norm
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.host_rng = np.random.default_rng(seed)

        # subject axis padded to a device multiple when sharded over a mesh
        if mesh is not None:
            nd = int(mesh.devices.size)
            self.n_total = n_subjects + ((-n_subjects) % nd)
            axis = mesh.axis_names[0]
            self._shard = NamedSharding(mesh, P(axis))
            self._repl = NamedSharding(mesh, P())
        else:
            self.n_total = n_subjects
            self._shard = self._repl = None

        # per-subject LOSO index tables; every split has identical shape.
        # Padding models (s >= n_subjects) reuse subject s % n_subjects.
        self.train_idx = np.stack(
            [
                loso_split(n_subjects, ex_nums, s % n_subjects)[0]
                for s in range(self.n_total)
            ]
        )  # (S, n_train)
        self.test_idx = np.stack(
            [
                loso_split(n_subjects, ex_nums, s % n_subjects)[1]
                for s in range(self.n_total)
            ]
        )  # (S, ex_nums)

        sample = {k: v[:2] for k, v in data.arrays.items()}

        def init_one(key):
            variables = model.init(
                {"params": key, "dropout": key},
                sample["eeg"], sample["eye"], sample["pps"],
            )
            return variables["params"], variables.get("batch_stats", {})

        keys = jax.random.split(jax.random.key(seed), self.n_total)
        self.params, self.batch_stats = jax.vmap(init_one)(keys)
        # weak-typed init scalars (temperature) would retrace the epoch
        # program on its 2nd call once compiled outputs come back strong
        self.params = strong_typed(self.params)
        self.batch_stats = strong_typed(self.batch_stats)
        self.params = {
            "model": self.params,
            "trainer": {
                "contrastive_weight": jnp.ones((self.n_total, 1), jnp.float32)
            },
        }

        if moment_dtype is None:
            self.tx = optax.adamw(lr, weight_decay=weight_decay)
        else:
            self.tx = adamw_lowp(
                lr, weight_decay=weight_decay,
                moment_dtype=jnp.dtype(moment_dtype),
            )
        self.opt_state = strong_typed(jax.vmap(self.tx.init)(self.params))
        # XLA RngBitGenerator keys for the dropout masks: same mask
        # distribution as the default threefry at roughly half the
        # bit-generation cost (step ablation: masks cost 7.2 ms/step of
        # 60.3 with threefry; rbg keys bring the step to 56.9 ms —
        # scripts/profile_step.py --rbg). Keys are never serialized here,
        # so the impl is free to differ from the global default.
        self.dropout_keys = jax.random.split(
            jax.random.key(seed + 1, impl="rbg"), self.n_total
        )

        # Under vmap the model axis lands inside the fused LSTM kernel's
        # blocks, so its backward's scoped VMEM grows with S and the
        # batch block. The v8 backward blocks the batch axis in its grid
        # (kernels/lstm.py::pick_block_b), so every realistic config now
        # fits fused (the fp32 B=256 cliff — 146M/128M measured pre-v8 —
        # runs as two Bb=128 blocks); only absurd configs too big even
        # at block 8 route onto the XLA recurrence, per-program via
        # wrap_with_dispatch, without touching the process default.
        from ..kernels.lstm import fused_bwd_vmem_fits

        hidden = getattr(model, "feat_dim", 256) // 2
        itemsize = 2 if compute_dtype == "bfloat16" else 4
        self._fused_lstm_ok = fused_bwd_vmem_fits(
            self.n_total, batch_size, hidden, itemsize
        )

        if mesh is not None:
            # place the per-model state sharded once; out_shardings keep it
            # sharded across epochs, so there is no resharding in the loop
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, self._shard), t
            )
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)
            self.dropout_keys = jax.device_put(self.dropout_keys, self._shard)

        self._train_epoch_fn = self._build_train_epoch()
        self._eval_fn = self._build_eval()
        self._fused_fns: dict[int, Callable] = {}
        self._fused_key = jax.random.key(seed + 2, impl="rbg")

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

    def _one_model_epoch(self, params, batch_stats, opt_state, key,
                         plan_idx, plan_mask):
        """Scan over one model's batches; plan_idx (nb, B) rows index the
        shared dataset, plan_mask (nb, B) flags valid (non-wrap-pad) rows."""
        tx, clip_norm = self.tx, self.clip_norm
        arrays = self.data.arrays

        def step(carry, xs):
            params, batch_stats, opt_state, key = carry
            idx, bmask = xs
            batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
            batch["mask"] = bmask
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
            step, (params, batch_stats, opt_state, key), (plan_idx, plan_mask)
        )
        return params, batch_stats, opt_state, key, jax.tree.map(jnp.sum, ms)

    def _build_train_epoch(self) -> Callable:
        fn = wrap_with_dispatch(
            jax.vmap(self._one_model_epoch), self._fused_lstm_ok
        )
        if self.mesh is None:
            return jax.jit(fn)
        # subject-sharded SPMD: every arg/out has a leading subject axis
        s = self._shard
        return jax.jit(
            fn,
            in_shardings=(s, s, s, s, s, s),
            out_shardings=(s, s, s, s, s),
        )

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

        fn = wrap_with_dispatch(jax.vmap(one_model_eval),
                                self._fused_lstm_ok)
        if self.mesh is None:
            return jax.jit(fn)
        s = self._shard
        return jax.jit(fn, in_shardings=(s, s, s), out_shardings=s)

    # ------------------------------------------------------------------
    def _epoch_plans(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-subject shuffled batch plans, (S, nb, B) + validity masks.
        Train rows per subject are identical in count, so plans stack into
        one array. The tail partial batch is covered by wrap-padding the
        permutation and masking the padded entries — the same scheme
        :func:`..data.pipeline.epoch_plan_on_device` uses in the fused
        path, so both paths see every train row each epoch (round 2
        dropped the tail here: ~14% of rows at 460 rows / B=64)."""
        n_train = self.train_idx.shape[1]
        bsz = self.batch_size
        nb = -(-n_train // bsz)
        padded = nb * bsz
        reps = -(-padded // n_train)
        plans = np.empty((self.n_total, nb, bsz), np.int32)
        for s in range(self.n_total):
            order = np.tile(self.host_rng.permutation(n_train), reps)[:padded]
            plans[s] = self.train_idx[s][order].reshape(nb, bsz)
        masks = np.broadcast_to(
            (np.arange(padded) < n_train).astype(np.float32).reshape(nb, bsz),
            plans.shape,
        ).copy()
        return plans, masks

    def train_epoch(self) -> dict[str, np.ndarray]:
        plans, masks = self._epoch_plans()
        (
            self.params,
            self.batch_stats,
            self.opt_state,
            self.dropout_keys,
            totals,
        ) = self._train_epoch_fn(
            self.params, self.batch_stats, self.opt_state,
            self.dropout_keys, jnp.asarray(plans), jnp.asarray(masks),
        )
        totals = jax.device_get(totals)
        n = np.maximum(totals.pop("n"), 1.0)
        return {k: (v / n)[: self.n_subjects] for k, v in totals.items()}

    # ------------------------------------------------------------------
    def _build_fused(self, n_epochs: int) -> Callable:
        """E epochs as ONE jitted program: scan over epochs, per-epoch
        plans built on device (shuffle+wrap-pad+mask inside jit via
        :func:`epoch_plan_on_device`) — zero host work in the loop."""
        n_train = self.train_idx.shape[1]
        bsz = self.batch_size
        train_rows = jnp.asarray(self.train_idx)  # (S, n_train)
        if self.mesh is not None:
            train_rows = jax.device_put(train_rows, self._shard)
        epoch_fn = jax.vmap(self._one_model_epoch)

        def fused(params, batch_stats, opt_state, dkeys, plan_key):
            def epoch_body(carry, ekey):
                params, batch_stats, opt_state, dkeys = carry
                subj_keys = jax.random.split(ekey, train_rows.shape[0])

                def plan_one(k, rows):
                    idx, m = epoch_plan_on_device(k, n_train, bsz)
                    return rows[idx], m

                plans, masks = jax.vmap(plan_one)(subj_keys, train_rows)
                params, batch_stats, opt_state, dkeys, totals = epoch_fn(
                    params, batch_stats, opt_state, dkeys, plans, masks
                )
                return (params, batch_stats, opt_state, dkeys), totals

            ekeys = jax.random.split(plan_key, n_epochs)
            (params, batch_stats, opt_state, dkeys), totals = jax.lax.scan(
                epoch_body, (params, batch_stats, opt_state, dkeys), ekeys
            )
            return params, batch_stats, opt_state, dkeys, totals

        fused = wrap_with_dispatch(fused, self._fused_lstm_ok)
        if self.mesh is None:
            return jax.jit(fused)
        s, r = self._shard, self._repl
        epoch_s = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
        return jax.jit(
            fused,
            in_shardings=(s, s, s, s, r),
            out_shardings=(s, s, s, s, epoch_s),
        )

    def train_epochs_fused(self, n_epochs: int) -> dict[str, np.ndarray]:
        """Run ``n_epochs`` epochs in one compiled program; returns per-epoch
        per-subject mean metrics, (E, S) each. Plan shuffling uses an
        on-device PRNG stream (deterministic in ``seed``, independent of the
        host stream :meth:`train_epoch` consumes)."""
        if n_epochs not in self._fused_fns:
            self._fused_fns[n_epochs] = self._build_fused(n_epochs)
        self._fused_key, k = jax.random.split(self._fused_key)
        (
            self.params,
            self.batch_stats,
            self.opt_state,
            self.dropout_keys,
            totals,
        ) = self._fused_fns[n_epochs](
            self.params, self.batch_stats, self.opt_state,
            self.dropout_keys, k,
        )
        totals = jax.device_get(totals)
        n = np.maximum(totals.pop("n"), 1.0)
        return {k_: (v / n)[:, : self.n_subjects] for k_, v in totals.items()}

    # ------------------------------------------------------------------
    # full-state checkpoint/resume (net-new vs the reference, whose LOSO
    # loop can only save final per-subject weights — SURVEY.md §5 flags
    # resume as a reference gap) + per-subject export for Tester/serving.
    def subject_variables(self, sid: int) -> dict:
        """Slice one subject's flax variables out of the stacked state
        (for :class:`..eval.tester.Tester` / serving, matching the
        sequential driver's checkpoint payload)."""
        take = lambda t: jax.tree.map(lambda x: x[sid], t)
        return {
            "params": take(self.params["model"]),
            "batch_stats": take(self.batch_stats),
        }

    def _state_tree(self) -> dict:
        import json

        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "dropout_keys": jax.random.key_data(self.dropout_keys),
            "fused_key": jax.random.key_data(self._fused_key),
            # JSON leaf: host-RNG state is a variable structure msgpack
            # restore couldn't type (same convention as engine.save_state)
            "host": json.dumps(
                {"rng_state": self.host_rng.bit_generator.state}
            ),
        }

    def save_state(self, path: str) -> str:
        """Serialize ALL 24 models' params, BN stats, optimizer states and
        RNG streams so the vectorized experiment resumes exactly."""
        from ..utils.checkpoint import save_checkpoint

        return save_checkpoint(path, self._state_tree())

    def restore_state(self, path: str) -> None:
        import json

        from ..utils.checkpoint import load_checkpoint

        tree = load_checkpoint(path, self._state_tree())
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        self.opt_state = tree["opt_state"]
        self.dropout_keys = jax.random.wrap_key_data(
            tree["dropout_keys"], impl="rbg"
        )
        self._fused_key = jax.random.wrap_key_data(
            tree["fused_key"], impl="rbg"
        )
        host = json.loads(tree["host"])
        self.host_rng = np.random.default_rng()
        self.host_rng.bit_generator.state = host["rng_state"]
        if self.mesh is not None:  # re-place the subject shards
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, self._shard), t
            )
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)
            self.dropout_keys = jax.device_put(self.dropout_keys, self._shard)

    def evaluate(self) -> dict[str, np.ndarray]:
        """Per-subject held-out accuracies, (S,) each."""
        test_idx = jnp.asarray(self.test_idx)
        out = jax.device_get(
            self._eval_fn(self.params, self.batch_stats, test_idx)
        )
        return {k: v[: self.n_subjects] for k, v in out.items()}

    def run(
        self, epochs: int, verbose: bool = True, fused: bool = False
    ) -> dict[str, float]:
        """Train all LOSO models; returns mean held-out accuracies."""
        if fused:
            tm = self.train_epochs_fused(epochs)
            if verbose:
                for e in range(epochs):
                    print(
                        f"Epoch {e + 1}: mean train loss "
                        f"{tm['loss'][e].mean():.4f} "
                        f"a_acc {tm['a_acc'][e].mean():.2%}"
                    )
        else:
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
