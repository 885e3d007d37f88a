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

Early stopping + plateau LR (``early_stop=True``): the reference's LOSO
experiment early-stops each subject on its held-out loss (patience 5,
best-checkpoint save, ``Trainer.py:107-117``) and halves the LR on plateau
(patience 3, ``Trainer.py:28``) — its run logs show subjects stopping
anywhere from epoch 7 to 30. Vectorized, that control flow moves INSIDE
the jitted epoch scan as per-subject ``(S,)`` lanes
(:func:`..utils.schedule.vector_schedule_step`): a ``stopped`` flag that
folds into the per-batch update select (a stopped subject's params,
optimizer state and BN stats freeze exactly as if its sequential loop had
``break``-ed), a per-subject LR vector living in the optimizer state
(``optax.inject_hyperparams`` — under ``vmap`` each model reads its own
lane), per-epoch held-out loss evaluated inside the program, and
best-params snapshots taken branchlessly on improvement lanes. The fixed
epoch count becomes an upper bound; :meth:`run` executes the fused program
in chunks and exits once every subject has stopped, recovering the
sequential driver's wall-clock saving without leaving the fused regime.
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
from ..utils.schedule import vector_schedule_init, vector_schedule_step
from .state import (
    adamw_lowp,
    cast_floating,
    clip_by_global_norm,
    set_learning_rate,
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
        early_stop: bool = False,
        es_patience: int = 5,
        plateau_patience: int = 3,
        plateau_factor: float = 0.5,
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

        self.early_stop = early_stop
        self._es_cfg = dict(
            es_patience=es_patience,
            plateau_patience=plateau_patience,
            plateau_factor=plateau_factor,
        )
        if early_stop:
            # per-subject LR lives IN the optimizer state: inject_hyperparams
            # makes learning_rate a state leaf, vmap(init) stacks it to (S,),
            # and each vmapped model's update reads its own lane — plateau
            # decisions per subject without recompiling anything.
            if moment_dtype is None:
                self.tx = optax.inject_hyperparams(optax.adamw)(
                    learning_rate=lr, weight_decay=weight_decay
                )
            else:
                self.tx = optax.inject_hyperparams(
                    adamw_lowp, static_args=("moment_dtype",)
                )(
                    lr, weight_decay=weight_decay,
                    moment_dtype=jnp.dtype(moment_dtype),
                )
            self.sched = vector_schedule_init(self.n_total, lr)
            self.best_params = self.params
            self.best_stats = self.batch_stats
            self._epochs_run = 0
        elif moment_dtype is None:
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
            if early_stop:
                self.sched = put(self.sched)
                self.best_params = put(self.best_params)
                self.best_stats = put(self.best_stats)

        self._train_epoch_fn = self._build_train_epoch()
        self._eval_fn = self._build_eval()
        self._fused_fns: dict[int, Callable] = {}
        self._fused_es_fns: dict[int, Callable] = {}
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
                         plan_idx, plan_mask, active):
        """Scan over one model's batches; plan_idx (nb, B) rows index the
        shared dataset, plan_mask (nb, B) flags valid (non-wrap-pad) rows.
        ``active`` (scalar bool per model) folds into the NaN-skip select:
        an early-stopped subject's state freezes — the vectorized analog of
        its sequential loop having ``break``-ed out."""
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
            ok = jnp.isfinite(loss) & active
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
            in_shardings=(s, s, s, s, s, s, s),
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
        active = (
            ~self.sched["stopped"]
            if self.early_stop
            else jnp.ones((self.n_total,), bool)
        )
        if self._shard is not None:
            active = jax.device_put(active, self._shard)
        (
            self.params,
            self.batch_stats,
            self.opt_state,
            self.dropout_keys,
            totals,
        ) = self._train_epoch_fn(
            self.params, self.batch_stats, self.opt_state,
            self.dropout_keys, jnp.asarray(plans), jnp.asarray(masks),
            active,
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
                active = jnp.ones((train_rows.shape[0],), bool)
                params, batch_stats, opt_state, dkeys, totals = epoch_fn(
                    params, batch_stats, opt_state, dkeys, plans, masks,
                    active,
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

    # ------------------------------------------------------------------
    # early-stop / plateau-LR machinery (module docstring; reference
    # Trainer.py:28,107-117 — the sequential driver's per-epoch test()
    # feeding its scheduler and early stop)
    def _one_model_te_loss(self, params, batch_stats, tidx):
        """One model's held-out loss + accuracies (eval mode; the 20 LOSO
        test rows fit a single batch). Matches the sequential engine's
        test objective: CE(both heads) + w * (3x InfoNCE)."""
        arrays = self.data.arrays
        batch = {k: jnp.take(v, tidx, axis=0) for k, v in arrays.items()}
        mask = jnp.ones(tidx.shape[0], jnp.float32)
        outs = self.model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            batch["eeg"], batch["eye"], batch["pps"],
            labels=(batch["arousal"], batch["valence"], mask),
        )
        arousal, valence, c1, c2, c3 = outs
        arousal = jnp.nan_to_num(arousal).astype(jnp.float32)
        valence = jnp.nan_to_num(valence).astype(jnp.float32)
        c1, c2, c3 = (x.astype(jnp.float32) for x in (c1, c2, c3))
        ce = masked_cross_entropy(arousal, batch["arousal"], mask) + \
            masked_cross_entropy(valence, batch["valence"], mask)
        loss = ce + params["trainer"]["contrastive_weight"][0] * (c1 + c2 + c3)
        return {
            "te_loss": loss,
            "te_a_acc": masked_accuracy(arousal, batch["arousal"], mask),
            "te_v_acc": masked_accuracy(valence, batch["valence"], mask),
        }

    def _snap_best(self, improved, best_params, best_stats, params,
                   batch_stats):
        """Branchless per-subject best-checkpoint capture: lanes whose
        held-out loss just improved copy current state into the best
        buffers (the sequential driver's best_model.msgpack save)."""
        pick = lambda b, p: jnp.where(
            improved.reshape((-1,) + (1,) * (p.ndim - 1)), p, b
        )
        return (
            jax.tree.map(pick, best_params, params),
            jax.tree.map(pick, best_stats, batch_stats),
        )

    def _build_fused_es(self, n_epochs: int) -> Callable:
        """E epochs as ONE jitted program with the per-subject early-stop +
        plateau-LR control INSIDE the epoch scan (see module docstring)."""
        n_train = self.train_idx.shape[1]
        bsz = self.batch_size
        train_rows = jnp.asarray(self.train_idx)  # (S, n_train)
        test_rows = jnp.asarray(self.test_idx)  # (S, ex_nums)
        if self.mesh is not None:
            train_rows = jax.device_put(train_rows, self._shard)
            test_rows = jax.device_put(test_rows, self._shard)
        epoch_fn = jax.vmap(self._one_model_epoch)
        te_fn = jax.vmap(self._one_model_te_loss)
        cfg = self._es_cfg

        def fused(params, batch_stats, opt_state, dkeys, plan_key, epoch0,
                  sched, best_params, best_stats):
            def epoch_body(carry, xs):
                (params, batch_stats, opt_state, dkeys,
                 sched, best_params, best_stats) = carry
                eidx, ekey = xs
                subj_keys = jax.random.split(ekey, train_rows.shape[0])

                def plan_one(k, rows):
                    idx, m = epoch_plan_on_device(k, n_train, bsz)
                    return rows[idx], m

                plans, masks = jax.vmap(plan_one)(subj_keys, train_rows)
                active = ~sched["stopped"]
                params, batch_stats, opt_state, dkeys, totals = epoch_fn(
                    params, batch_stats, opt_state, dkeys, plans, masks,
                    active,
                )
                te = te_fn(params, batch_stats, test_rows)
                sched, improved = vector_schedule_step(
                    sched, te["te_loss"], eidx,
                    es_patience=cfg["es_patience"],
                    plateau_patience=cfg["plateau_patience"],
                    plateau_factor=cfg["plateau_factor"],
                )
                # next epoch's per-subject LR rides the optimizer state
                opt_state = set_learning_rate(opt_state, sched["lr"])
                best_params, best_stats = self._snap_best(
                    improved, best_params, best_stats, params, batch_stats
                )
                out = {**totals, **te, "lr": sched["lr"],
                       "stopped": sched["stopped"]}
                return (params, batch_stats, opt_state, dkeys,
                        sched, best_params, best_stats), out

            ekeys = jax.random.split(plan_key, n_epochs)
            eidxs = epoch0 + 1 + jnp.arange(n_epochs, dtype=jnp.int32)
            return jax.lax.scan(
                epoch_body,
                (params, batch_stats, opt_state, dkeys, sched, best_params,
                 best_stats),
                (eidxs, ekeys),
            )

        fused = wrap_with_dispatch(fused, self._fused_lstm_ok)
        if self.mesh is None:
            return jax.jit(fused)
        s, r = self._shard, self._repl
        epoch_s = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
        return jax.jit(
            fused,
            in_shardings=(s, s, s, s, r, r, s, s, s),
            out_shardings=((s, s, s, s, s, s, s), epoch_s),
        )

    def _train_epochs_fused_es(self, n_epochs: int) -> dict[str, np.ndarray]:
        if n_epochs not in self._fused_es_fns:
            self._fused_es_fns[n_epochs] = self._build_fused_es(n_epochs)
        self._fused_key, k = jax.random.split(self._fused_key)
        carry, outs = self._fused_es_fns[n_epochs](
            self.params, self.batch_stats, self.opt_state,
            self.dropout_keys, k, jnp.asarray(self._epochs_run, jnp.int32),
            self.sched, self.best_params, self.best_stats,
        )
        (
            self.params, self.batch_stats, self.opt_state,
            self.dropout_keys, self.sched, self.best_params,
            self.best_stats,
        ) = carry
        self._epochs_run += n_epochs
        outs = jax.device_get(outs)
        n = np.maximum(outs.pop("n"), 1.0)
        result = {}
        for k_, v in outs.items():
            if k_ in ("loss", "a_acc", "v_acc"):
                v = v / n  # per-sample means from masked sums
            result[k_] = v[:, : self.n_subjects]
        return result

    def train_epochs_fused(self, n_epochs: int) -> dict[str, np.ndarray]:
        """Run ``n_epochs`` epochs in one compiled program; returns per-epoch
        per-subject mean metrics, (E, S) each. Plan shuffling uses an
        on-device PRNG stream (deterministic in ``seed``, independent of the
        host stream :meth:`train_epoch` consumes). With ``early_stop`` the
        program additionally carries the per-subject schedule state and the
        result gains ``te_loss``/``te_a_acc``/``te_v_acc``/``lr``/``stopped``
        per-epoch lanes."""
        if self.early_stop:
            return self._train_epochs_fused_es(n_epochs)
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

        tree = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "dropout_keys": jax.random.key_data(self.dropout_keys),
            "fused_key": jax.random.key_data(self._fused_key),
            # JSON leaf: host-RNG state is a variable structure msgpack
            # restore couldn't type (same convention as engine.save_state)
            "host": json.dumps(
                {
                    "rng_state": self.host_rng.bit_generator.state,
                    "epochs_run": getattr(self, "_epochs_run", 0),
                }
            ),
        }
        if self.early_stop:
            tree["sched"] = self.sched
            tree["best_params"] = self.best_params
            tree["best_stats"] = self.best_stats
        return tree

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
        if self.early_stop:
            self.sched = tree["sched"]
            self.best_params = tree["best_params"]
            self.best_stats = tree["best_stats"]
            self._epochs_run = int(host.get("epochs_run", 0))
        if self.mesh is not None:  # re-place the subject shards
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, self._shard), t
            )
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)
            self.dropout_keys = jax.device_put(self.dropout_keys, self._shard)
            if self.early_stop:
                self.sched = put(self.sched)
                self.best_params = put(self.best_params)
                self.best_stats = put(self.best_stats)

    def evaluate(self, best: bool = False) -> dict[str, np.ndarray]:
        """Per-subject held-out accuracies, (S,) each. ``best=True``
        evaluates each subject's best-checkpoint snapshot (what the
        reference's Tester loads after early-stopped training) instead of
        the final params."""
        if best and not self.early_stop:
            raise ValueError("best=True requires early_stop=True")
        params = self.best_params if best else self.params
        stats = self.best_stats if best else self.batch_stats
        test_idx = jnp.asarray(self.test_idx)
        if self._shard is not None:
            test_idx = jax.device_put(test_idx, self._shard)
        out = jax.device_get(self._eval_fn(params, stats, test_idx))
        return {k: v[: self.n_subjects] for k, v in out.items()}

    # ------------------------------------------------------------------
    def _host_es_epoch(self, epoch_num: int) -> dict[str, np.ndarray]:
        """One early-stop epoch on the non-fused path: train (stopped
        subjects frozen via the active lane), evaluate held-out loss, then
        advance the schedule state eagerly with the SAME transition the
        fused program scans over."""
        tm = self.train_epoch()
        test_rows = jnp.asarray(self.test_idx)
        if self._shard is not None:
            test_rows = jax.device_put(test_rows, self._shard)
        if not hasattr(self, "_te_fn"):
            fn = wrap_with_dispatch(
                jax.vmap(self._one_model_te_loss), self._fused_lstm_ok
            )
            if self.mesh is None:
                self._te_fn = jax.jit(fn)
            else:
                s = self._shard
                self._te_fn = jax.jit(
                    fn, in_shardings=(s, s, s), out_shardings=s
                )
        te = self._te_fn(self.params, self.batch_stats, test_rows)
        self.sched, improved = vector_schedule_step(
            self.sched, te["te_loss"], epoch_num, **self._es_cfg
        )
        self.opt_state = set_learning_rate(self.opt_state, self.sched["lr"])
        self.best_params, self.best_stats = self._snap_best(
            improved, self.best_params, self.best_stats,
            self.params, self.batch_stats,
        )
        self._epochs_run = epoch_num
        te = jax.device_get(te)
        return {**tm, **{k: v[: self.n_subjects] for k, v in te.items()}}

    def stop_report(self) -> str:
        """Per-subject stop-epoch distribution, the vectorized analog of
        the reference run log's per-subject 'Early stopping triggered at
        epoch N' lines (train.txt)."""
        stop = np.asarray(jax.device_get(self.sched["stop_epoch"]))
        stop = stop[: self.n_subjects]
        lines = [
            f"  subject {s}: "
            + (f"early-stopped at epoch {int(e)}" if e > 0
               else f"ran all {self._epochs_run} epochs")
            for s, e in enumerate(stop)
        ]
        stopped = stop[stop > 0]
        head = (
            f"Early stopping: {stopped.size}/{stop.size} subjects stopped"
            + (f" (epochs {int(stopped.min())}-{int(stopped.max())}, "
               f"median {float(np.median(stopped)):.1f})"
               if stopped.size else "")
        )
        return "\n".join([head] + lines)

    def run(
        self,
        epochs: int,
        verbose: bool = True,
        fused: bool = False,
        chunk: int | None = None,
    ) -> dict[str, float]:
        """Train all LOSO models; returns mean held-out accuracies.

        With ``early_stop``, ``epochs`` is an upper bound: the fused path
        runs the compiled E-epoch program in chunks (``chunk``, default 8 —
        one compile, reused) and exits once every subject's early stop has
        triggered; the result additionally carries per-subject stop epochs
        and best-checkpoint accuracies (the reference driver's semantics,
        ``Trainer.py:107-117`` + ``main.py:62-68``)."""
        if self.early_stop:
            tm = None
            if fused:
                chunk = min(chunk or 8, epochs)
                done = 0
                while done < epochs:
                    n = min(chunk, epochs - done)
                    tm = self.train_epochs_fused(n)
                    for e in range(n):
                        done += 1
                        if verbose:
                            n_stop = int(tm["stopped"][e].sum())
                            print(
                                f"Epoch {done}: mean train loss "
                                f"{tm['loss'][e].mean():.4f} te_loss "
                                f"{tm['te_loss'][e].mean():.4f} "
                                f"stopped {n_stop}/{self.n_subjects}"
                            )
                    if bool(np.asarray(tm["stopped"][-1]).all()):
                        break
            else:
                for epoch in range(1, epochs + 1):
                    tm = self._host_es_epoch(epoch)
                    if verbose:
                        stopped = np.asarray(
                            jax.device_get(self.sched["stopped"])
                        )[: self.n_subjects]
                        print(
                            f"Epoch {epoch}: mean train loss "
                            f"{tm['loss'].mean():.4f} te_loss "
                            f"{tm['te_loss'].mean():.4f} "
                            f"stopped {int(stopped.sum())}/{self.n_subjects}"
                        )
                    if bool(np.asarray(
                            jax.device_get(self.sched["stopped"])).all()):
                        break
            if verbose:
                print(self.stop_report())
            ev = self.evaluate(best=True)
            final = self.evaluate()
            result = {
                "mean_arousal_acc": float(ev["a_acc"].mean()),
                "mean_valence_acc": float(ev["v_acc"].mean()),
                "per_subject_arousal": ev["a_acc"],
                "per_subject_valence": ev["v_acc"],
                "final_arousal_acc": float(final["a_acc"].mean()),
                "final_valence_acc": float(final["v_acc"].mean()),
                "stop_epochs": np.asarray(
                    jax.device_get(self.sched["stop_epoch"])
                )[: self.n_subjects],
            }
            if verbose:
                print(
                    f"LOSO mean (best checkpoints): arousal "
                    f"{result['mean_arousal_acc']:.2%} valence "
                    f"{result['mean_valence_acc']:.2%}"
                )
            return result
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
