"""Vectorized phased-curriculum LOSO: all subjects' curricula in one program.

The reference's *flagship* experiment is the 5-phase curriculum trained once
per held-out subject — 24 sequential ``MultiTaskTrainer.run(...)`` calls
(``main.py:62-68`` -> ``dataLoader/MultiTaskTrainer.py:556-673``). Every
LOSO split has identical shapes, and each subject's curriculum is fully
independent, so on TPU the natural formulation is the same one
:class:`.vloso.VectorizedLOSOTrainer` uses for the single-stage objective:
``vmap`` the whole phase program over the subject axis and run ALL
curricula simultaneously. One device call per curriculum phase trains
every subject's model through that phase (per-epoch masked-optimizer
re-init and per-epoch test evaluation fused in, exactly as
:meth:`.multitask.MultiTaskTrainer.run_phase_fused` does for one subject).

Per-subject semantics are identical to the sequential loop in parity mode
(``reset_optimizer_each_epoch=True`` — the reference's per-epoch optimizer
rebuild quirk, ``MultiTaskTrainer.py:181,237,293,351,412``), including the
phase-3 grad-mask/update-mask asymmetry and the constant per-phase LR that
the per-epoch scheduler rebuild implies. The equivalence test
(``tests/test_vphased.py``) pins each subject's final params against an
independent sequential :class:`.multitask.MultiTaskTrainer` run.

Unlike the round-2 sequential driver, each subject trains from its OWN
seed (``subject_seeds``, default ``seed + s``) — matching the reference,
where the torch global RNG advances between per-subject model
re-instantiations so every subject gets a fresh init (``main.py:66``).

Scaling out: pass a ``jax.sharding.Mesh`` and the subject axis of every
per-model tensor is sharded over it — embarrassingly parallel, zero
collectives, same design as vloso.

Schedule control (net-improvement path, OFF by default for parity): the
reference rebuilds its plateau scheduler every epoch so LR never decays,
and its per-phase ``early_stopping`` calls are commented out
(``MultiTaskTrainer.py:577,599``) — fixed epochs at constant LR IS the
faithful default here. ``reset_optimizer_each_epoch=False`` keeps Adam
moments across a phase's epochs and lets a per-subject plateau LR
actually fire (the same improvement path the sequential
:class:`.multitask.MultiTaskTrainer` documents), and ``early_stop=True``
enables the reference's dormant per-phase early stop — both run INSIDE
the fused phase scan as ``(S,)`` schedule lanes
(:func:`..utils.schedule.vector_schedule_step`), per-subject, exactly as
:class:`.vloso.VectorizedLOSOTrainer` does for the single-stage
experiment.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.pipeline import DeviceDataset, epoch_batch_indices
from ..data.splits import loso_split
from ..ops.losses import masked_accuracy, masked_cross_entropy
from ..utils.schedule import vector_schedule_init, vector_schedule_step
from .multitask import METRIC_KEYS, PHASES, make_phase_loss
from .state import (
    clip_by_global_norm,
    make_masked_adamw,
    module_mask,
    set_learning_rate,
    strong_typed,
    zero_masked_grads,
)

PHASE_ORDER = ("eeg", "eye", "pps", "fusion_arousal", "valence")


class VectorizedPhasedTrainer:
    """Trains the full 5-phase curriculum for every held-out subject at once.

    ``subject_seeds[s]`` drives subject ``s``'s init, dropout stream, and
    batch plans exactly as ``MultiTaskTrainer(seed=subject_seeds[s])``
    would, so the vectorized run is per-subject equivalent to the
    sequential loop (up to float accumulation order under vmap).

    ``rng_impl='rbg'`` switches the dropout streams to XLA
    RngBitGenerator keys (same mask distribution, cheaper bit generation —
    the perf mode; breaks bit-parity with the sequential trainer, which
    uses the default threefry).
    """

    def __init__(
        self,
        model,
        data: DeviceDataset,
        n_subjects: int,
        ex_nums: int = 20,
        lr: float = 1e-4,
        weight_decay: float = 1e-4,
        batch_size: int = 64,
        clip_norm: float = 1.0,
        seed: int = 42,
        subject_seeds: list[int] | None = None,
        rng_impl: str | None = None,
        compute_dtype: str | None = None,
        mesh: Mesh | None = None,
        verbose: bool = True,
        reset_optimizer_each_epoch: bool = True,
        early_stop: bool = False,
        es_patience: int = 5,
    ):
        self.model = model
        self.data = data
        self.n_subjects = n_subjects
        self.ex_nums = ex_nums
        self.lr = lr
        self.weight_decay = weight_decay
        self.batch_size = batch_size
        self.clip_norm = clip_norm
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.verbose = verbose
        self.rng_impl = rng_impl  # recorded for checkpoint key round-trips
        self.reset_optimizer_each_epoch = reset_optimizer_each_epoch
        self.early_stop = early_stop
        self.es_patience = es_patience
        # per-phase (S,) schedule lanes, created lazily at first run_phase
        self._phase_sched: dict[str, dict] = {}

        if mesh is not None:
            nd = int(mesh.devices.size)
            self.n_total = n_subjects + ((-n_subjects) % nd)
            axis = mesh.axis_names[0]
            self._shard = NamedSharding(mesh, P(axis))
        else:
            self.n_total = n_subjects
            self._shard = None

        if subject_seeds is None:
            # fresh init per subject (reference main.py:66: the torch
            # global RNG advances between per-subject re-instantiations)
            subject_seeds = [seed + s for s in range(n_subjects)]
        assert len(subject_seeds) == n_subjects
        # padding models (mesh rounding) duplicate subject s % n_subjects
        self.subject_seeds = [
            subject_seeds[s % n_subjects] for s in range(self.n_total)
        ]

        # per-subject LOSO index tables (identical shapes across subjects)
        self.train_idx = np.stack([
            loso_split(n_subjects, ex_nums, s % n_subjects)[0]
            for s in range(self.n_total)
        ])  # (S, n_train)
        self.test_idx = np.stack([
            loso_split(n_subjects, ex_nums, s % n_subjects)[1]
            for s in range(self.n_total)
        ])  # (S, ex_nums)

        # per-subject host RNGs: the same stream MultiTaskTrainer(seed=s_s)
        # consumes for its shuffled epoch plans
        self.host_rngs = [
            np.random.default_rng(s) for s in self.subject_seeds
        ]

        # per-subject init exactly as MultiTaskTrainer.__init__ derives it:
        # key(seed) -> split -> (init_key, dropout_seed)
        base_keys = jnp.stack(
            [jax.random.key(s) for s in self.subject_seeds]
        )
        split2 = jax.vmap(lambda k: tuple(jax.random.split(k)))
        init_keys, dropout_keys = split2(base_keys)
        if rng_impl == "rbg":
            dropout_keys = jnp.stack([
                jax.random.key(s + 1_000_003, impl="rbg")
                for s in self.subject_seeds
            ])

        sample = {k: v[:2] for k, v in data.arrays.items()}

        def init_one(ikey, dkey):
            variables = model.init(
                {"params": ikey, "dropout": dkey},
                sample["eeg"], sample["eye"], sample["pps"],
            )
            return variables["params"], variables.get("batch_stats", {})

        self.params, self.batch_stats = jax.vmap(init_one)(
            init_keys, dropout_keys
        )
        self.params = strong_typed(self.params)
        self.batch_stats = strong_typed(self.batch_stats)
        self.dropout_keys = dropout_keys

        if mesh is not None:
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, self._shard), t
            )
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.dropout_keys = jax.device_put(self.dropout_keys, self._shard)

        # static per-subject test plan (shuffle=False — identical order and
        # wrap-pad mask to DeviceDataset.epoch_plan on the subject subset)
        t_local, t_mask = epoch_batch_indices(
            ex_nums, batch_size, shuffle=False
        )
        self._test_plan_idx = jnp.asarray(
            self.test_idx[:, t_local]
        )  # (S, nb_t, B) global rows
        self._test_plan_mask = jnp.asarray(np.broadcast_to(
            t_mask, (self.n_total,) + t_mask.shape
        ).copy())
        if mesh is not None:
            self._test_plan_idx = jax.device_put(
                self._test_plan_idx, self._shard
            )
            self._test_plan_mask = jax.device_put(
                self._test_plan_mask, self._shard
            )

        self._phase_fns: dict[str, Callable] = {}
        self.metrics: dict[str, dict[str, list]] = {
            split: {k: [] for k in METRIC_KEYS} for split in ("train", "test")
        }
        self._last_test: dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------
    def _build_phase(self, phase: str) -> Callable:
        """One curriculum phase (E epochs, per-epoch optimizer re-init +
        test eval) for ONE subject; vmapped over the subject axis and
        jitted. Same per-subject math as
        :meth:`.multitask.MultiTaskTrainer._build_phase_fused`."""
        spec = PHASES[phase]
        update_mask = module_mask(self.params, spec.update_modules)
        grad_mask = module_mask(self.params, spec.grad_modules)
        tx = make_masked_adamw(update_mask, self.weight_decay)
        loss_fn = make_phase_loss(self.model, spec.loss, self.compute_dtype)
        clip_norm = self.clip_norm
        model = self.model
        arrays = self.data.arrays  # FULL dataset; plans carry global rows
        def train_step(carry, xs):
            params, batch_stats, opt_state, key = carry
            idx, bmask = xs
            batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
            batch["mask"] = bmask
            key, dk = jax.random.split(key)
            (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, batch, dk)
            grads = zero_masked_grads(grads, grad_mask)
            grads, _ = clip_by_global_norm(grads, clip_norm)
            grads = zero_masked_grads(grads, update_mask)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = zero_masked_grads(updates, update_mask)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, key), metrics

        def eval_step(params, batch_stats, idx, bmask):
            # evaluation always runs float32 (params are fp32 masters;
            # bf16 is a training-compute cast only)
            batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
            a, v, mask = batch["arousal"], batch["valence"], bmask
            eeg, eye, pps = batch["eeg"], batch["eye"], batch["pps"]
            arousal, valence, c1, c2, c3 = model.apply(
                {"params": params, "batch_stats": batch_stats},
                eeg, eye, pps, labels=(a, v, mask), train=False,
            )
            arousal = arousal.astype(jnp.float32)
            valence = valence.astype(jnp.float32)
            a_loss = masked_cross_entropy(arousal, a, mask)
            v_loss = masked_cross_entropy(valence, v, mask)
            n_valid = mask.sum()
            return {
                "loss": (a_loss + v_loss) * n_valid,
                "a_loss": a_loss * n_valid,
                "v_loss": v_loss * n_valid,
                "c_loss": (c1 + c2 + c3).astype(jnp.float32) * n_valid,
                "a_acc": masked_accuracy(arousal, a, mask) * n_valid,
                "v_acc": masked_accuracy(valence, v, mask) * n_valid,
                "n": n_valid,
            }

        # Schedule lanes inside the phase scan. Parity mode (defaults)
        # makes the transition a provable no-op: both patiences sit far
        # above any epoch count, so lr stays constant and no lane stops —
        # exactly the reference's rebuilt-every-epoch scheduler and
        # commented-out early stop. The improvement flags lower them.
        reset_opt = self.reset_optimizer_each_epoch
        plateau_pat = 10**9 if reset_opt else spec.sched_patience
        es_pat = self.es_patience if self.early_stop else 10**9
        sched_fac = spec.sched_factor

        def phase_one(params, batch_stats, key, sched, epoch0,
                      plan_idx, plan_mask, test_idx, test_mask):
            def epoch(carry, xs):
                params, batch_stats, key, opt_state, sched = carry
                idx_e, mask_e, eidx = xs
                active = ~sched["stopped"]
                if reset_opt:
                    # reference parity: fresh optimizer moments every epoch
                    opt_state = tx.init(params)
                opt_state = set_learning_rate(opt_state, sched["lr"])
                (new_params, new_bs, new_opt, key), ms = jax.lax.scan(
                    train_step, (params, batch_stats, opt_state, key),
                    (idx_e, mask_e),
                )
                # early-stopped subjects freeze (their sequential loop
                # would have broken out of this phase)
                sel = lambda n, o: jnp.where(active, n, o)
                params = jax.tree.map(sel, new_params, params)
                batch_stats = jax.tree.map(sel, new_bs, batch_stats)
                opt_state = jax.tree.map(sel, new_opt, opt_state)
                train_totals = jax.tree.map(jnp.sum, ms)
                _, ems = jax.lax.scan(
                    lambda _, xs2: (None, eval_step(
                        params, batch_stats, *xs2)),
                    None, (test_idx, test_mask),
                )
                test_totals = jax.tree.map(jnp.sum, ems)
                te_loss = test_totals["loss"] / jnp.maximum(
                    test_totals["n"], 1.0)
                sched, _ = vector_schedule_step(
                    sched, te_loss, eidx,
                    es_patience=es_pat, plateau_patience=plateau_pat,
                    plateau_factor=sched_fac,
                )
                hist = {"lr": sched["lr"], "stopped": sched["stopped"]}
                return (params, batch_stats, key, opt_state, sched), (
                    train_totals, test_totals, hist)

            opt0 = set_learning_rate(tx.init(params), sched["lr"])
            eidxs = epoch0 + 1 + jnp.arange(
                plan_idx.shape[0], dtype=jnp.int32)
            (params, batch_stats, key, _, sched), (tr, te, hist) = (
                jax.lax.scan(
                    epoch, (params, batch_stats, key, opt0, sched),
                    (plan_idx, plan_mask, eidxs),
                )
            )
            return params, batch_stats, key, sched, tr, te, hist

        fn = jax.vmap(phase_one)
        if self.mesh is None:
            return jax.jit(fn)
        s = self._shard
        return jax.jit(
            fn,
            in_shardings=(s,) * 9,
            out_shardings=(s,) * 7,
        )

    # ------------------------------------------------------------------
    def _phase_plans(self, epochs: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-subject, per-epoch shuffled batch plans in GLOBAL row ids,
        (S, E, nb, B) + masks — drawn from each subject's own host stream
        in the same order the sequential trainer draws them."""
        n_train = self.train_idx.shape[1]
        nb = -(-n_train // self.batch_size)
        idx = np.empty((self.n_total, epochs, nb, self.batch_size), np.int32)
        msk = np.empty_like(idx, np.float32)
        for s in range(self.n_total):
            for e in range(epochs):
                local, m = epoch_batch_indices(
                    n_train, self.batch_size, self.host_rngs[s], shuffle=True
                )
                idx[s, e] = self.train_idx[s][local]
                msk[s, e] = m
        ji, jm = jnp.asarray(idx), jnp.asarray(msk)
        if self.mesh is not None:
            ji = jax.device_put(ji, self._shard)
            jm = jax.device_put(jm, self._shard)
        return ji, jm

    def run_phase(self, phase: str, epochs: int) -> dict[str, np.ndarray]:
        """All subjects through one curriculum phase in one device call.
        Returns the final epoch's per-subject test metrics; appends
        per-epoch per-subject metric arrays to :attr:`metrics`."""
        if epochs <= 0:
            return {}
        if phase not in self._phase_fns:
            self._phase_fns[phase] = self._build_phase(phase)
        plan_idx, plan_mask = self._phase_plans(epochs)
        if phase not in self._phase_sched:
            sched = vector_schedule_init(self.n_total, self.lr)
            if self.mesh is not None:
                sched = jax.tree.map(
                    lambda x: jax.device_put(x, self._shard), sched
                )
            self._phase_sched[phase] = sched
            self._phase_epochs = getattr(self, "_phase_epochs", {})
            self._phase_epochs.setdefault(phase, 0)
        epoch0 = jnp.full(
            (self.n_total,), self._phase_epochs[phase], jnp.int32
        )
        if self.mesh is not None:
            epoch0 = jax.device_put(epoch0, self._shard)
        (self.params, self.batch_stats, self.dropout_keys,
         self._phase_sched[phase], tr, te, hist) = (
            self._phase_fns[phase](
                self.params, self.batch_stats, self.dropout_keys,
                self._phase_sched[phase], epoch0,
                plan_idx, plan_mask,
                self._test_plan_idx, self._test_plan_mask,
            )
        )
        self._phase_epochs[phase] += epochs
        self._last_hist = jax.device_get(hist)  # (S, E) lr + stopped lanes
        tr = jax.device_get(tr)  # dicts of (S, E)
        te = jax.device_get(te)
        tn = np.maximum(tr.pop("n"), 1.0)
        en = np.maximum(te.pop("n"), 1.0)
        for e in range(epochs):
            for k in METRIC_KEYS:
                self.metrics["train"][k].append(
                    (tr[k][:, e] / tn[:, e])[: self.n_subjects]
                )
                self.metrics["test"][k].append(
                    (te[k][:, e] / en[:, e])[: self.n_subjects]
                )
        if self.verbose:
            mt = {k: float(np.mean(self.metrics["train"][k][-1]))
                  for k in METRIC_KEYS}
            me = {k: float(np.mean(self.metrics["test"][k][-1]))
                  for k in METRIC_KEYS}
            print(
                f"[{phase}] {epochs} epochs x {self.n_subjects} subjects | "
                f"final mean train loss {mt['loss']:.4f} || test loss "
                f"{me['loss']:.4f} a_acc {me['a_acc']:.2%} "
                f"v_acc {me['v_acc']:.2%}"
            )
        self._last_test = {
            k: (te[k][:, -1] / en[:, -1])[: self.n_subjects]
            for k in METRIC_KEYS
        }
        return self._last_test

    def run(
        self,
        epochs_phase_eeg: int,
        epochs_phase_eye: int,
        epochs_phase_pps: int,
        epochs_phase2: int,
        epochs_phase3: int,
    ) -> dict[str, Any]:
        """Full curriculum for every subject (reference
        ``MultiTaskTrainer.run`` x 24, ``main.py:62-68``); one device call
        per phase. Returns per-subject + mean final test accuracies."""
        plan = dict(zip(PHASE_ORDER, (
            epochs_phase_eeg, epochs_phase_eye, epochs_phase_pps,
            epochs_phase2, epochs_phase3,
        )))
        for phase, epochs in plan.items():
            self.run_phase(phase, epochs)
        last = self._last_test
        if not last:  # all-zero-epoch curriculum
            nan = np.full((self.n_subjects,), np.nan)
            last = {k: nan for k in METRIC_KEYS}
        return {
            "mean_arousal_acc": float(np.mean(last["a_acc"])),
            "mean_valence_acc": float(np.mean(last["v_acc"])),
            "per_subject_arousal": last["a_acc"],
            "per_subject_valence": last["v_acc"],
        }

    # ------------------------------------------------------------------
    # phase-boundary checkpoint/resume (same convention as
    # MultiTaskTrainer.save_state; the optimizer state is rebuilt per
    # epoch inside the phase program — the reference's per-epoch-reset
    # quirk — so params/stats/RNG streams are the complete state).
    def _state_tree(self) -> dict:
        import json

        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "dropout_keys": jax.random.key_data(self.dropout_keys),
            "host": json.dumps({
                "rng_states": [r.bit_generator.state for r in self.host_rngs],
                "phase_epochs": getattr(self, "_phase_epochs", {}),
                "phase_sched": {
                    ph: {k: np.asarray(v).tolist() for k, v in sd.items()}
                    for ph, sd in self._phase_sched.items()
                },
                "metrics": {
                    split: {
                        k: [np.asarray(a).tolist() for a in v]
                        for k, v in d.items()
                    }
                    for split, d in self.metrics.items()
                },
                "last_test": {
                    k: np.asarray(v).tolist()
                    for k, v in self._last_test.items()
                },
            }),
        }

    def save_state(self, path: str) -> str:
        """Serialize all subjects' params, BN stats, dropout streams,
        per-subject host RNGs and metric history — resume the curriculum
        at any phase boundary."""
        from ..utils.checkpoint import save_checkpoint

        return save_checkpoint(path, self._state_tree())

    def restore_state(self, path: str) -> None:
        import json

        from ..utils.checkpoint import load_checkpoint

        tree = load_checkpoint(path, self._state_tree())
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        impl = "rbg" if self.rng_impl == "rbg" else "threefry2x32"
        self.dropout_keys = jax.random.wrap_key_data(
            tree["dropout_keys"], impl=impl
        )
        host = json.loads(tree["host"])
        self.host_rngs = []
        for st in host["rng_states"]:
            r = np.random.default_rng()
            r.bit_generator.state = st
            self.host_rngs.append(r)
        self._phase_epochs = dict(host.get("phase_epochs", {}))
        _sched_dtypes = {
            "lr": jnp.float32, "plateau_best": jnp.float32,
            "plateau_bad": jnp.int32, "es_best": jnp.float32,
            "es_counter": jnp.int32, "stopped": bool,
            "stop_epoch": jnp.int32,
        }
        self._phase_sched = {
            ph: {k: jnp.asarray(v, _sched_dtypes[k]) for k, v in sd.items()}
            for ph, sd in host.get("phase_sched", {}).items()
        }
        self.metrics = {
            split: {k: [np.asarray(a) for a in v] for k, v in d.items()}
            for split, d in host["metrics"].items()
        }
        self._last_test = {
            k: np.asarray(v) for k, v in host["last_test"].items()
        }
        if self.mesh is not None:  # re-place the subject shards
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, self._shard), t
            )
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.dropout_keys = jax.device_put(self.dropout_keys, self._shard)
            self._phase_sched = put(self._phase_sched)

    def stop_report(self, phase: str) -> str:
        """Per-subject stop-epoch lines for one phase (the vectorized analog
        of the reference's 'Early stopping triggered!' prints)."""
        sched = self._phase_sched[phase]
        stop = np.asarray(jax.device_get(sched["stop_epoch"]))
        stop = stop[: self.n_subjects]
        ran = self._phase_epochs.get(phase, 0)
        lines = [
            f"  subject {s}: "
            + (f"early-stopped at phase epoch {int(e)}" if e > 0
               else f"ran all {ran} phase epochs")
            for s, e in enumerate(stop)
        ]
        stopped = stop[stop > 0]
        return "\n".join(
            [f"[{phase}] early stopping: {stopped.size}/{stop.size} "
             f"subjects stopped"] + lines
        )

    def subject_variables(self, sid: int) -> dict:
        """Slice one subject's flax variables out of the stacked state
        (for Tester / checkpointing, matching the sequential driver)."""
        take = lambda t: jax.tree.map(lambda x: x[sid], t)
        return {
            "params": take(self.params),
            "batch_stats": take(self.batch_stats),
        }

    def save_checkpoints(self, checkpoint_dir: str) -> list[str]:
        """One checkpoint per subject, named exactly as the sequential
        driver names them (``TestPerson{sid}`` + final accs)."""
        from ..utils.checkpoint import (
            metrics_checkpoint_name,
            save_checkpoint,
        )

        paths = []
        for sid in range(self.n_subjects):
            name = metrics_checkpoint_name(
                f"TestPerson{sid}",
                {
                    "ArousalAcc": float(self._last_test["a_acc"][sid]),
                    "ValenceAcc": float(self._last_test["v_acc"][sid]),
                },
            )
            paths.append(save_checkpoint(
                f"{checkpoint_dir}/{name}", self.subject_variables(sid)
            ))
        return paths
