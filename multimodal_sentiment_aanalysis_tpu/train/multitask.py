"""Phased multi-task trainer (the flagship training engine).

TPU-native rebuild of reference ``dataLoader/MultiTaskTrainer.py:10-673``:
the 5-phase curriculum ``run(eEEG, eEYE, ePPS, e2, e3)`` where

- phases 1a/1b/1c train each modality encoder alone on its own contrastive
  loss (full freeze/unfreeze, reference ``:50-113,179-345``)
- phase 2 unfreezes encoders + fusion + arousal head and trains CE-arousal
  only (``:115-145,347-406``)
- phase 3 unfreezes the fusion modules + valence head but the optimizer
  covers the valence head ONLY (``:147-177,408-467``) — reproduced via the
  separate grad-mask (clip-norm set) vs update-mask (optimizer coverage)
- per-phase AdamW(1e-4, wd 1e-4), grad-clip 1.0 everywhere
  (``:205,261,317,378,439``)
- evaluation after every epoch computes both CE losses + contrastive losses
  + both accuracies (``:469-515``)

Reference quirk preserved behind a flag: the reference rebuilds optimizer AND
plateau scheduler from scratch inside every ``train_epoch_phase*`` call
(``:181,237,293,351,412``), so Adam moments reset each epoch and the
scheduler never accumulates patience (LR stays constant).
``reset_optimizer_each_epoch=True`` (default) keeps that behavior for
parity; ``False`` keeps moments and lets ReduceLROnPlateau actually fire —
the documented improvement path.

TPU design: a whole phase-epoch is ONE jitted ``lax.scan`` over the static
epoch index plan — batch gather (``jnp.take`` from the device-resident
arrays), forward, backward, clip, masked update, metric accumulation all
fuse into a single XLA program. The host only shuffles indices and steps
schedulers; there are no per-batch host->device copies or ``.item()`` syncs
(the reference pays both per batch, ``MultiTaskTrainer.py:187-216``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import DeviceDataset
from ..ops.losses import masked_accuracy, masked_cross_entropy
from ..utils.checkpoint import metrics_checkpoint_name, save_checkpoint
from ..utils.schedule import ReduceLROnPlateau
from .state import (
    cast_floating,
    clip_by_global_norm,
    make_masked_adamw,
    module_mask,
    set_learning_rate,
    strong_typed,
    zero_masked_grads,
)

ENCODER_MODULES = {"eeg_net", "eye_net", "pps_net"}
FUSION_MODULES = {
    "cross_attn_e2p",
    "cross_attn_p2e",
    "attn_w1",
    "attn_w2",
    "fusion_stack",
}


@dataclass(frozen=True)
class PhaseSpec:
    loss: str  # 'c_eeg' | 'c_eye' | 'c_pps' | 'ce_arousal' | 'ce_valence'
    grad_modules: frozenset[str]  # requires-grad set (enters clip norm)
    update_modules: frozenset[str]  # optimizer coverage set
    sched_patience: int
    sched_factor: float


PHASES: dict[str, PhaseSpec] = {
    "eeg": PhaseSpec("c_eeg", frozenset({"eeg_net"}), frozenset({"eeg_net"}), 3, 0.5),
    "eye": PhaseSpec("c_eye", frozenset({"eye_net"}), frozenset({"eye_net"}), 3, 0.5),
    "pps": PhaseSpec("c_pps", frozenset({"pps_net"}), frozenset({"pps_net"}), 3, 0.5),
    "fusion_arousal": PhaseSpec(
        "ce_arousal",
        frozenset(ENCODER_MODULES | FUSION_MODULES | {"arousal_head"}),
        frozenset(ENCODER_MODULES | FUSION_MODULES | {"arousal_head"}),
        2,
        0.2,
    ),
    "valence": PhaseSpec(
        "ce_valence",
        frozenset(FUSION_MODULES | {"valence_head"}),
        frozenset({"valence_head"}),  # optimizer covers valence head only
        2,
        0.1,
    ),
}

METRIC_KEYS = ("loss", "a_loss", "v_loss", "c_loss", "a_acc", "v_acc")


def make_phase_loss(model, phase_loss: str, compute_dtype=None) -> Callable:
    """Loss + metrics closure for one curriculum phase.

    ``phase_loss`` picks which term trains (reference
    ``MultiTaskTrainer.py:179-467`` — each phase backpropagates exactly one
    loss). With ``compute_dtype`` set (e.g. ``'bfloat16'``), params and
    inputs are cast for the forward/backward while losses, metrics, and
    BatchNorm running stats stay float32 (same mixed-precision discipline
    as :class:`.vloso.VectorizedLOSOTrainer`).
    """

    def loss_fn(params, batch_stats, batch, key):
        eeg, eye, pps = batch["eeg"], batch["eye"], batch["pps"]
        a, v, mask = batch["arousal"], batch["valence"], batch["mask"]
        if compute_dtype is not None:
            dt = jnp.dtype(compute_dtype)
            params = cast_floating(params, dt)
            eeg, eye, pps = (x.astype(dt) for x in (eeg, eye, pps))
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            eeg,
            eye,
            pps,
            labels=(a, v, mask),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        arousal, valence, c1, c2, c3 = outs
        if compute_dtype is not None:
            arousal = arousal.astype(jnp.float32)
            valence = valence.astype(jnp.float32)
            c1, c2, c3 = (x.astype(jnp.float32) for x in (c1, c2, c3))
        a_loss = masked_cross_entropy(arousal, a, mask)
        v_loss = masked_cross_entropy(valence, v, mask)
        losses = {
            "c_eeg": c1,
            "c_eye": c2,
            "c_pps": c3,
            "ce_arousal": a_loss,
            "ce_valence": v_loss,
        }
        loss = losses[phase_loss]
        n_valid = mask.sum()
        metrics = {
            "loss": loss * n_valid,
            "a_loss": (a_loss if phase_loss == "ce_arousal" else 0.0) * n_valid,
            "v_loss": (v_loss if phase_loss == "ce_valence" else 0.0) * n_valid,
            "c_loss": (
                losses[phase_loss] if phase_loss.startswith("c_") else 0.0
            )
            * n_valid,
            "a_acc": masked_accuracy(arousal, a, mask) * n_valid,
            "v_acc": masked_accuracy(valence, v, mask) * n_valid,
            "n": n_valid,
        }
        new_bs = mutated["batch_stats"]
        if compute_dtype is not None:
            new_bs = cast_floating(new_bs, jnp.float32)
        return loss, (new_bs, metrics)

    return loss_fn


class MultiTaskTrainer:
    """Phased curriculum trainer over device-resident data."""

    def __init__(
        self,
        model,
        train_data: DeviceDataset,
        test_data: DeviceDataset,
        test_person: int = -1,
        lr: float = 1e-4,
        weight_decay: float = 1e-4,
        batch_size: int = 64,
        clip_norm: float = 1.0,
        reset_optimizer_each_epoch: bool = True,
        fused_phases: bool = False,
        seed: int = 42,
        checkpoint_dir: str = ".",
        verbose: bool = True,
        mesh=None,
    ):
        self.model = model
        self.train_data = train_data
        self.test_data = test_data
        self.test_person = test_person
        self.lr = lr
        self.weight_decay = weight_decay
        self.batch_size = batch_size
        self.clip_norm = clip_norm
        self.reset_optimizer_each_epoch = reset_optimizer_each_epoch
        # fuse whole phases into one device call (parity mode only; see
        # run_phase_fused) — same math, minus per-epoch RPC latency
        self.fused_phases = fused_phases and reset_optimizer_each_epoch
        self.checkpoint_dir = checkpoint_dir
        self.verbose = verbose
        # batch-DP (net-new vs the single-device reference): with a mesh,
        # every gathered batch gets a sharding constraint over the mesh's
        # first axis and XLA partitions the step over the batch rows,
        # inserting the gradient/BN-stat collectives (GSPMD flavor of
        # parallel/dp.py). Params stay replicated; 1 device degenerates
        # to the single-chip program. Equivalence pinned in
        # tests/test_parallel.py.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._batch_shard = NamedSharding(
                mesh, PartitionSpec(mesh.axis_names[0])
            )
        else:
            self._batch_shard = None

        self.host_rng = np.random.default_rng(seed)
        key = jax.random.key(seed)
        init_key, self.dropout_seed = jax.random.split(key)

        sample = {k: v[:2] for k, v in train_data.arrays.items()}
        variables = model.init(
            {"params": init_key, "dropout": self.dropout_seed},
            sample["eeg"],
            sample["eye"],
            sample["pps"],
        )
        # model.init leaves scalar params (temperature) weak-typed; the
        # first compiled epoch returns them strong-typed, which would
        # change the jit signature and silently recompile every phase
        # program on its SECOND call (tens of seconds each on TPU)
        self.params = strong_typed(variables["params"])
        self.batch_stats = strong_typed(variables.get("batch_stats", {}))

        # per-phase optimizer transforms + compiled epoch functions
        self._tx: dict[str, optax.GradientTransformation] = {}
        self._train_epoch_fn: dict[str, Callable] = {}
        self._phase_fused_fn: dict[str, Callable] = {}
        self._opt_state: dict[str, Any] = {}
        self._eval_fn = None

        self.metrics = {
            split: {k: [] for k in METRIC_KEYS} for split in ("train", "test", "val")
        }
        self.schedulers: dict[str, ReduceLROnPlateau] = {}

    # ------------------------------------------------------------------
    def reset(
        self,
        train_data: DeviceDataset,
        test_data: DeviceDataset,
        test_person: int = -1,
        seed: int = 42,
    ) -> None:
        """Re-initialize params/optimizers/metrics for a new LOSO subject while
        KEEPING the compiled phase-epoch functions.

        The LOSO outer loop re-instantiates the model per subject in the
        reference (``main.py:62-68``); here the array shapes are identical
        across subjects, so the jitted epoch programs are reused and each
        subject costs zero recompilation.
        """
        self.train_data = train_data
        self.test_data = test_data
        self.test_person = test_person
        self.host_rng = np.random.default_rng(seed)
        key = jax.random.key(seed)
        init_key, self.dropout_seed = jax.random.split(key)
        sample = {k: v[:2] for k, v in train_data.arrays.items()}
        variables = self.model.init(
            {"params": init_key, "dropout": self.dropout_seed},
            sample["eeg"],
            sample["eye"],
            sample["pps"],
        )
        self.params = strong_typed(variables["params"])  # see __init__ note
        self.batch_stats = strong_typed(variables.get("batch_stats", {}))
        self._opt_state = {}
        self.schedulers = {}
        self.metrics = {
            split: {k: [] for k in METRIC_KEYS} for split in ("train", "test", "val")
        }

    def _shard_batch(self, batch: dict) -> dict:
        """Annotate batch rows as sharded over the mesh (no-op off-mesh)."""
        if self._batch_shard is None:
            return batch
        return {
            k: jax.lax.with_sharding_constraint(v, self._batch_shard)
            for k, v in batch.items()
        }

    def _phase_tx(self, phase: str) -> optax.GradientTransformation:
        if phase not in self._tx:
            spec = PHASES[phase]
            update_mask = module_mask(self.params, spec.update_modules)
            self._tx[phase] = make_masked_adamw(update_mask, self.weight_decay)
        return self._tx[phase]

    def _loss_and_metrics(self, phase_loss: str):
        model = self.model

        def loss_fn(params, batch_stats, batch, key):
            eeg, eye, pps = batch["eeg"], batch["eye"], batch["pps"]
            a, v, mask = batch["arousal"], batch["valence"], batch["mask"]
            outs, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                eeg,
                eye,
                pps,
                labels=(a, v, mask),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            arousal, valence, c1, c2, c3 = outs
            a_loss = masked_cross_entropy(arousal, a, mask)
            v_loss = masked_cross_entropy(valence, v, mask)
            losses = {
                "c_eeg": c1,
                "c_eye": c2,
                "c_pps": c3,
                "ce_arousal": a_loss,
                "ce_valence": v_loss,
            }
            loss = losses[phase_loss]
            n_valid = mask.sum()
            metrics = {
                "loss": loss * n_valid,
                "a_loss": (a_loss if phase_loss == "ce_arousal" else 0.0) * n_valid,
                "v_loss": (v_loss if phase_loss == "ce_valence" else 0.0) * n_valid,
                "c_loss": (
                    losses[phase_loss] if phase_loss.startswith("c_") else 0.0
                )
                * n_valid,
                "a_acc": masked_accuracy(arousal, a, mask) * n_valid,
                "v_acc": masked_accuracy(valence, v, mask) * n_valid,
                "n": n_valid,
            }
            return loss, (mutated["batch_stats"], metrics)

        return loss_fn

    def _build_train_epoch(self, phase: str) -> Callable:
        spec = PHASES[phase]
        tx = self._phase_tx(phase)
        grad_mask = module_mask(self.params, spec.grad_modules)
        update_mask = module_mask(self.params, spec.update_modules)
        loss_fn = self._loss_and_metrics(spec.loss)
        clip_norm = self.clip_norm

        @jax.jit
        def train_epoch(params, batch_stats, opt_state, key, arrays, plan_idx, plan_mask):
            def step(carry, xs):
                params, batch_stats, opt_state, key = carry
                idx, bmask = xs
                batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
                batch["mask"] = bmask
                batch = self._shard_batch(batch)  # batch-DP (no-op off-mesh)
                key, dk = jax.random.split(key)
                (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, batch, dk)
                grads = zero_masked_grads(grads, grad_mask)
                # clip over the requires-grad set (torch clip_grad_norm_ parity)
                grads, _ = clip_by_global_norm(grads, clip_norm)
                # optax.masked passes unmasked grads through as raw updates;
                # zero them so only the optimizer's coverage set moves
                grads = zero_masked_grads(grads, update_mask)
                updates, opt_state = tx.update(grads, opt_state, params)
                updates = zero_masked_grads(updates, update_mask)
                params = optax.apply_updates(params, updates)
                return (params, new_bs, opt_state, key), metrics

            (params, batch_stats, opt_state, key), ms = jax.lax.scan(
                step, (params, batch_stats, opt_state, key), (plan_idx, plan_mask)
            )
            totals = jax.tree.map(jnp.sum, ms)
            return params, batch_stats, opt_state, key, totals

        return train_epoch

    def _build_eval(self) -> Callable:
        model = self.model

        @jax.jit
        def eval_epoch(params, batch_stats, arrays, plan_idx, plan_mask):
            def step(_, xs):
                idx, bmask = xs
                batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
                batch = self._shard_batch(batch)
                a, v, mask = batch["arousal"], batch["valence"], bmask
                outs = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch["eeg"],
                    batch["eye"],
                    batch["pps"],
                    labels=(a, v, mask),
                    train=False,
                )
                arousal, valence, c1, c2, c3 = outs
                a_loss = masked_cross_entropy(arousal, a, mask)
                v_loss = masked_cross_entropy(valence, v, mask)
                n_valid = mask.sum()
                metrics = {
                    "loss": (a_loss + v_loss) * n_valid,
                    "a_loss": a_loss * n_valid,
                    "v_loss": v_loss * n_valid,
                    "c_loss": (c1 + c2 + c3) * n_valid,
                    "a_acc": masked_accuracy(arousal, a, mask) * n_valid,
                    "v_acc": masked_accuracy(valence, v, mask) * n_valid,
                    "n": n_valid,
                }
                return None, metrics

            _, ms = jax.lax.scan(step, None, (plan_idx, plan_mask))
            return jax.tree.map(jnp.sum, ms)

        return eval_epoch

    def _build_phase_fused(self, phase: str) -> Callable:
        """A whole fixed-epoch phase as ONE jitted program.

        Exactly the parity-mode (``reset_optimizer_each_epoch=True``)
        semantics of :meth:`_run_phase`'s host loop — per-epoch optimizer
        re-init happens IN-program (``tx.init`` inside the epoch scan),
        the per-epoch test evaluation is fused in, and the dropout key
        threads through epochs just as the per-epoch calls thread it —
        but with 1 device round-trip per phase instead of 2 per epoch.
        Over the remote-TPU tunnel the per-call latency dominates the
        per-epoch path (~1 s/epoch of RPC for ~50 ms of device work), so
        this is the difference between ~450 and several thousand
        samples/s on the reference's flagship workload
        (``MultiTaskTrainer.py:556-673``).
        """
        spec = PHASES[phase]
        tx = self._phase_tx(phase)
        grad_mask = module_mask(self.params, spec.grad_modules)
        update_mask = module_mask(self.params, spec.update_modules)
        loss_fn = self._loss_and_metrics(spec.loss)
        clip_norm = self.clip_norm
        model = self.model

        @jax.jit
        def phase_fused(params, batch_stats, key, lr, arrays, test_arrays,
                        plan_idx, plan_mask, test_idx, test_mask):
            def train_step(carry, xs):
                params, batch_stats, opt_state, key = carry
                idx, bmask = xs
                batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
                batch["mask"] = bmask
                batch = self._shard_batch(batch)  # batch-DP (no-op off-mesh)
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
                batch = {k: jnp.take(v, idx, axis=0)
                         for k, v in test_arrays.items()}
                batch = self._shard_batch(batch)
                a, v, mask = batch["arousal"], batch["valence"], bmask
                arousal, valence, c1, c2, c3 = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch["eeg"], batch["eye"], batch["pps"],
                    labels=(a, v, mask), train=False,
                )
                a_loss = masked_cross_entropy(arousal, a, mask)
                v_loss = masked_cross_entropy(valence, v, mask)
                n_valid = mask.sum()
                return {
                    "loss": (a_loss + v_loss) * n_valid,
                    "a_loss": a_loss * n_valid,
                    "v_loss": v_loss * n_valid,
                    "c_loss": (c1 + c2 + c3) * n_valid,
                    "a_acc": masked_accuracy(arousal, a, mask) * n_valid,
                    "v_acc": masked_accuracy(valence, v, mask) * n_valid,
                    "n": n_valid,
                }

            def epoch(carry, xs):
                params, batch_stats, key = carry
                idx_e, mask_e = xs
                # reference parity: fresh optimizer moments every epoch
                opt_state = set_learning_rate(tx.init(params), lr)
                (params, batch_stats, _, key), ms = jax.lax.scan(
                    train_step, (params, batch_stats, opt_state, key),
                    (idx_e, mask_e),
                )
                train_totals = jax.tree.map(jnp.sum, ms)
                _, ems = jax.lax.scan(
                    lambda _, xs2: (None, eval_step(params, batch_stats, *xs2)),
                    None, (test_idx, test_mask),
                )
                test_totals = jax.tree.map(jnp.sum, ems)
                return (params, batch_stats, key), (train_totals, test_totals)

            (params, batch_stats, key), (tr, te) = jax.lax.scan(
                epoch, (params, batch_stats, key), (plan_idx, plan_mask)
            )
            return params, batch_stats, key, tr, te

        return phase_fused

    def run_phase_fused(self, phase: str, epochs: int) -> dict[str, float]:
        """Train + evaluate ``epochs`` epochs of ``phase`` in one device
        call; appends the same per-epoch train/test metrics the host loop
        would. Requires parity mode (per-epoch optimizer reset) — with
        ``reset_optimizer_each_epoch=False`` the plateau scheduler feeds
        device results back into the next epoch's LR, a genuine host
        decision the fused program cannot take."""
        if not self.reset_optimizer_each_epoch:
            raise ValueError(
                "run_phase_fused requires reset_optimizer_each_epoch=True; "
                "the --no-reset-optimizer improvement path needs the "
                "per-epoch host loop for scheduler feedback"
            )
        if epochs <= 0:
            # match the host loop: a 0-epoch phase is a no-op (no plans,
            # no scheduler reset); jnp.stack over an empty plan list would
            # raise otherwise
            return {}
        if phase not in self._phase_fused_fn:
            self._phase_fused_fn[phase] = self._build_phase_fused(phase)
        spec = PHASES[phase]
        lr = self.schedulers[phase].lr if phase in self.schedulers else self.lr

        plans = [
            self.train_data.epoch_plan(self.batch_size, self.host_rng,
                                       shuffle=True)
            for _ in range(epochs)
        ]
        plan_idx = jnp.stack([p[0] for p in plans])
        plan_mask = jnp.stack([p[1] for p in plans])
        test_idx, test_mask = self.test_data.epoch_plan(
            self.batch_size, shuffle=False
        )

        (self.params, self.batch_stats, self.dropout_seed, tr, te) = (
            self._phase_fused_fn[phase](
                self.params, self.batch_stats, self.dropout_seed,
                strong_typed(jnp.asarray(lr, jnp.float32)),
                self.train_data.arrays, self.test_data.arrays,
                plan_idx, plan_mask, test_idx, test_mask,
            )
        )
        tr = jax.device_get(tr)
        te = jax.device_get(te)
        last_test: dict[str, float] = {}
        for e in range(epochs):
            tn, en = float(tr["n"][e]), float(te["n"][e])
            train_m = {k: float(tr[k][e]) / tn for k in METRIC_KEYS}
            test_m = {k: float(te[k][e]) / en for k in METRIC_KEYS}
            for k in METRIC_KEYS:
                self.metrics["train"][k].append(train_m[k])
                self.metrics["test"][k].append(test_m[k])
            if self.verbose:
                print(
                    f"Epoch {e + 1} | train loss {train_m['loss']:.4f} "
                    f"a_acc {train_m['a_acc']:.2%} v_acc {train_m['v_acc']:.2%} "
                    f"c_loss {train_m['c_loss']:.4f} || test loss "
                    f"{test_m['loss']:.4f} a_acc {test_m['a_acc']:.2%} "
                    f"v_acc {test_m['v_acc']:.2%}"
                )
            last_test = test_m
        # host-loop scheduler parity: recreated at the last epoch's start,
        # then stepped once on that epoch's test loss
        if epochs > 0:
            self.schedulers[phase] = ReduceLROnPlateau(
                lr=lr, patience=spec.sched_patience, factor=spec.sched_factor
            )
            self.schedulers[phase].step(last_test["loss"])
        return last_test

    # ------------------------------------------------------------------
    # phase-boundary checkpoint/resume (params + BN stats + host control
    # state; per-phase optimizer moments rebuild on the next epoch, which
    # matches the reference's per-epoch optimizer reset, :181 et seq.)
    def save_state(self, path: str) -> str:
        import dataclasses
        import json

        host = json.dumps({
            "rng_state": self.host_rng.bit_generator.state,
            "schedulers": {
                k: dataclasses.asdict(v) for k, v in self.schedulers.items()
            },
            "metrics": self.metrics,
            "test_person": self.test_person,
        })
        return save_checkpoint(path, {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "dropout_seed": jax.random.key_data(self.dropout_seed),
            "host": host,
        })

    def restore_state(self, path: str) -> None:
        import json

        from ..utils.checkpoint import load_checkpoint

        target = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "dropout_seed": jax.random.key_data(self.dropout_seed),
            "host": "",
        }
        tree = load_checkpoint(path, target)
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        self.dropout_seed = jax.random.wrap_key_data(tree["dropout_seed"])
        host = json.loads(tree["host"])
        self.host_rng = np.random.default_rng()
        self.host_rng.bit_generator.state = host["rng_state"]
        self.schedulers = {
            k: ReduceLROnPlateau(**v) for k, v in host["schedulers"].items()
        }
        self.metrics = host["metrics"]
        self.test_person = host["test_person"]
        self._opt_state = {}

    # ------------------------------------------------------------------
    def train_epoch_phase(self, phase: str) -> dict[str, float]:
        """One training epoch of the given phase; records train metrics."""
        if phase not in self._train_epoch_fn:
            self._train_epoch_fn[phase] = self._build_train_epoch(phase)
        tx = self._phase_tx(phase)

        if self.reset_optimizer_each_epoch or phase not in self._opt_state:
            opt_state = strong_typed(tx.init(self.params))
            opt_state = set_learning_rate(
                opt_state, self.schedulers[phase].lr if phase in self.schedulers else self.lr
            )
            self._opt_state[phase] = opt_state

        plan_idx, plan_mask = self.train_data.epoch_plan(
            self.batch_size, self.host_rng, shuffle=True
        )
        (
            self.params,
            self.batch_stats,
            self._opt_state[phase],
            self.dropout_seed,
            totals,
        ) = self._train_epoch_fn[phase](
            self.params,
            self.batch_stats,
            self._opt_state[phase],
            self.dropout_seed,
            self.train_data.arrays,
            plan_idx,
            plan_mask,
        )
        totals = jax.device_get(totals)
        n = float(totals.pop("n"))
        out = {k: float(v) / n for k, v in totals.items()}
        for k in METRIC_KEYS:
            self.metrics["train"][k].append(out[k])
        return out

    def evaluate(self, mode: str = "test") -> dict[str, float]:
        if self._eval_fn is None:
            self._eval_fn = self._build_eval()
        data = self.test_data
        plan_idx, plan_mask = data.epoch_plan(self.batch_size, shuffle=False)
        totals = jax.device_get(
            self._eval_fn(
                self.params, self.batch_stats, data.arrays, plan_idx, plan_mask
            )
        )
        n = float(totals.pop("n"))
        out = {k: float(v) / n for k, v in totals.items()}
        for k in METRIC_KEYS:
            self.metrics[mode][k].append(out[k])
        return out

    # ------------------------------------------------------------------
    def _run_phase(self, phase: str, epochs: int, title: str):
        spec = PHASES[phase]
        last_test: dict[str, float] = {}
        if self.verbose:
            print(title)
        if self.fused_phases:
            return self.run_phase_fused(phase, epochs)
        for epoch in range(1, epochs + 1):
            if self.reset_optimizer_each_epoch or phase not in self.schedulers:
                # reference parity: scheduler recreated every epoch too
                self.schedulers[phase] = ReduceLROnPlateau(
                    lr=self.schedulers[phase].lr if phase in self.schedulers else self.lr,
                    patience=spec.sched_patience,
                    factor=spec.sched_factor,
                )
            train_m = self.train_epoch_phase(phase)
            test_m = self.evaluate()
            new_lr = self.schedulers[phase].step(test_m["loss"])
            if not self.reset_optimizer_each_epoch:
                self._opt_state[phase] = set_learning_rate(
                    self._opt_state[phase], new_lr
                )
            if self.verbose:
                print(
                    f"Epoch {epoch} | train loss {train_m['loss']:.4f} "
                    f"a_acc {train_m['a_acc']:.2%} v_acc {train_m['v_acc']:.2%} "
                    f"c_loss {train_m['c_loss']:.4f} || test loss "
                    f"{test_m['loss']:.4f} a_acc {test_m['a_acc']:.2%} "
                    f"v_acc {test_m['v_acc']:.2%}"
                )
            last_test = test_m
        return last_test

    def run(
        self,
        epochs_phase_eeg: int,
        epochs_phase_eye: int,
        epochs_phase_pps: int,
        epochs_phase2: int,
        epochs_phase3: int,
        save: bool = True,
        plot: bool = True,
    ) -> dict[str, float]:
        """Full curriculum (reference ``MultiTaskTrainer.run``, ``:556-673``)."""
        test_m: dict[str, float] = {}
        for phase, epochs, title in (
            ("eeg", epochs_phase_eeg,
             "Phase EEGnet: contrastive training of the EEG encoder"),
            ("eye", epochs_phase_eye,
             "Phase EYEnet: contrastive training of the eye encoder"),
            ("pps", epochs_phase_pps,
             "Phase PPSnet: contrastive training of the PPS encoder"),
            ("fusion_arousal", epochs_phase2,
             "Phase 2: fusion modules + arousal head (CE-arousal)"),
            ("valence", epochs_phase3,
             "Phase 3: valence head (CE-valence)"),
        ):
            # a 0-epoch phase is a no-op; keep the last phase that RAN so
            # the returned test metrics are never empty mid-curriculum
            test_m = self._run_phase(phase, epochs, title) or test_m

        if save:
            name = metrics_checkpoint_name(
                f"TestPerson{self.test_person}",
                {
                    "ArousalAcc": test_m.get("a_acc", 0.0),
                    "ValenceAcc": test_m.get("v_acc", 0.0),
                },
            )
            save_checkpoint(
                f"{self.checkpoint_dir}/{name}",
                {"params": self.params, "batch_stats": self.batch_stats},
            )
        if plot:
            from ..eval.reporting import plot_progress

            plot_progress(
                self.metrics,
                f"{self.checkpoint_dir}/TestPerson{self.test_person}_progress.png",
            )
        return test_m
