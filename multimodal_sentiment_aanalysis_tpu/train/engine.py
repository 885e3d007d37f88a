"""Single-task trainer.

TPU-native rebuild of reference ``Trainer.py:9-263``:

- AdamW(1e-4, weight_decay 0.01) over model params (``:19-21``)
- a TRAINER-level learnable contrastive weight in its own param group
  (``:24-26``) — separate from (and multiplied on top of) the model's
  internal ``contrastive_weight``
- loss = CE + contrastive_weight * contrastive (``:71``)
- NaN guards: non-finite logits are ``nan_to_num``-ed (``:63-65``); a
  non-finite loss skips the whole optimizer step (``:74-76``) — expressed as
  a ``jnp.where`` on the update inside jit
- grad-clip 1.0 (``:80``), ReduceLROnPlateau(min, patience 3, x0.5) on test
  loss (``:28``), early stop patience 5 with best-checkpoint save
  (``:107-117``), metrics-encoded final checkpoint name (``:261-262``)

Documented deviation: the reference ``Trainer`` expects a model returning
``(logits, contrastive_loss)``, which its own flagship model does not produce
(SURVEY.md §3.3 incompatibility). This engine is defined for the dual-head
model: ``CE = CE_arousal + CE_valence`` and the contrastive term is the sum
of the three per-modality losses.

TPU design: one jitted ``lax.scan`` per train epoch over the device-resident
dataset; the NaN skip is branchless (`jnp.where` select of old vs new
params/opt-state), so the whole epoch stays a single XLA program.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import DeviceDataset
from ..ops.losses import masked_accuracy, masked_cross_entropy
from ..utils.checkpoint import metrics_checkpoint_name, save_checkpoint
from ..utils.schedule import EarlyStopping, ReduceLROnPlateau
from .state import clip_by_global_norm, set_learning_rate, strong_typed


class Trainer:
    def __init__(
        self,
        model,
        train_data: DeviceDataset,
        test_data: DeviceDataset,
        lr: float = 1e-4,
        weight_decay: float = 0.01,
        batch_size: int = 64,
        clip_norm: float = 1.0,
        patience: int = 5,
        seed: int = 42,
        checkpoint_dir: str = ".",
        verbose: bool = True,
    ):
        self.model = model
        self.train_data = train_data
        self.test_data = test_data
        self.batch_size = batch_size
        self.clip_norm = clip_norm
        self.checkpoint_dir = checkpoint_dir
        self.verbose = verbose

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
        # trainer-level learnable contrastive weight joins the param tree in
        # its own subtree == its own torch param group (reference :24-26).
        # strong_typed: model.init leaves scalar params (temperature)
        # weak-typed, which would silently recompile the step on its
        # second call once the first compiled step returns strong types.
        self.params = strong_typed({
            "model": variables["params"],
            "trainer": {"contrastive_weight": jnp.ones((1,))},
        })
        self.batch_stats = strong_typed(variables.get("batch_stats", {}))

        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay
        )
        self.opt_state = strong_typed(self.tx.init(self.params))
        self.scheduler = ReduceLROnPlateau(lr=lr, patience=3, factor=0.5)
        self.early = EarlyStopping(patience=patience)

        self.train_loss: list[float] = []
        self.test_loss: list[float] = []
        self.train_acc: list[float] = []
        self.test_acc: list[float] = []

        self._train_epoch_fn = self._build_train_epoch()
        self._eval_fn = self._build_eval()

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch_stats, batch, key, train: bool):
        outs = self.model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            batch["eeg"],
            batch["eye"],
            batch["pps"],
            labels=(batch["arousal"], batch["valence"], batch["mask"]),
            train=train,
            mutable=["batch_stats"] if train else False,
            rngs={"dropout": key} if train else None,
        )
        if train:
            (arousal, valence, c1, c2, c3), mutated = outs
            new_bs = mutated["batch_stats"]
        else:
            arousal, valence, c1, c2, c3 = outs
            new_bs = batch_stats
        # NaN-output guard (reference :63-65)
        arousal = jnp.nan_to_num(arousal)
        valence = jnp.nan_to_num(valence)
        mask = batch["mask"]
        ce = masked_cross_entropy(arousal, batch["arousal"], mask) + \
            masked_cross_entropy(valence, batch["valence"], mask)
        contrastive = c1 + c2 + c3
        loss = ce + params["trainer"]["contrastive_weight"][0] * contrastive
        n_valid = mask.sum()
        metrics = {
            "loss": loss * n_valid,
            "ce_loss": ce * n_valid,
            "contrastive_loss": contrastive * n_valid,
            "a_acc": masked_accuracy(arousal, batch["arousal"], mask) * n_valid,
            "v_acc": masked_accuracy(valence, batch["valence"], mask) * n_valid,
            "n": n_valid,
        }
        return loss, (new_bs, metrics)

    def _build_train_epoch(self) -> Callable:
        tx = self.tx
        clip_norm = self.clip_norm
        loss_fn = lambda p, bs, b, k: self._loss_fn(p, bs, b, k, True)

        @jax.jit
        def train_epoch(params, batch_stats, opt_state, key, arrays, plan_idx, plan_mask):
            def step(carry, xs):
                params, batch_stats, opt_state, key = carry
                idx, bmask = xs
                batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
                batch["mask"] = bmask
                key, dk = jax.random.split(key)
                (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, batch, dk)
                grads, _ = clip_by_global_norm(grads, clip_norm)
                updates, new_opt = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                # NaN-loss skip-batch (reference :74-76), branchless
                ok = jnp.isfinite(loss)
                params = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old), new_params, params
                )
                opt_state = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old), new_opt, opt_state
                )
                batch_stats = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old), new_bs, batch_stats
                )
                metrics = jax.tree.map(lambda m: jnp.where(ok, m, 0.0), metrics)
                return (params, batch_stats, opt_state, key), metrics

            (params, batch_stats, opt_state, key), ms = jax.lax.scan(
                step, (params, batch_stats, opt_state, key), (plan_idx, plan_mask)
            )
            return params, batch_stats, opt_state, key, jax.tree.map(jnp.sum, ms)

        return train_epoch

    def _build_eval(self) -> Callable:
        loss_fn = lambda p, bs, b: self._loss_fn(p, bs, b, None, False)

        @jax.jit
        def eval_epoch(params, batch_stats, arrays, plan_idx, plan_mask):
            def step(_, xs):
                idx, bmask = xs
                batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
                batch["mask"] = bmask
                _, (_, metrics) = loss_fn(params, batch_stats, batch)
                return None, metrics

            _, ms = jax.lax.scan(step, None, (plan_idx, plan_mask))
            return jax.tree.map(jnp.sum, ms)

        return eval_epoch


    # ------------------------------------------------------------------
    # full-state checkpoint/resume (beyond the reference's params-only save)
    def _host_state(self) -> str:
        import dataclasses
        import json

        # JSON string leaf: flax msgpack restore requires static pytree
        # structure, which variable-length history lists would break
        return json.dumps({
            "rng_state": self.host_rng.bit_generator.state,
            "scheduler": dataclasses.asdict(self.scheduler),
            "early": dataclasses.asdict(self.early),
            "train_loss": list(self.train_loss),
            "test_loss": list(self.test_loss),
            "train_acc": list(self.train_acc),
            "test_acc": list(self.test_acc),
        })

    def save_state(self, path: str) -> str:
        """Serialize params, batch stats, optimizer state, RNG, scheduler and
        early-stop state so training resumes exactly (SURVEY.md §5 flags the
        reference as save-only)."""
        return save_checkpoint(
            path,
            {
                "params": self.params,
                "batch_stats": self.batch_stats,
                "opt_state": self.opt_state,
                "dropout_seed": jax.random.key_data(self.dropout_seed),
                "host": self._host_state(),
            },
        )

    def restore_state(self, path: str) -> None:
        from ..utils.checkpoint import load_checkpoint
        from ..utils.schedule import EarlyStopping, ReduceLROnPlateau

        target = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "dropout_seed": jax.random.key_data(self.dropout_seed),
            "host": self._host_state(),
        }
        tree = load_checkpoint(path, target)
        self.params = tree["params"]
        self.batch_stats = tree["batch_stats"]
        self.opt_state = tree["opt_state"]
        self.dropout_seed = jax.random.wrap_key_data(tree["dropout_seed"])
        import json

        host = json.loads(tree["host"])
        self.host_rng = np.random.default_rng()
        self.host_rng.bit_generator.state = host["rng_state"]
        self.scheduler = ReduceLROnPlateau(**host["scheduler"])
        self.early = EarlyStopping(**host["early"])
        self.train_loss = list(host["train_loss"])
        self.test_loss = list(host["test_loss"])
        self.train_acc = list(host["train_acc"])
        self.test_acc = list(host["test_acc"])

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> tuple[float, float, float, float]:
        plan_idx, plan_mask = self.train_data.epoch_plan(
            self.batch_size, self.host_rng, shuffle=True
        )
        (
            self.params,
            self.batch_stats,
            self.opt_state,
            self.dropout_seed,
            totals,
        ) = self._train_epoch_fn(
            self.params,
            self.batch_stats,
            self.opt_state,
            self.dropout_seed,
            self.train_data.arrays,
            plan_idx,
            plan_mask,
        )
        totals = jax.device_get(totals)
        n = max(float(totals["n"]), 1.0)
        avg_loss = float(totals["loss"]) / n
        avg_ce = float(totals["ce_loss"]) / n
        avg_con = float(totals["contrastive_loss"]) / n
        acc = float(totals["a_acc"]) / n
        self.train_loss.append(avg_loss)
        self.train_acc.append(acc)
        return avg_loss, avg_ce, avg_con, acc

    def _eval_metrics(self) -> tuple[float, float, float, float]:
        """(loss, ce, contrastive, arousal-acc) over the test set, per-sample
        means (documented deviation: the reference averages batch means
        unweighted, ``Trainer.py:233-238``; the tail batch here is masked)."""
        plan_idx, plan_mask = self.test_data.epoch_plan(self.batch_size, shuffle=False)
        totals = jax.device_get(
            self._eval_fn(
                self.params,
                self.batch_stats,
                self.test_data.arrays,
                plan_idx,
                plan_mask,
            )
        )
        n = max(float(totals["n"]), 1.0)
        return (
            float(totals["loss"]) / n,
            float(totals["ce_loss"]) / n,
            float(totals["contrastive_loss"]) / n,
            float(totals["a_acc"]) / n,
        )

    def test(self) -> tuple[float, float, float, float]:
        out = self._eval_metrics()
        self.test_loss.append(out[0])
        self.test_acc.append(out[3])
        return out

    def test_with_loaded_model(
        self, model_path: str, report: bool = False
    ) -> tuple[float, float, float, float]:
        """Load a model checkpoint and re-evaluate the test set (reference
        ``Trainer.py:192-243``): returns ``(avg_loss, avg_ce_loss,
        avg_contrastive_loss, acc)`` and prints the same summary line.

        The checkpoint holds model-only variables (what :meth:`run` saves,
        matching the reference's ``model.state_dict()`` which excludes the
        trainer-level contrastive weight). With ``report=True`` a per-class
        classification report is additionally printed via the
        :class:`~..eval.tester.Tester` (richer than the reference method).
        """
        from ..utils.checkpoint import load_checkpoint

        target = {"params": self.params["model"], "batch_stats": self.batch_stats}
        loaded = load_checkpoint(model_path, target)
        self.params = {**self.params, "model": loaded["params"]}
        self.batch_stats = loaded["batch_stats"]
        loss, ce, con, acc = self._eval_metrics()
        print(
            f"Test Loss: {loss:.4f}, CE Loss: {ce:.4f}, "
            f"Contrastive Loss: {con:.4f}, Acc: {acc:.4f}"
        )
        if report:
            from ..eval.tester import Tester

            Tester(
                self.model,
                self.test_data,
                variables={
                    "params": self.params["model"],
                    "batch_stats": self.batch_stats,
                },
            ).evaluate(verbose=True, plot_dir=self.checkpoint_dir)
        return loss, ce, con, acc

    def run(self, epochs: int, test_person: int) -> None:
        for epoch in range(1, epochs + 1):
            tr = self.train_epoch(epoch)
            te = self.test()
            if np.isfinite(te[0]):
                new_lr = self.scheduler.step(te[0])
                self.opt_state = set_learning_rate(self.opt_state, new_lr)
            if self.verbose:
                print(
                    f"Epoch {epoch}: Train loss {tr[0]:.4f} CE {tr[1]:.4f} "
                    f"Con {tr[2]:.4f} Acc {tr[3]:.4f} | Test loss {te[0]:.4f} "
                    f"CE {te[1]:.4f} Con {te[2]:.4f} Acc {te[3]:.4f}"
                )
            if self.early.step(te[0]):
                # model-only variables (Tester-loadable); the trainer-level
                # contrastive weight is a separate param group exactly like
                # the reference, whose model.state_dict() excludes it
                save_checkpoint(
                    f"{self.checkpoint_dir}/best_model.msgpack",
                    {"params": self.params["model"],
                     "batch_stats": self.batch_stats},
                )
            if self.early.should_stop:
                if self.verbose:
                    print(f"Early stopping triggered at epoch {epoch}")
                name = metrics_checkpoint_name(
                    f"TestPerson{test_person}_epoch{epoch}",
                    {
                        "TrainLoss": tr[0],
                        "TrainAcc": tr[3],
                        "TestLoss": te[0],
                        "TestAcc": te[3],
                    },
                )
                save_checkpoint(
                    f"{self.checkpoint_dir}/{name}",
                    {"params": self.params["model"],
                     "batch_stats": self.batch_stats},
                )
                break
