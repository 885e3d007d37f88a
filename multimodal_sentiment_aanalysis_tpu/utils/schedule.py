"""Training control: plateau LR schedule and early stopping.

Two forms of the same semantics:

- Host dataclasses (:class:`ReduceLROnPlateau`, :class:`EarlyStopping`) for
  the sequential trainers — host loop state, not jitted; LR enters the
  jitted step as a traced scalar, so changing it never recompiles.
- A branchless vectorized transition (:func:`vector_schedule_init` /
  :func:`vector_schedule_step`) for the fused vectorized trainers, where
  all subjects' schedules advance inside ONE jitted ``lax.scan`` over
  epochs: every per-subject scalar becomes an ``(S,)`` lane and every
  ``if`` a ``jnp.where``. ``tests/test_vloso.py`` pins the vector form
  against the host dataclasses over random loss sequences, decision for
  decision.

Reference semantics rebuilt: torch ReduceLROnPlateau (mode 'min',
patience, factor; ``Trainer.py:28``,
``MultiTaskTrainer.py:67-72,139-144,171-176``) and the best-loss/patience
early stop of ``Trainer.py:107-117`` / ``MultiTaskTrainer.py:517-527``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ReduceLROnPlateau:
    lr: float
    patience: int = 3
    factor: float = 0.5
    min_lr: float = 0.0
    threshold: float = 1e-4  # torch default rel threshold
    best: float = float("inf")
    num_bad_epochs: int = 0

    def step(self, metric: float) -> float:
        """Feed one epoch's metric; returns the (possibly reduced) LR."""
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr


@dataclass
class EarlyStopping:
    patience: int = 5
    best: float = float("inf")
    counter: int = 0
    should_stop: bool = False

    def step(self, val_loss: float) -> bool:
        """Returns True when the new loss is an improvement (save point)."""
        if val_loss < self.best:
            self.best = val_loss
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.should_stop = True
        return False


# ---------------------------------------------------------------------------
# Vectorized (in-jit) form: all subjects' plateau + early-stop state as
# (S,) lanes, advanced once per epoch inside the fused scan.
# ---------------------------------------------------------------------------


def vector_schedule_init(n: int, lr: float):
    """Per-subject schedule state for ``n`` parallel models, all lanes at
    the host dataclasses' initial values."""
    import jax.numpy as jnp

    return {
        "lr": jnp.full((n,), lr, jnp.float32),
        "plateau_best": jnp.full((n,), jnp.inf, jnp.float32),
        "plateau_bad": jnp.zeros((n,), jnp.int32),
        "es_best": jnp.full((n,), jnp.inf, jnp.float32),
        "es_counter": jnp.zeros((n,), jnp.int32),
        "stopped": jnp.zeros((n,), bool),
        "stop_epoch": jnp.zeros((n,), jnp.int32),
    }


def vector_schedule_step(
    state,
    te_loss,
    epoch,
    *,
    es_patience: int = 5,
    plateau_patience: int = 3,
    plateau_factor: float = 0.5,
    plateau_threshold: float = 1e-4,
    min_lr: float = 0.0,
):
    """One epoch's transition for every subject at once, branchless.

    Exactly the sequential driver's loop body (``train.engine.Trainer.run``
    — itself ``Trainer.py:105-117`` + the torch scheduler): feed the
    epoch's test loss to ReduceLROnPlateau (gated on a finite loss, as the
    driver does), then to EarlyStopping (ungated — NaN counts as
    non-improvement there too, since ``nan < best`` is false). Lanes whose
    ``stopped`` flag is already set are frozen entirely — the sequential
    loop has ``break``-ed out for them.

    ``epoch`` is the 1-based epoch index (for ``stop_epoch`` recording).
    Returns ``(new_state, improved)`` where ``improved`` flags lanes whose
    early-stop best just improved — the sequential driver's
    best-checkpoint save points.
    """
    import jax.numpy as jnp

    active = ~state["stopped"]
    te_loss = te_loss.astype(jnp.float32)

    # ReduceLROnPlateau.step, finite-gated like the sequential driver
    pl_act = active & jnp.isfinite(te_loss)
    pl_improved = te_loss < state["plateau_best"] * (1.0 - plateau_threshold)
    bad = jnp.where(pl_improved, 0, state["plateau_bad"] + 1)
    reduce = bad > plateau_patience
    lr = jnp.where(
        pl_act & reduce,
        jnp.maximum(state["lr"] * plateau_factor, min_lr),
        state["lr"],
    )
    plateau_best = jnp.where(
        pl_act & pl_improved, te_loss, state["plateau_best"]
    )
    plateau_bad = jnp.where(
        pl_act, jnp.where(reduce, 0, bad), state["plateau_bad"]
    )

    # EarlyStopping.step (NaN te_loss falls into the non-improved branch)
    es_improved = active & (te_loss < state["es_best"])
    es_best = jnp.where(es_improved, te_loss, state["es_best"])
    counter = jnp.where(
        active,
        jnp.where(es_improved, 0, state["es_counter"] + 1),
        state["es_counter"],
    )
    newly_stopped = active & (counter >= es_patience)
    return {
        "lr": lr,
        "plateau_best": plateau_best,
        "plateau_bad": plateau_bad,
        "es_best": es_best,
        "es_counter": counter,
        "stopped": state["stopped"] | newly_stopped,
        "stop_epoch": jnp.where(
            newly_stopped,
            jnp.asarray(epoch, jnp.int32),
            state["stop_epoch"],
        ),
    }, es_improved
