"""Loss functions.

The reference has three distinct contrastive formulations; all are
reproduced with identical numerics (they differ in masking and
normalization, which changes gradients):

- :func:`supervised_infonce` — in-model supervised InfoNCE over one batch
  (reference ``MultimodalModel.py:232-260``)
- :func:`ntxent_supervised_two_view` — two-view label-supervised NT-Xent
  (reference ``train.py:16-40``)
- :func:`ntxent_indexed` — canonical index-matched NT-Xent
  (reference ``ME-MHACL/train.py:47-66``)

Plus masked cross-entropy/accuracy for the static-shape padded batches the
device pipeline produces.

All losses are pure jnp and fully fusable by XLA; a Pallas fused variant of
:func:`supervised_infonce` lives in ``kernels/contrastive.py`` with an A/B
numerics test.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches torch F.normalize: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


# TPU dispatch default for the fused InfoNCE kernel; MSA_FUSED_INFONCE=0
# is the env kill switch (same convention as MSA_FUSED_LSTM in ops/rnn.py)
_FUSED_INFONCE_ENABLED = os.environ.get("MSA_FUSED_INFONCE", "1") != "0"


def enable_fused_infonce(on: bool) -> bool:
    """Toggle the TPU fused-InfoNCE dispatch; returns the old value."""
    global _FUSED_INFONCE_ENABLED
    old = _FUSED_INFONCE_ENABLED
    _FUSED_INFONCE_ENABLED = bool(on)
    return old


def supervised_infonce(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: jnp.ndarray | float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Supervised InfoNCE with learnable temperature.

    Numerics of reference ``MultimodalModel.py:232-260``: L2-normalize both
    feature sets, similarity matrix divided by temperature, positive mask by
    label equality with zeroed diagonal, row-max subtraction, then
    ``-log((pos + 1e-12) / (all + 1e-12))`` averaged.

    ``mask`` (optional, (B,) 0/1) excludes padded rows/columns — padded
    entries contribute nothing to positives or the denominator, and the mean
    runs over real rows only.

    On TPU this dispatches to the fused Pallas kernel
    (:func:`..kernels.contrastive.fused_supervised_infonce` — same
    numerics, fwd+grad A/B tests); measured at the production shape
    (S=24 models vmapped, B=64, F=256, 3 losses): kernel ~2.0 ms/step
    fwd+bwd vs jnp ~2.2-3.0 — a small but consistent win
    (``scripts/profile_stem.py --only=infonce``). ``MSA_FUSED_INFONCE=0``
    or :func:`enable_fused_infonce` dispatches it off.
    """
    if _FUSED_INFONCE_ENABLED and jax.default_backend() == "tpu":
        from ..kernels.contrastive import fused_supervised_infonce

        return fused_supervised_infonce(
            feat1, feat2, labels, temperature, mask
        )
    f1 = _l2_normalize(feat1, axis=1)
    f2 = _l2_normalize(feat2, axis=1)
    sim = (f1 @ f2.T) / temperature

    pos_mask = (labels[:, None] == labels[None, :]).astype(sim.dtype)
    n = sim.shape[0]
    eye = jnp.eye(n, dtype=sim.dtype)
    pos_mask = pos_mask * (1.0 - eye)

    if mask is not None:
        valid = mask.astype(sim.dtype)
        pos_mask = pos_mask * valid[:, None] * valid[None, :]
        # padded columns leave the denominator: push them to -1e30 so the
        # row-max stays finite and their exp underflows to exactly 0
        sim = jnp.where(valid[None, :] > 0, sim, -1e30)

    sim = sim - jnp.max(sim, axis=1, keepdims=True)
    exp_sim = jnp.exp(sim)
    pos_sim = (exp_sim * pos_mask).sum(1)
    all_sim = exp_sim.sum(1)
    loss = -jnp.log((pos_sim + 1e-12) / (all_sim + 1e-12))
    if mask is not None:
        valid = mask.astype(loss.dtype)
        return (loss * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    return loss.mean()


def supervised_infonce_multi(
    feats1: jnp.ndarray,
    feats2: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: jnp.ndarray | float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """G supervised-InfoNCE losses sharing labels/mask/temperature.

    Same numerics as G calls to :func:`supervised_infonce` on
    ``feats1[g], feats2[g]``, returned as a (G,) vector.

    Routing — SETTLED as the G single calls (each dispatching the fused
    single-loss kernel on TPU). A one-launch stacked alternative (all G
    losses x all vmapped models in ONE kernel via ``custom_vmap``,
    quarantined behind ``MSA_INFONCE_MULTI=1`` in rounds 3-4) was DELETED
    in round 5 on two measured grounds (TPU v5e):

    - e2e NOISE: bench fp32 37,309 vs 37,217 samples/s — the S*G-launch
      serialization it removed was already cheap (2026-08-18);
    - the device fault it tripped in the full-model composition
      (``profile_step --only=full`` crashed the TPU worker) was NOT the
      kernel's own. Hardware bisection 2026-08-20
      (``scripts/repro_infonce_multi.py``): the production G-call default
      runs clean; the stacked Pallas kernel crashed in BOTH launch
      geometries (whole-array block and 8-group grid); the identical
      batched restructure in PURE JNP — no Pallas in the contrastive
      slice at all — crashed identically; and that same jnp restructure
      ran clean with ``MSA_FUSED_LSTM=0``. The fault is the fused-LSTM
      schedule-sensitivity family (``kernels/lstm.py`` "Device-fault
      class"), re-triggered by restructuring the adjacent contrastive
      graph — so no stacked variant, however implemented, is worth
      carrying for a zero-throughput win. The preflight ladder's
      LSTM rungs (``utils/preflight.py``) remain the designed mitigation
      for this family."""
    return jnp.stack([
        supervised_infonce(feats1[g], feats2[g], labels, temperature, mask)
        for g in range(feats1.shape[0])
    ])


def ntxent_supervised_two_view(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 0.1,
) -> jnp.ndarray:
    """Two-view supervised NT-Xent.

    Numerics of reference ``train.py:16-40``: concat views into 2B rows,
    2B x 2B similarity, label-equality mask minus self, denominator is the
    self-masked exp-sum, per-row mean log-prob over positives.
    """
    z1 = _l2_normalize(z1, axis=1)
    z2 = _l2_normalize(z2, axis=1)
    z = jnp.concatenate([z1, z2], axis=0)
    sim = (z @ z.T) / temperature

    lab = jnp.concatenate([labels.reshape(-1), labels.reshape(-1)], axis=0)
    mask = (lab[:, None] == lab[None, :]).astype(sim.dtype)
    self_mask = jnp.eye(sim.shape[0], dtype=bool)
    mask = jnp.where(self_mask, 0.0, mask)

    sim_exp = jnp.where(self_mask, 0.0, jnp.exp(sim))
    sim_sum = sim_exp.sum(axis=1, keepdims=True)
    log_prob = sim - jnp.log(sim_sum + 1e-8)
    loss = -(mask * log_prob).sum(axis=1) / (mask.sum(axis=1) + 1e-8)
    return loss.mean()


def ntxent_indexed(
    z1: jnp.ndarray, z2: jnp.ndarray, temperature: float = 0.5
) -> jnp.ndarray:
    """Canonical SimCLR NT-Xent (index-matched positives).

    Numerics of reference ``ME-MHACL/train.py:47-66``: normalize the 2N stack,
    self-similarity masked to -9e15, CE against the paired index.
    """
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    z = _l2_normalize(z, axis=1)
    sim = z @ z.T
    self_mask = jnp.eye(2 * b, dtype=bool)
    sim = jnp.where(self_mask, -9e15, sim)
    sim = sim / temperature
    targets = jnp.concatenate([jnp.arange(b, 2 * b), jnp.arange(0, b)])
    return optax.softmax_cross_entropy_with_integer_labels(sim, targets).mean()


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch (torch nn.CrossEntropyLoss parity)."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """CE averaged over valid (mask==1) rows; padding contributes nothing."""
    per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    m = mask.astype(per.dtype)
    return (per * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_accuracy(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == labels).astype(jnp.float32) * mask.astype(jnp.float32)
    return hit.sum() / jnp.maximum(mask.sum(), 1.0)
