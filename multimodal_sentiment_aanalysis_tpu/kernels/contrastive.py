"""Fused supervised-InfoNCE Pallas kernel.

Numerics of :func:`ops.losses.supervised_infonce` (reference
``MultimodalModel.py:232-260``): similarity matmul, label-equality positive
mask with zeroed diagonal, validity masking, row-max log-sum-exp, and the
masked mean — all in ONE VMEM-resident kernel, so the (B, B) similarity
matrix never round-trips through HBM.

Differentiability: the kernel computes the forward; the backward is the
closed form

    dL/ds_ij = (valid_i / Nv) * (e_ij / A_i - pos_ij * e_ij / P_i)
               - r_i * onehot_argmax_ij,   r_i = w_i (A_i/(A_i+eps) - P_i/(P_i+eps))

evaluated in jax.numpy from saved normalized features (one extra (B, B)
matmul — no exp/log recomputation beyond that). The r_i term is the
gradient THROUGH the forward's row-max subtraction: it vanishes for rows
with positive mass but is real for rows with NO positive pairs (label
unique in the batch), where dropping it deviated from jnp/torch autodiff
by up to a few percent (caught by the grad parity tests). L2
normalization stays outside the kernel (XLA fuses it into the producer)
so its gradient is automatic.

Rows are padded to the float32 sublane tile (8) with ``valid = 0`` — padded
columns are pushed to -1e30 inside the kernel exactly like the jnp path
pushes masked columns, so padding changes nothing.

Under the vectorized-LOSO vmap (S=24 models), Pallas's default batching
rule serializes this kernel into S sequential grid steps per loss — and
that is the SETTLED form. A stacked "multi" variant (all G losses x all
S models in ONE launch via ``custom_vmap``) existed through round 4,
quarantined behind ``MSA_INFONCE_MULTI=1``, and was DELETED in round 5
after a hardware bisection (2026-08-20, ``scripts/repro_infonce_multi.py``)
proved (a) it was an e2e wash (the S*G-launch serialization it removed was
already cheap: bench 37.3k vs 37.2k samples/s), and (b) the device fault
it tripped in the full-model composition was NOT its own: the identical
batched restructure in pure jnp — no Pallas launch at all — crashed the
worker the same way, and turning the fused LSTM off made that same
restructured program run clean. The fault class is the LSTM
schedule-sensitivity family (``kernels/lstm.py`` "Device-fault class"),
re-triggered by restructuring the adjacent contrastive graph; the full
table lives in the repro script's docstring and ``ops/losses.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12
_NEG = -1e30


def _l2_normalize(x, axis=-1, eps=_EPS):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _infonce_kernel(n1_ref, n2_ref, lab_ref, valid_ref, temp_ref, loss_ref):
    n1 = n1_ref[:]
    n2 = n2_ref[:]
    lab = lab_ref[:]  # (B, 1) int32
    valid = valid_ref[:]  # (B, 1) f32
    temp = temp_ref[0, 0]

    sim = jnp.dot(n1, n2.T, preferred_element_type=jnp.float32) / temp
    b = sim.shape[0]

    pos = (lab == lab.T).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    pos = pos * jnp.where(row == col, 0.0, 1.0)
    pos = pos * valid * valid.T

    sim = jnp.where(valid.T > 0, sim, _NEG)
    sim = sim - jnp.max(sim, axis=1, keepdims=True)
    e = jnp.exp(sim)
    # keep every intermediate 2-D: Mosaic lowers 1-D vector ops poorly
    p = (e * pos).sum(axis=1, keepdims=True)  # (B, 1)
    a = e.sum(axis=1, keepdims=True)
    loss = -jnp.log((p + _EPS) / (a + _EPS))
    num = (loss * valid).sum()
    den = jnp.maximum(valid.sum(), 1.0)
    loss_ref[0, 0] = num / den


def _run_kernel(n1, n2, labels, valid, temp):
    b = n1.shape[0]
    return pl.pallas_call(
        _infonce_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=jax.devices()[0].platform != "tpu",
    )(
        n1,
        n2,
        labels.reshape(b, 1).astype(jnp.int32),
        valid.reshape(b, 1).astype(jnp.float32),
        temp.reshape(1, 1).astype(jnp.float32),
    )[0, 0]


@jax.custom_vjp
def _infonce_core(n1, n2, labels, valid, temp):
    return _run_kernel(n1, n2, labels, valid, temp)


def _core_fwd(n1, n2, labels, valid, temp):
    return _run_kernel(n1, n2, labels, valid, temp), (n1, n2, labels, valid, temp)


def _core_bwd(res, g):
    n1, n2, labels, valid, temp = res
    in_dtype = n1.dtype  # cotangents must match the primal dtype (bf16 in
    # mixed-precision training); the math itself runs in fp32 like the
    # kernel's forward accumulation
    n1 = n1.astype(jnp.float32)
    n2 = n2.astype(jnp.float32)
    b = n1.shape[0]
    raw = n1 @ n2.T
    sim = raw / temp
    pos = (labels[:, None] == labels[None, :]).astype(sim.dtype)
    pos = pos * (1.0 - jnp.eye(b, dtype=sim.dtype))
    pos = pos * valid[:, None] * valid[None, :]
    sim = jnp.where(valid[None, :] > 0, sim, _NEG)
    shifted = sim - jnp.max(sim, axis=1, keepdims=True)
    e = jnp.exp(shifted)
    p = (e * pos).sum(axis=1, keepdims=True)
    a = e.sum(axis=1, keepdims=True)
    nv = jnp.maximum(valid.sum(), 1.0)
    w = (valid[:, None] / nv) * g
    grad_s = w * (e / (a + _EPS) - pos * e / (p + _EPS))
    # gradient THROUGH the row-max subtraction: its row-sum term
    # w*(a/(a+eps) - p/(p+eps)) only vanishes when the row has positive
    # mass (p >> eps); rows with NO positives route a real gradient to
    # their argmax (tie-split like jnp.max's VJP) — dropping it deviated
    # from jnp/torch autodiff by up to a few percent on such batches
    r = w * (a / (a + _EPS) - p / (p + _EPS))
    is_max = (shifted == 0.0).astype(jnp.float32)
    is_max = is_max / is_max.sum(axis=1, keepdims=True)
    grad_s = grad_s - r * is_max
    dn1 = ((grad_s @ n2) / temp).astype(in_dtype)
    dn2 = ((grad_s.T @ n1) / temp).astype(in_dtype)
    dtemp = -(grad_s * raw).sum() / (temp * temp)
    return dn1, dn2, None, None, dtemp.reshape(jnp.shape(res[4]))


_infonce_core.defvjp(_core_fwd, _core_bwd)


def fused_supervised_infonce(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: jnp.ndarray | float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Drop-in for :func:`ops.losses.supervised_infonce` backed by the
    Pallas kernel. Same signature, same numerics."""
    b = feat1.shape[0]
    valid = (
        jnp.ones((b,), jnp.float32) if mask is None else mask.astype(jnp.float32)
    )
    pad = (-b) % 8  # float32 sublane tile
    if pad:
        feat1 = jnp.pad(feat1, ((0, pad), (0, 0)))
        feat2 = jnp.pad(feat2, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
        valid = jnp.pad(valid, (0, pad))
    n1 = _l2_normalize(feat1, axis=1)
    n2 = _l2_normalize(feat2, axis=1)
    temp = jnp.asarray(temperature, jnp.float32)
    return _infonce_core(n1, n2, labels, valid, temp)

