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
by up to a few percent (caught by the multi-loss parity test). L2
normalization stays outside the kernel (XLA fuses it into the producer)
so its gradient is automatic.

Rows are padded to the float32 sublane tile (8) with ``valid = 0`` — padded
columns are pushed to -1e30 inside the kernel exactly like the jnp path
pushes masked columns, so padding changes nothing.

:func:`fused_supervised_infonce_multi` (below) additionally stacks a
loss-group axis G into the block and carries a ``custom_vmap`` rule, so
the fusion model's THREE losses x all S vmapped models run as ONE kernel
launch — the single-loss form has no batching rule and was serialized by
Pallas's default vmap rule into S sequential grid steps per loss.
"""

from __future__ import annotations

from functools import partial

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


# ---------------------------------------------------------------------------
# multi-loss variant: ALL losses x ALL vmapped models in ONE kernel launch
# ---------------------------------------------------------------------------
#
# The single-loss kernel above has no custom_vmap rule, so under the
# vectorized-LOSO vmap (S=24 models) Pallas's default batching rule turns
# each of the model's three InfoNCE losses into 24 SEQUENTIAL grid steps —
# 72 tiny (64, 64) kernel bodies per train step. This variant stacks the
# loss-group axis G into the block (one batched dot_general) and maps the
# trainer's vmap onto the same axis via custom_vmap, so the whole
# contrastive objective is ONE grid step. The temperature division is
# folded into the n1 operand OUTSIDE the kernel (the row-max subtraction
# makes the forward insensitive to the scaling's association order), which
# keeps the kernel temperature-free; the backward is the same closed form
# as the single-loss VJP, batched over G.


def _infonce_multi_kernel(n1s_ref, n2_ref, lab_ref, valid_ref, loss_ref):
    """Blocks: n1s/n2 (N, B, F) — n1s pre-divided by temperature;
    lab (N, B, 1) int32; valid (N, B, 1) f32; out (N, 128) f32 (the loss
    broadcast across lanes; callers read lane 0)."""
    n1s = n1s_ref[...]
    n2 = n2_ref[...]
    lab = lab_ref[...]
    valid = valid_ref[...]

    sim = jax.lax.dot_general(
        n1s, n2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (N, B, B)
    n, b, _ = sim.shape

    pos = (lab == jnp.swapaxes(lab, 1, 2)).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, b, b), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, b, b), 2)
    pos = pos * jnp.where(row == col, 0.0, 1.0)
    valid_t = jnp.swapaxes(valid, 1, 2)  # (N, 1, B)
    pos = pos * valid * valid_t

    sim = jnp.where(valid_t > 0, sim, _NEG)
    sim = sim - jnp.max(sim, axis=2, keepdims=True)
    e = jnp.exp(sim)
    p = (e * pos).sum(axis=2, keepdims=True)  # (N, B, 1)
    a = e.sum(axis=2, keepdims=True)
    loss = -jnp.log((p + _EPS) / (a + _EPS))
    num = (loss * valid).sum(axis=1)  # (N, 1)
    den = jnp.maximum(valid.sum(axis=1), 1.0)
    loss_ref[...] = jnp.broadcast_to(num / den, loss_ref.shape)


def _run_multi(n1s, n2, lab, valid):
    """n1s/n2 (N, B, F); lab/valid (N, B). Returns (N,) losses. Pads N to
    the f32 sublane tile (8) with valid=0 groups (loss 0, sliced off)."""
    n, b, _ = n1s.shape
    pad = (-n) % 8
    if pad:
        zf = lambda v: jnp.pad(v, ((0, pad),) + ((0, 0),) * (v.ndim - 1))
        n1s, n2, lab, valid = zf(n1s), zf(n2), zf(lab), zf(valid)
    out = pl.pallas_call(
        _infonce_multi_kernel,
        out_shape=jax.ShapeDtypeStruct((n + pad, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # N = S*G = 72 at the flagship shape: operands + the (N, B, B)
        # intermediates need ~21 MB, over the 16 MB default scoped cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(
        n1s.astype(jnp.float32),
        n2.astype(jnp.float32),
        lab[..., None].astype(jnp.int32),
        valid[..., None].astype(jnp.float32),
    )
    return out[:n, 0]


@jax.custom_batching.custom_vmap
def _vm_multi(n1s, n2, lab, valid):
    return _run_multi(n1s, n2, lab, valid)


@_vm_multi.def_vmap
def _vm_multi_rule(axis_size, in_batched, n1s, n2, lab, valid):
    args = [
        v if bb else jnp.broadcast_to(v[None], (axis_size,) + v.shape)
        for v, bb in zip((n1s, n2, lab, valid), in_batched)
    ]
    g = args[0].shape[1]
    flat = [v.reshape((axis_size * g,) + v.shape[2:]) for v in args]
    return _run_multi(*flat).reshape(axis_size, g), True


@jax.custom_vjp
def _infonce_multi_core(n1, n2, labels, valid, temp):
    """n1/n2 L2-normalized (G, B, F); labels/valid (G, B); temp scalar ().
    Returns (G,) losses."""
    return _vm_multi(n1 / temp, n2, labels, valid)


def _multi_fwd(n1, n2, labels, valid, temp):
    return _vm_multi(n1 / temp, n2, labels, valid), (
        n1, n2, labels, valid, temp)


def _multi_bwd(res, g):
    n1, n2, labels, valid, temp = res
    in_dtype = n1.dtype
    f1 = n1.astype(jnp.float32)
    f2 = n2.astype(jnp.float32)
    raw = jnp.einsum("gbf,gcf->gbc", f1, f2)
    sim = raw / temp
    pos = (labels[:, :, None] == labels[:, None, :]).astype(jnp.float32)
    b = sim.shape[-1]
    pos = pos * (1.0 - jnp.eye(b, dtype=jnp.float32))
    v = valid.astype(jnp.float32)
    pos = pos * v[:, :, None] * v[:, None, :]
    sim = jnp.where(v[:, None, :] > 0, sim, _NEG)
    shifted = sim - jnp.max(sim, axis=2, keepdims=True)
    e = jnp.exp(shifted)
    p = (e * pos).sum(axis=2, keepdims=True)
    a = e.sum(axis=2, keepdims=True)
    nv = jnp.maximum(v.sum(axis=1), 1.0)  # (G,)
    w = (v / nv[:, None])[:, :, None] * g[:, None, None]
    grad_s = w * (e / (a + _EPS) - pos * e / (p + _EPS))
    # row-max-subtraction gradient for no-positive rows (see the single
    # kernel's VJP note)
    r = w * (a / (a + _EPS) - p / (p + _EPS))
    is_max = (shifted == 0.0).astype(jnp.float32)
    is_max = is_max / is_max.sum(axis=2, keepdims=True)
    grad_s = grad_s - r * is_max
    dn1 = (jnp.einsum("gbc,gcf->gbf", grad_s, f2) / temp).astype(in_dtype)
    dn2 = (jnp.einsum("gbc,gbf->gcf", grad_s, f1) / temp).astype(in_dtype)
    dtemp = (-(grad_s * raw).sum() / (temp * temp)).astype(jnp.float32)
    return dn1, dn2, None, None, dtemp.reshape(jnp.shape(res[4]))


_infonce_multi_core.defvjp(_multi_fwd, _multi_bwd)


def fused_supervised_infonce_multi(
    feats1: jnp.ndarray,
    feats2: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: jnp.ndarray | float,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """G supervised-InfoNCE losses in one kernel launch.

    feats1/feats2: (G, B, F) feature groups sharing labels/mask/temperature
    (the fusion model's three per-modality losses, reference
    ``MultimodalModel.py:299-311``); returns (G,) losses, each identical to
    :func:`fused_supervised_infonce` on the corresponding pair."""
    g, b, _ = feats1.shape
    valid = (
        jnp.ones((b,), jnp.float32) if mask is None else mask.astype(jnp.float32)
    )
    pad = (-b) % 8  # float32 sublane tile
    if pad:
        feats1 = jnp.pad(feats1, ((0, 0), (0, pad), (0, 0)))
        feats2 = jnp.pad(feats2, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
        valid = jnp.pad(valid, (0, pad))
    n1 = _l2_normalize(feats1, axis=2)
    n2 = _l2_normalize(feats2, axis=2)
    lab = jnp.broadcast_to(labels[None], (g,) + labels.shape)
    val = jnp.broadcast_to(valid[None], (g,) + valid.shape)
    temp = jnp.asarray(temperature, jnp.float32).reshape(())
    return _infonce_multi_core(n1, n2, lab, val, temp)
