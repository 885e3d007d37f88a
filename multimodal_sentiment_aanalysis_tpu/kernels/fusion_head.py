"""Fused cross-modal MHA fusion + classification head (Pallas TPU).

The ME-MHACL serving hot path (reference ``ME-MHACL/model.py:47-119``):
stack the three modality embeddings into a length-3 sequence, 8-head
self-attention over the modality axis, MEAN over modalities, then the
binary classifier (shared Linear + ReLU + two heads) — all in ONE
VMEM-resident kernel per batch tile. Nothing between the encoder outputs
and the logits touches HBM.

Head handling: Mosaic cannot reshape the lane dimension into (heads, dh),
so per-head score reduction and probability broadcast are expressed as
matmuls against a static (F, H) head-assignment mask — MXU-friendly and
layout-preserving. The modality axis has length 3, so the attention is a
statically unrolled 3x3 softmax per head.

A/B parity test: ``tests/test_kernels.py`` vs ``MultiheadAttention`` +
``MEMHACLClassifier`` eval-mode apply.

Measured on v5e (batch 64, F=256): the fused kernel is numerically correct
but SLOWER than the XLA path (~21 ms vs ~1.9 ms per chained call) — the
per-head mask matmuls are 8-wide and underfeed the MXU, and XLA already
fuses this seq-3 graph well. It is therefore NOT wired into the serving
engine by default; it exists as the BASELINE-named fused fusion+head
kernel with its parity test, and as a cautionary data point that kernel
fusion below a certain arithmetic intensity loses to the compiler.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xe_ref, xy_ref, xp_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
            bv_ref, wo_ref, bo_ref, hmask_ref, ws_ref, bs_ref, wa_ref, ba_ref,
            wv2_ref, bv2_ref, oa_ref, ov_ref, *, num_heads: int):
    """One batch tile. Refs: x* (Bt, F); w* torch layouts (out, in);
    hmask (F, H) head-assignment one-hot."""
    feats = [xe_ref[:], xy_ref[:], xp_ref[:]]  # 3 x (Bt, F)
    f = feats[0].shape[1]
    dh = f // num_heads
    scale = 1.0 / math.sqrt(dh)
    hmask = hmask_ref[:]  # (F, H)

    prec = (jax.lax.Precision.HIGHEST if feats[0].dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def proj(x, w_ref, b_ref):
        return (
            jnp.dot(x, w_ref[:].T, preferred_element_type=jnp.float32,
                    precision=prec)
            + b_ref[0]
        )

    qs = [proj(x, wq_ref, bq_ref) for x in feats]  # (Bt, F) each
    ks = [proj(x, wk_ref, bk_ref) for x in feats]
    vs = [proj(x, wv_ref, bv_ref) for x in feats]

    # 3x3 attention, statically unrolled; per-head reduce via hmask matmul
    outs = []
    for i in range(3):
        s = [
            jnp.dot(qs[i] * ks[j], hmask,
                    preferred_element_type=jnp.float32,
                    precision=prec) * scale  # (Bt, H)
            for j in range(3)
        ]
        m = jnp.maximum(jnp.maximum(s[0], s[1]), s[2])
        e = [jnp.exp(x - m) for x in s]
        denom = e[0] + e[1] + e[2]
        # broadcast per-head probabilities back to lanes: (Bt, H) @ (H, F)
        w = [
            jnp.dot(e[j] / denom, hmask.T,
                    preferred_element_type=jnp.float32, precision=prec)
            for j in range(3)
        ]
        outs.append(w[0] * vs[0] + w[1] * vs[1] + w[2] * vs[2])

    fused = [proj(o, wo_ref, bo_ref) for o in outs]
    h = (fused[0] + fused[1] + fused[2]) / 3.0

    shared = jnp.maximum(proj(h, ws_ref, bs_ref), 0.0)
    oa_ref[:] = proj(shared, wa_ref, ba_ref).astype(oa_ref.dtype)
    ov_ref[:] = proj(shared, wv2_ref, bv2_ref).astype(ov_ref.dtype)


def fused_mha_fusion_head(
    x_eeg: jnp.ndarray,  # (B, F) modality embeddings
    x_eye: jnp.ndarray,
    x_phy: jnp.ndarray,
    mha: dict,           # in_proj_weight (3F, F), in_proj_bias, out_proj_*
    classifier: dict,    # shared/fc_arousal/fc_valence flax Dense params
    num_heads: int = 8,
    block_b: int = 64,
    interpret: bool | None = None,
):
    """Fused serving path: (B, F) x3 -> (arousal logits, valence logits)."""
    b, f = x_eeg.shape
    dh = f // num_heads
    wq, wk, wv = (mha["in_proj_weight"][i * f : (i + 1) * f] for i in range(3))
    bq, bk, bv = (mha["in_proj_bias"][i * f : (i + 1) * f] for i in range(3))
    n_cls = classifier["fc_arousal"]["bias"].shape[0]

    hmask = jnp.asarray(
        np.repeat(np.eye(num_heads, dtype=np.float32), dh, axis=0)
    )  # (F, H): lane -> head one-hot

    b_pad = (-b) % block_b
    pad = lambda x: jnp.pad(x, ((0, b_pad), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    row = lambda v: v.reshape(1, -1)
    weights = [
        wq, wk, wv, row(bq), row(bk), row(bv),
        mha["out_proj_weight"], row(mha["out_proj_bias"]), hmask,
        classifier["shared"]["kernel"].T, row(classifier["shared"]["bias"]),
        classifier["fc_arousal"]["kernel"].T, row(classifier["fc_arousal"]["bias"]),
        classifier["fc_valence"]["kernel"].T, row(classifier["fc_valence"]["bias"]),
    ]
    grid = ((b + b_pad) // block_b,)
    x_specs = [
        pl.BlockSpec((block_b, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] * 3
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in weights
    ]
    out_spec = pl.BlockSpec((block_b, n_cls), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    oa, ov = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=x_specs + w_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b + b_pad, n_cls), x_eeg.dtype),
            jax.ShapeDtypeStruct((b + b_pad, n_cls), x_eeg.dtype),
        ],
        interpret=interpret,
    )(pad(x_eeg), pad(x_eye), pad(x_phy), *weights)
    return oa[:b], ov[:b]
