"""Serving engine: inference-optimized forward built from trained variables.

The training model (:class:`..models.MultimodalTransformerModel`) is defined
for parity and differentiability; this module exports the same eval-mode
math as a lean functional forward for deployment:

- both EEG conv stages run with BatchNorm folded into a per-channel
  affine; the stem is the plain XLA conv by default (the fused Pallas
  serving kernel :mod:`..kernels.conv_stem` is a measured loss here —
  conclusion 1 below — and stays opt-in via ``use_pallas=True``)
- every sequence-length-1 attention site (the eye/pps ``Subnetwork``
  self-attention, reference ``MultimodalModel.py:83-105``, and both
  ``CrossModalTransformer`` blocks, ``:108-149``) is algebraically collapsed:
  softmax over a single key is 1, so MHA(q, k, v) == out_proj(v_proj(v)) —
  two matmuls instead of the full attention graph
- BatchNorm in the fusion stack and heads uses running stats folded into the
  preceding Dense (inference semantics)

``build_serving_forward`` returns a jitted ``(eeg, eye, pps) ->
(arousal_logits, valence_logits)`` closure. Parity with
``model.apply(variables, ...)`` (eval mode) is asserted by
``tests/test_serving.py`` to float tolerance.

Batch-size sweep (``scripts/serve_sweep.py``, TPU v5e, host-sync timing,
2026-08-18; ms/batch -> samples/s):

====  ===================  ===================  ===================
B     fp32, Pallas stem    fp32, XLA stem       bf16 (XLA stem)
====  ===================  ===================  ===================
8     —                    0.679 ->  11,775     0.879 ->   9,104
32    0.967 ->  33,077     0.737 ->  43,392     0.784 ->  40,806
64    1.257 ->  50,918     0.835 ->  76,674     0.852 ->  75,158
128   1.997 ->  64,102     0.933 -> 137,178     0.959 -> 133,534
256   3.419 ->  74,885     1.232 -> 207,799     1.245 -> 205,571
512   7.223 ->  70,887     1.906 -> 268,635     1.701 -> 300,923
1024  —                    3.696 -> 277,047     3.017 -> 339,446
2048  —                    —                    5.466 -> 374,695
4096  —                    —                    10.728 -> 381,798
====  ===================  ===================  ===================

Three conclusions drive the defaults here:

1. The Pallas serving-stem kernel (``kernels/conv_stem.py``) LOSES to
   the XLA stem at every batch size (1.5x at B=64, 2.8x at B=256):
   in eval mode XLA fuses the folded affine+GELU into the conv output
   and tiles batch freely, while the kernel's batch-in-sublanes grid
   pays a relayout per stage. ``use_pallas`` therefore defaults OFF;
   the kernel remains opt-in and parity-tested.
2. The forward is latency-bound below B~128 (throughput ~linear in
   batch) and keeps scaling to ~380k samples/s at B=4096 — batch as
   large as the serving SLO allows.
3. bf16 is a wash below B=256 (cast overhead cancels the MXU gain)
   and wins 1.12-1.22x from B=512 up; argmax agreement vs fp32 0.988
   (B=256 probe).
4. Where the sub-B=128 latency floor goes (``scripts/
   profile_serve_floor.py``, staged slices of this forward as chained
   100-iteration scans, TPU v5e 2026-08-19; ms/batch):

   ====  ======  ====  ===  ====
   B     gather  stem  eeg  full
   ====  ======  ====  ===  ====
   8     .264    .308  .348 .356
   64    .298    .412  .506 .510
   256   .355    .602  .846 .856
   ====  ======  ====  ===  ====

   The gather-only stage (one ``jnp.take`` + scan bookkeeping, no
   model) already costs 0.26-0.36 ms — ~74% of the B=8 total — and
   every model stage's *delta* scales with batch (eeg-stem: 0.040 →
   0.094 → 0.244 ms), so the floor is per-iteration program overhead,
   NOT the BiLSTM recurrence or any kernel-addressable compute
   (the recurrence-as-floor hypothesis is refuted). The absolute
   floor differs from this sweep's numbers because the sweep also
   materializes per-batch logits; the attribution (deltas within one
   harness) is the meaningful part. Documented negative for
   latency-sensitive serving below B~128: nothing left to fuse —
   batch larger (conclusion 2) or amortize via chained scans as the
   offline scorer here does.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..kernels.conv_stem import fold_bn, fused_conv_bn_gelu_pool
from ..models.layers import make_sincos_pe
from ..ops.rnn import bilstm_layer


def _gelu(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _ln(p, x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _bn_inference(p, stats, x, eps=1e-5):
    return (x - stats["mean"]) / jnp.sqrt(stats["var"] + eps) * p["scale"] + p["bias"]


def _mha_seq1(p, value):
    """MHA with a single key/query position: softmax == 1, so the output is
    ``out_proj(v_proj(value))`` exactly (any head count)."""
    e = value.shape[-1]
    w_v = p["in_proj_weight"][2 * e :]
    b_v = p["in_proj_bias"][2 * e :]
    v = value @ w_v.T + b_v
    return v @ p["out_proj_weight"].T + p["out_proj_bias"]


def _bn_trunk(p, stats, x):
    """_BNTrunk eval: Dense -> BN(running) -> GELU per block."""
    i = 0
    while f"dense_{i}" in p:
        x = _dense(p[f"dense_{i}"], x)
        x = _bn_inference(p[f"bn_{i}"], stats[f"bn_{i}"], x)
        x = _gelu(x)
        i += 1
    return x


def _subnetwork(p, x, feat_dim):
    """Eye/PPS Subnetwork eval forward with collapsed seq-1 attention."""
    h = _dense(p["proj"], x)
    h = h + make_sincos_pe(feat_dim, 1)[0].astype(h.dtype)  # PE row 0
    t = p["transformer"]
    for li in range(2):
        lp = t[f"layers_{li}"]
        attn = _mha_seq1(lp["self_attn"], h)
        h = _ln(lp["norm1"], h + attn)
        ff = _dense(lp["linear2"], jax.nn.relu(_dense(lp["linear1"], h)))
        h = _ln(lp["norm2"], h + ff)
    return _ln(p["norm"], h)


def _cross_modal(p, query, value):
    attn = _mha_seq1(p["attn"], value)
    gate = jax.nn.sigmoid(
        _dense(p["gate"], jnp.concatenate([query, attn], axis=1))
    )
    return _ln(p["norm"], gate * query + (1.0 - gate) * attn)


def _eeg_stem(p, stats, x, use_pallas: bool):
    """EEG encoder eval forward; conv stages via the fused kernel."""
    xt = jnp.transpose(x, (0, 2, 1))  # (B, T, C)

    # rsqrt of the (strictly positive) running var is monotone and
    # cancellation-free, so folding in the compute dtype is safe; the
    # bf16 mode's argmax agreement vs fp32 is pinned by tests/serve_sweep
    s1, h1 = fold_bn(
        p["bn1"]["scale"], p["bn1"]["bias"],
        stats["bn1"]["mean"], stats["bn1"]["var"],
        p["conv1_bias"],
    )
    s2, h2 = fold_bn(
        p["bn2"]["scale"], p["bn2"]["bias"],
        stats["bn2"]["mean"], stats["bn2"]["var"],
        p["conv2_bias"],
    )
    if use_pallas:
        h = fused_conv_bn_gelu_pool(xt, p["conv1_weight"], s1, h1, 7, 4)
        h = fused_conv_bn_gelu_pool(h, p["conv2_weight"], s2, h2, 2, 2)
    else:
        from ..models.eeg import conv1d, max_pool1d

        h = conv1d(xt, p["conv1_weight"], jnp.zeros_like(p["conv1_bias"]), 7)
        h = max_pool1d(_gelu(h * s1 + h1), 4)
        h = conv1d(h, p["conv2_weight"], jnp.zeros_like(p["conv2_bias"]), 2)
        h = max_pool1d(_gelu(h * s2 + h2), 2)

    freq = _gelu(_dense(p["freq1"], x.mean(axis=1)))
    freq = _dense(p["freq2"], freq)

    for k in range(2):
        h = bilstm_layer(
            h,
            (p[f"lstm{k}_w_ih_fwd"], p[f"lstm{k}_w_hh_fwd"],
             p[f"lstm{k}_b_ih_fwd"], p[f"lstm{k}_b_hh_fwd"]),
            (p[f"lstm{k}_w_ih_bwd"], p[f"lstm{k}_w_hh_bwd"],
             p[f"lstm{k}_b_ih_bwd"], p[f"lstm{k}_b_hh_bwd"]),
        )
    temp_feat = h.mean(axis=1)

    fused = jnp.concatenate([temp_feat, freq], axis=1)
    return _gelu(_ln(p["fusion_ln"], _dense(p["fusion_dense"], fused)))


def build_serving_forward(variables: dict, feat_dim: int = 256,
                          use_pallas: bool | None = None,
                          compute_dtype=None):
    """Jitted eval forward ``(eeg, eye, pps) -> (arousal, valence)`` from a
    trained variables dict (params + batch_stats).

    ``compute_dtype=jnp.bfloat16`` runs the whole forward at native MXU
    rate: weights/stats are cast once at build time, inputs are cast per
    call, logits return fp32. Latency-bound below B~128 so bf16 only
    pays off at larger batches — numbers in the module docstring sweep
    table.

    ``use_pallas`` defaults OFF: the serving-stem kernel is a measured
    loss vs the XLA stem at every batch size (sweep table above; the
    eval-mode XLA conv absorbs the folded affine+GELU for free). Pass
    ``use_pallas=True`` to opt back in (TPU only).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if compute_dtype is not None:
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        params, stats = cast(params), cast(stats)
    if use_pallas is None:
        use_pallas = False
    if compute_dtype is not None and compute_dtype != jnp.float32:
        # The serving stem kernel convolves IN-KERNEL via dynamic
        # time-offset tap slices (pl.ds(k, t_conv)); with packed bf16
        # Mosaic cannot prove the sublane-dim offset alignment and the
        # kernel fails to compile ("cannot statically prove that index in
        # dimension 1 is a multiple of 8", measured 2026-08-18). Low-
        # precision serving therefore rides the XLA stem, where the
        # folded affine+GELU+pool fuse into the conv output anyway.
        use_pallas = False

    @jax.jit
    def forward(eeg, eye, pps):
        if compute_dtype is not None:
            eeg = eeg.astype(compute_dtype)
            eye = eye.astype(compute_dtype)
            pps = pps.astype(compute_dtype)
        eeg_feat = _eeg_stem(
            params["eeg_net"], stats["eeg_net"], eeg, use_pallas
        )
        eye_feat = _subnetwork(params["eye_net"], eye, feat_dim)
        pps_feat = _subnetwork(params["pps_net"], pps, feat_dim)

        eye_enh = _cross_modal(params["cross_attn_e2p"], eeg_feat, eye_feat)
        pps_enh = _cross_modal(params["cross_attn_p2e"], eeg_feat, pps_feat)

        concat = jnp.concatenate([eeg_feat, eye_feat, pps_feat], axis=1)
        w = jax.nn.softmax(
            _dense(params["attn_w2"], _gelu(_dense(params["attn_w1"], concat))),
            axis=1,
        )
        fused = jnp.concatenate(
            [eeg_feat * w[:, 0:1], eye_enh * w[:, 1:2], pps_enh * w[:, 2:3]],
            axis=1,
        )
        fused = _bn_trunk(
            params["fusion_stack"], stats["fusion_stack"], fused
        )
        arousal = _dense(
            params["arousal_head"]["out"],
            _bn_trunk(params["arousal_head"]["trunk"],
                      stats["arousal_head"]["trunk"], fused),
        )
        valence = _dense(
            params["valence_head"]["out"],
            _bn_trunk(params["valence_head"]["trunk"],
                      stats["valence_head"]["trunk"], fused),
        )
        if compute_dtype is not None:
            arousal = arousal.astype(jnp.float32)
            valence = valence.astype(jnp.float32)
        return arousal, valence

    return forward
