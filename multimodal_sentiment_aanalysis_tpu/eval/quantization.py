"""Int8 post-training quantization for the serving forward (net-new).

The reference deploys its trained models through ``Tester.py``'s fp32
forward; this module adds the TPU-native deployment tier below bf16:
**weight-only-calibrated int8 matmuls with dynamic activation scales**,
targeting the v5e's double-rate int8 MXU path (394 TOPS vs 197 bf16).

Scheme (standard symmetric PTQ):

- **Weights**: per-output-channel symmetric int8, quantized once at build
  time on the host (``scale = max|w| / 127`` over the input/tap axes).
  BatchNorm running stats are folded into the preceding conv/dense weight
  BEFORE quantization, so each output channel's affine magnitude is
  absorbed by its own scale (better int8 fidelity than post-hoc affine).
- **Activations**: dynamic per-row (last-axis) symmetric scales computed
  in-graph per call — no calibration set needed, and row-wise scaling
  keeps outlier rows from crushing the rest of the batch. Convolutions
  use a per-tensor scale (a row would mix channels across taps anyway).
- **Accumulation**: int32 (``preferred_element_type``), rescaled to float
  by ``sx * sw`` after the matmul. Worst-case ``127*127*K`` for the
  largest K here (768) is ~1.2e7 — 8 bits of int32 headroom.

What runs int8: both EEG conv stages, the BiLSTM *input* projections
(2/3 of LSTM FLOPs — the hoisted ``x @ W_ih^T`` matmuls), every Dense in
the subnetworks / cross-modal blocks / fusion stack / heads, and the
collapsed seq-1 attention projections. What stays float: the LSTM
recurrence (serial, per-step quantization overhead would dominate),
layer norms, softmax/sigmoid gates, GELU, and pooling. The recurrence
reuses :func:`..ops.rnn.bilstm_recurrence` — the exact scan the float
serving path runs.

Parity: ``tests/test_serving.py::test_serving_int8_agrees_with_fp32``
pins logit closeness + argmax agreement vs the fp32 serving forward;
measured argmax agreement on the TPU at B=256: **0.9766** (bf16: 0.9922).

Hardware verdict (TPU v5e, ``scripts/serve_sweep.py --int8``,
2026-08-19): **a measured LOSS vs bf16 — int8 stays opt-in.**

====  ==========  ==========  ====================
B     int8        bf16        bf16, MSA_FUSED_LSTM=0
====  ==========  ==========  ====================
64     64,505      75,158     —
256   189,368     205,571     —
512   217,153     300,923     230,364
4096  199,137     381,798     220,599
====  ==========  ==========  ====================

Two causes, isolated by the third column (bf16 forced onto the same
XLA scan recurrence this path uses):

1. The quantized path cannot ride the fused Pallas BiLSTM kernel (it
   computes the input projection in-kernel from the float input), and
   at large batch that kernel IS the serving win: disabling it costs
   bf16 1.3x at B=512 and 1.7x at B=4096.
2. Net of that, int8 ~matches unfused bf16 (217k vs 230k at B=512):
   the per-call dynamic quantization (row max + rint + clip + casts,
   all VPU work) cancels the MXU rate gain at these layer widths
   (K <= 768 — the matmuls are too small for the int8 rate to
   dominate the requantization traffic).

The implementation stays: it is the correct PTQ recipe if a larger
model family (wide GEMMs) lands, and int8 weights are 4x smaller for
memory-constrained export. For throughput, use bf16
(:func:`.serving.build_serving_forward` with ``compute_dtype``).

Reference: ``Tester.py:37-84`` (the deployment surface this targets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.conv_stem import fold_bn
from ..models.eeg import max_pool1d
from ..models.layers import make_sincos_pe
from ..ops.rnn import bilstm_recurrence
from .serving import _gelu, _ln  # shared float glue


# --------------------------------------------------------------------------
# build-time (host) weight quantization
# --------------------------------------------------------------------------

def quantize_weight(w, reduce_axes) -> dict:
    """Symmetric per-channel int8: ``{"q": int8, "s": f32 per-channel}``.

    ``reduce_axes`` are the axes folded into each output channel's scale
    (the input/tap axes); the remaining axes are the channel axes.
    """
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=reduce_axes, keepdims=True)
    s = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(np.squeeze(s, reduce_axes))}


def _q_dense(p, fold=None):
    """Quantize a flax-layout Dense ``{"kernel": (in, out), "bias"}``.

    ``fold=(s, h)`` folds a per-output affine (e.g. BN running stats) into
    the weight/bias before quantization.
    """
    kernel = np.asarray(p["kernel"], np.float32)
    bias = np.asarray(p["bias"], np.float32)
    if fold is not None:
        s, h = (np.asarray(a, np.float32) for a in fold)
        kernel = kernel * s[None, :]
        bias = h  # fold_bn already folded the original bias into h
    qw = quantize_weight(kernel, (0,))
    qw["bias"] = jnp.asarray(bias)
    return qw


def _q_linear_t(w, b):
    """Quantize a torch-layout ``x @ w.T + b`` site ((out, in) weight)."""
    qw = quantize_weight(np.asarray(w, np.float32).T, (0,))
    qw["bias"] = jnp.asarray(np.asarray(b, np.float32))
    return qw


def _q_conv(w, fold):
    """Quantize a torch-layout conv weight (O, I, K) with BN folded in.

    Stored pre-transposed to XLA's (K, I, O) so the serving graph carries
    no transpose. Scale is per output channel.
    """
    w = np.asarray(w, np.float32)
    s, h = (np.asarray(a, np.float32) for a in fold)
    w = w * s[:, None, None]
    qw = quantize_weight(np.transpose(w, (2, 1, 0)), (0, 1))
    qw["bias"] = jnp.asarray(h)
    return qw


# --------------------------------------------------------------------------
# in-graph int8 matmuls
# --------------------------------------------------------------------------

def _qdot(x, qw, out_dtype):
    """``x @ dequant(qw) + bias`` with the matmul itself in int8.

    Dynamic per-row activation scale (last axis); int32 accumulation on
    the MXU; float rescale by ``sx * sw`` afterwards.
    """
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    sx = jnp.maximum(sx, 1e-12) / 127.0
    xq = jnp.clip(
        jnp.rint(x.astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qw["q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * qw["s"] + qw["bias"]
    return out.astype(out_dtype)


def _qconv1d(x, qw, padding, out_dtype):
    """NLC int8 conv, per-tensor dynamic activation scale."""
    sx = jnp.max(jnp.abs(x)).astype(jnp.float32)
    sx = jnp.maximum(sx, 1e-12) / 127.0
    xq = jnp.clip(
        jnp.rint(x.astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, qw["q"],
        window_strides=(1,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sx * qw["s"]) + qw["bias"]
    return out.astype(out_dtype)


# --------------------------------------------------------------------------
# forward builder
# --------------------------------------------------------------------------

def _q_bn_trunk(p, stats):
    """Quantize a ``_BNTrunk``: BN running stats folded into each Dense."""
    out, i = {}, 0
    while f"dense_{i}" in p:
        bn, st = p[f"bn_{i}"], stats[f"bn_{i}"]
        fold = fold_bn(bn["scale"], bn["bias"], st["mean"], st["var"],
                       p[f"dense_{i}"]["bias"])
        out[f"dense_{i}"] = _q_dense(p[f"dense_{i}"], fold=fold)
        i += 1
    return out


def _q_subnetwork(p):
    q = {"proj": _q_dense(p["proj"]), "layers": []}
    t = p["transformer"]
    for li in range(2):
        lp = t[f"layers_{li}"]
        e = lp["norm1"]["scale"].shape[-1]
        a = lp["self_attn"]
        q["layers"].append({
            "v": _q_linear_t(a["in_proj_weight"][2 * e:],
                             a["in_proj_bias"][2 * e:]),
            "out": _q_linear_t(a["out_proj_weight"], a["out_proj_bias"]),
            "linear1": _q_dense(lp["linear1"]),
            "linear2": _q_dense(lp["linear2"]),
            "norm1": lp["norm1"], "norm2": lp["norm2"],
        })
    q["norm"] = p["norm"]
    return q


def _q_cross_modal(p):
    e = p["norm"]["scale"].shape[-1]
    a = p["attn"]
    return {
        "v": _q_linear_t(a["in_proj_weight"][2 * e:],
                         a["in_proj_bias"][2 * e:]),
        "out": _q_linear_t(a["out_proj_weight"], a["out_proj_bias"]),
        "gate": _q_dense(p["gate"]),
        "norm": p["norm"],
    }


def build_quantized_serving_forward(variables: dict, feat_dim: int = 256,
                                    compute_dtype=jnp.bfloat16):
    """Jitted int8 eval forward ``(eeg, eye, pps) -> (arousal, valence)``.

    Drop-in replacement for :func:`.serving.build_serving_forward`;
    weights are quantized once here on the host. ``compute_dtype`` is the
    dtype of the float glue between int8 matmuls (bf16 default — the VPU
    work between matmuls is bandwidth-bound).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    dt = compute_dtype

    ep = params["eeg_net"]
    es = stats["eeg_net"]
    qconv1 = _q_conv(ep["conv1_weight"], fold_bn(
        ep["bn1"]["scale"], ep["bn1"]["bias"],
        es["bn1"]["mean"], es["bn1"]["var"], ep["conv1_bias"]))
    qconv2 = _q_conv(ep["conv2_weight"], fold_bn(
        ep["bn2"]["scale"], ep["bn2"]["bias"],
        es["bn2"]["mean"], es["bn2"]["var"], ep["conv2_bias"]))
    qlstm = []
    for k in range(2):
        qlstm.append({
            "f": _q_linear_t(ep[f"lstm{k}_w_ih_fwd"],
                             ep[f"lstm{k}_b_ih_fwd"] + ep[f"lstm{k}_b_hh_fwd"]),
            "b": _q_linear_t(ep[f"lstm{k}_w_ih_bwd"],
                             ep[f"lstm{k}_b_ih_bwd"] + ep[f"lstm{k}_b_hh_bwd"]),
            "whf": jnp.asarray(ep[f"lstm{k}_w_hh_fwd"], dt),
            "whb": jnp.asarray(ep[f"lstm{k}_w_hh_bwd"], dt),
        })
    qfreq1, qfreq2 = _q_dense(ep["freq1"]), _q_dense(ep["freq2"])
    qfusion = _q_dense(ep["fusion_dense"])
    fusion_ln = ep["fusion_ln"]

    qeye = _q_subnetwork(params["eye_net"])
    qpps = _q_subnetwork(params["pps_net"])
    qe2p = _q_cross_modal(params["cross_attn_e2p"])
    qp2e = _q_cross_modal(params["cross_attn_p2e"])
    qw1, qw2 = _q_dense(params["attn_w1"]), _q_dense(params["attn_w2"])
    qstack = _q_bn_trunk(params["fusion_stack"], stats["fusion_stack"])
    qheads = {
        n: {"trunk": _q_bn_trunk(params[n]["trunk"], stats[n]["trunk"]),
            "out": _q_dense(params[n]["out"])}
        for n in ("arousal_head", "valence_head")
    }
    pe_row = make_sincos_pe(feat_dim, 1)[0]

    def trunk(q, x):
        for i in range(len(q)):
            x = _gelu(_qdot(x, q[f"dense_{i}"], dt))
        return x

    def subnet(q, x):
        h = _qdot(x, q["proj"], dt) + pe_row.astype(dt)
        for lp in q["layers"]:
            attn = _qdot(_qdot(h, lp["v"], dt), lp["out"], dt)
            h = _ln(lp["norm1"], h + attn)
            ff = _qdot(jax.nn.relu(_qdot(h, lp["linear1"], dt)),
                       lp["linear2"], dt)
            h = _ln(lp["norm2"], h + ff)
        return _ln(q["norm"], h)

    def cross(q, query, value):
        attn = _qdot(_qdot(value, q["v"], dt), q["out"], dt)
        gate = jax.nn.sigmoid(
            _qdot(jnp.concatenate([query, attn], axis=1), q["gate"], dt))
        return _ln(q["norm"], gate * query + (1.0 - gate) * attn)

    @jax.jit
    def forward(eeg, eye, pps):
        eeg, eye, pps = (a.astype(dt) for a in (eeg, eye, pps))

        xt = jnp.transpose(eeg, (0, 2, 1))  # (B, T, C)
        h = max_pool1d(_gelu(_qconv1d(xt, qconv1, 7, dt)), 4)
        h = max_pool1d(_gelu(_qconv1d(h, qconv2, 2, dt)), 2)
        freq = _qdot(_gelu(_qdot(eeg.mean(axis=1), qfreq1, dt)), qfreq2, dt)
        for lw in qlstm:
            xf = _qdot(h, lw["f"], dt)
            xb = _qdot(jnp.flip(h, axis=1), lw["b"], dt)
            h = bilstm_recurrence(xf, xb, lw["whf"], lw["whb"])
        temp_feat = h.mean(axis=1)
        eeg_feat = _gelu(_ln(
            fusion_ln,
            _qdot(jnp.concatenate([temp_feat, freq], axis=1), qfusion, dt)))

        eye_feat = subnet(qeye, eye)
        pps_feat = subnet(qpps, pps)
        eye_enh = cross(qe2p, eeg_feat, eye_feat)
        pps_enh = cross(qp2e, eeg_feat, pps_feat)

        concat = jnp.concatenate([eeg_feat, eye_feat, pps_feat], axis=1)
        w = jax.nn.softmax(
            _qdot(_gelu(_qdot(concat, qw1, dt)), qw2, dt), axis=1)
        fused = jnp.concatenate(
            [eeg_feat * w[:, 0:1], eye_enh * w[:, 1:2], pps_enh * w[:, 2:3]],
            axis=1,
        )
        fused = trunk(qstack, fused)
        arousal = _qdot(trunk(qheads["arousal_head"]["trunk"], fused),
                        qheads["arousal_head"]["out"], jnp.float32)
        valence = _qdot(trunk(qheads["valence_head"]["trunk"], fused),
                        qheads["valence_head"]["out"], jnp.float32)
        return arousal, valence

    return forward
