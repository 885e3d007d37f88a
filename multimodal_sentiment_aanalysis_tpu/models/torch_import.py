"""Import reference PyTorch checkpoints into the flax flagship model.

Migration bridge: a user of the reference trains
``MultimodalTransformerModel`` (``MultimodalModel.py:152-322``) and saves
``state_dict()`` files (``MultiTaskTrainer.py:670-673``, ``Tester.py:29-35``).
This module converts such a ``state_dict`` — flat ``name -> tensor`` with
the reference's module names (``eeg_net.temp_conv.0.weight``,
``eye_net.transformer.layers.1.self_attn.in_proj_weight``, …) — into this
framework's ``{"params", "batch_stats"}`` variable collections, so trained
reference checkpoints evaluate and serve here without retraining.

Layout conventions (pinned by ``tests/test_torch_import.py`` end-to-end —
imported variables reproduce the torch model's logits, and structurally by
``tests/test_full_model_parity.py``'s tree assertion):

- ``nn.Linear`` ``(out, in)`` weights transpose into flax ``(in, out)``
  kernels; biases carry over.
- Conv1d / MultiheadAttention / LSTM weights keep the torch layout — the
  flax modules here consume torch-layout tensors directly (see
  ``models/layers.py``, ``models/eeg.py``).
- BatchNorm splits: weight/bias -> ``params`` scale/bias,
  running_mean/var -> ``batch_stats`` mean/var; ``num_batches_tracked``
  and the ``pos_encoder.pe`` buffer are dropped (the flax positional
  encoding is computed, not stored).
- ``module.``-prefixed (DataParallel-saved) checkpoints are accepted; the
  prefix is stripped.

Values may be torch tensors or numpy arrays — torch is NOT required to
use :func:`variables_from_torch_state_dict` (only for
:func:`load_torch_checkpoint`, which wraps ``torch.load``).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _a(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _dense(sd: Mapping[str, Any], k: str) -> dict:
    return {"kernel": _a(sd[f"{k}.weight"]).T, "bias": _a(sd[f"{k}.bias"])}


def _ln(sd: Mapping[str, Any], k: str) -> dict:
    return {"scale": _a(sd[f"{k}.weight"]), "bias": _a(sd[f"{k}.bias"])}


def _bn_params(sd: Mapping[str, Any], k: str) -> dict:
    return {"scale": _a(sd[f"{k}.weight"]), "bias": _a(sd[f"{k}.bias"])}


def _bn_stats(sd: Mapping[str, Any], k: str) -> dict:
    return {
        "mean": _a(sd[f"{k}.running_mean"]),
        "var": _a(sd[f"{k}.running_var"]),
    }


def _mha(sd: Mapping[str, Any], k: str) -> dict:
    return {
        "in_proj_weight": _a(sd[f"{k}.in_proj_weight"]),
        "in_proj_bias": _a(sd[f"{k}.in_proj_bias"]),
        "out_proj_weight": _a(sd[f"{k}.out_proj.weight"]),
        "out_proj_bias": _a(sd[f"{k}.out_proj.bias"]),
    }


def _bn_indices(sd: Mapping[str, Any], prefix: str) -> list[int]:
    """Sequential indices holding BatchNorm layers under ``prefix``."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.running_mean$")
    return sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))


def _trunk(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """A reference [Linear, BN, GELU, Dropout]*N trunk -> (params, stats).

    BN positions are discovered from the keys, so the same walker covers
    the fusion stack (2 pairs), arousal trunk (1) and valence trunk (4)
    (``MultimodalModel.py:179-225``)."""
    params: dict = {}
    stats: dict = {}
    for j, bn_i in enumerate(_bn_indices(sd, prefix)):
        params[f"dense_{j}"] = _dense(sd, f"{prefix}.{bn_i - 1}")
        params[f"bn_{j}"] = _bn_params(sd, f"{prefix}.{bn_i}")
        stats[f"bn_{j}"] = _bn_stats(sd, f"{prefix}.{bn_i}")
    return params, stats


def _head(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """Trunk + final Linear (3 positions after the last BN)."""
    trunk, stats = _trunk(sd, prefix)
    out_i = _bn_indices(sd, prefix)[-1] + 3
    return (
        {"trunk": trunk, "out": _dense(sd, f"{prefix}.{out_i}")},
        {"trunk": stats},
    )


def _subnetwork(sd: Mapping[str, Any], prefix: str) -> dict:
    layer_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(
                re.escape(prefix) + r"\.transformer\.layers\.(\d+)\.", k
            ))
        }
    )
    transformer = {
        f"layers_{i}": {
            "self_attn": _mha(sd, f"{prefix}.transformer.layers.{i}.self_attn"),
            "linear1": _dense(sd, f"{prefix}.transformer.layers.{i}.linear1"),
            "linear2": _dense(sd, f"{prefix}.transformer.layers.{i}.linear2"),
            "norm1": _ln(sd, f"{prefix}.transformer.layers.{i}.norm1"),
            "norm2": _ln(sd, f"{prefix}.transformer.layers.{i}.norm2"),
        }
        for i in layer_ids
    }
    return {
        "proj": _dense(sd, f"{prefix}.proj"),
        "transformer": transformer,
        "norm": _ln(sd, f"{prefix}.norm"),
    }


def _cross_modal(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "attn": _mha(sd, f"{prefix}.multihead_attn"),
        "gate": _dense(sd, f"{prefix}.gate.0"),
        "norm": _ln(sd, f"{prefix}.norm"),
    }


def _eeg_net(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    # temp_conv Sequential: Conv(0) BN(1) GELU Drop Pool Conv(5) BN(6) …
    # (MultimodalModel.py:28-39); freq_branch Linear(0) GELU Linear(2);
    # fusion Linear(0) LayerNorm(1)
    p: dict = {
        "conv1_weight": _a(sd[f"{prefix}.temp_conv.0.weight"]),
        "conv1_bias": _a(sd[f"{prefix}.temp_conv.0.bias"]),
        "bn1": _bn_params(sd, f"{prefix}.temp_conv.1"),
        "conv2_weight": _a(sd[f"{prefix}.temp_conv.5.weight"]),
        "conv2_bias": _a(sd[f"{prefix}.temp_conv.5.bias"]),
        "bn2": _bn_params(sd, f"{prefix}.temp_conv.6"),
        "freq1": _dense(sd, f"{prefix}.freq_branch.0"),
        "freq2": _dense(sd, f"{prefix}.freq_branch.2"),
        "fusion_dense": _dense(sd, f"{prefix}.fusion.0"),
        "fusion_ln": _ln(sd, f"{prefix}.fusion.1"),
    }
    layers = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(
                re.escape(prefix) + r"\.bilstm\.weight_ih_l(\d+)$", k
            ))
        }
    )
    for k in layers:
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            for part in ("w_ih", "w_hh", "b_ih", "b_hh"):
                torch_part = part.replace("w_", "weight_").replace(
                    "b_", "bias_"
                )
                p[f"lstm{k}_{part}_{direction}"] = _a(
                    sd[f"{prefix}.bilstm.{torch_part}_l{k}{suffix}"]
                )
    stats = {
        "bn1": _bn_stats(sd, f"{prefix}.temp_conv.1"),
        "bn2": _bn_stats(sd, f"{prefix}.temp_conv.6"),
    }
    return p, stats


def variables_from_torch_state_dict(
    state_dict: Mapping[str, Any],
) -> dict:
    """Reference ``MultimodalTransformerModel.state_dict()`` -> flax
    ``{"params": …, "batch_stats": …}`` for
    :class:`..models.MultimodalTransformerModel`.

    Accepts torch tensors or numpy arrays as values, with or without a
    ``module.`` (DataParallel) prefix.
    """
    from ..utils.checkpoint import strip_module_prefix

    sd = strip_module_prefix(dict(state_dict))

    eeg_p, eeg_s = _eeg_net(sd, "eeg_net")
    fusion_p, fusion_s = _trunk(sd, "fusion")
    arousal_p, arousal_s = _head(sd, "arousal_head")
    valence_p, valence_s = _head(sd, "valence_head")
    params = {
        "eeg_net": eeg_p,
        "eye_net": _subnetwork(sd, "eye_net"),
        "pps_net": _subnetwork(sd, "pps_net"),
        "cross_attn_e2p": _cross_modal(sd, "cross_attn_e2p"),
        "cross_attn_p2e": _cross_modal(sd, "cross_attn_p2e"),
        "attn_w1": _dense(sd, "attention_weights.0"),
        "attn_w2": _dense(sd, "attention_weights.2"),
        "fusion_stack": fusion_p,
        "arousal_head": arousal_p,
        "valence_head": valence_p,
        "contrastive_weight": _a(
            sd.get("contrastive_weight", np.ones((1,), np.float32))
        ),
        "temperature": _a(sd.get("temperature", np.float32(0.1))).reshape(()),
    }
    batch_stats = {
        "eeg_net": eeg_s,
        "fusion_stack": fusion_s,
        "arousal_head": arousal_s,
        "valence_head": valence_s,
    }
    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# SimCLR-family import (reference ``MultimodalModel.py:325-451``): the
# pretrain/finetune stack saves three separate state_dicts (encoder,
# projection head, classifier — reference ``train.py:141-205`` keeps them
# as separate modules). Layouts pinned by
# ``tests/test_reference_oracle.py::test_reference_simclr_stack_oracle``,
# which drives the ACTUAL reference training code from these weights.
# ---------------------------------------------------------------------------


def _relu_bn_mlp(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """Reference Eye/PPS MLP: Sequential Linear(0) ReLU BN(2) Linear(3)
    ReLU BN(5) (``MultimodalModel.py:325-354``). The flax twins wrap the
    block in a ``_ReluBNMLP`` submodule named ``net`` (models/simclr.py),
    so the tree nests one level below the torch attribute."""
    params = {"net": {
        "dense_0": _dense(sd, f"{prefix}.net.0"),
        "bn_0": _bn_params(sd, f"{prefix}.net.2"),
        "dense_1": _dense(sd, f"{prefix}.net.3"),
        "bn_1": _bn_params(sd, f"{prefix}.net.5"),
    }}
    stats = {"net": {
        "bn_0": _bn_stats(sd, f"{prefix}.net.2"),
        "bn_1": _bn_stats(sd, f"{prefix}.net.5"),
    }}
    return params, stats


def simclr_encoder_variables_from_torch_state_dict(
    state_dict: Mapping[str, Any],
) -> dict:
    """Reference ``MultiModalEncoder.state_dict()`` -> flax variables for
    :class:`..models.simclr.MultiModalEncoder` (``MultimodalModel.py:
    357-406``: flagship EEG encoder + Eye/PPS MLPs + 8-head MHA fusion +
    Linear/ReLU/BN fusion MLP)."""
    from ..utils.checkpoint import strip_module_prefix

    sd = strip_module_prefix(dict(state_dict))
    eeg_p, eeg_s = _eeg_net(sd, "eeg_net")
    eye_p, eye_s = _relu_bn_mlp(sd, "eye_net")
    pps_p, pps_s = _relu_bn_mlp(sd, "pps_net")
    params = {
        "eeg_net": eeg_p,
        "eye_net": eye_p,
        "pps_net": pps_p,
        "multihead_attn": _mha(sd, "multihead_attn"),
        "fusion_dense": _dense(sd, "fusion_mlp.0"),
        "fusion_bn": _bn_params(sd, "fusion_mlp.2"),
    }
    batch_stats = {
        "eeg_net": eeg_s,
        "eye_net": eye_s,
        "pps_net": pps_s,
        "fusion_bn": _bn_stats(sd, "fusion_mlp.2"),
    }
    return {"params": params, "batch_stats": batch_stats}


def simclr_projection_variables_from_torch_state_dict(
    state_dict: Mapping[str, Any],
) -> dict:
    """Reference ``ProjectionHead.state_dict()`` (Sequential Linear(0)
    ReLU BN(2) Dropout Linear(4) ReLU BN(6) Dropout Linear(8);
    ``MultimodalModel.py:409-430``) -> flax variables for
    :class:`..models.simclr.ProjectionHead`."""
    from ..utils.checkpoint import strip_module_prefix

    sd = strip_module_prefix(dict(state_dict))
    params = {
        "dense_0": _dense(sd, "net.0"),
        "bn_0": _bn_params(sd, "net.2"),
        "dense_1": _dense(sd, "net.4"),
        "bn_1": _bn_params(sd, "net.6"),
        "out": _dense(sd, "net.8"),
    }
    batch_stats = {
        "bn_0": _bn_stats(sd, "net.2"),
        "bn_1": _bn_stats(sd, "net.6"),
    }
    return {"params": params, "batch_stats": batch_stats}


def simclr_classifier_variables_from_torch_state_dict(
    state_dict: Mapping[str, Any],
) -> dict:
    """Reference ``Classifier.state_dict()`` (shared Linear(0) ReLU
    Dropout + two head Linears; ``MultimodalModel.py:432-451``) -> flax
    variables for :class:`..models.simclr.Classifier`."""
    from ..utils.checkpoint import strip_module_prefix

    sd = strip_module_prefix(dict(state_dict))
    return {
        "params": {
            "shared": _dense(sd, "shared.0"),
            "fc_arousal": _dense(sd, "fc_arousal"),
            "fc_valence": _dense(sd, "fc_valence"),
        }
    }


# ---------------------------------------------------------------------------
# ME-MHACL family import (reference ``ME-MHACL/model.py:7-119``): per-modality
# Conv1d/BN/ReLU stacks + GAP + Linear, 8-head MHA fusion with mean pooling.
# The ProjectionHead/Classifier layouts are identical to the SimCLR family's
# (same Sequential indices), so those importers are shared. Pinned by
# ``tests/test_reference_oracle.py::test_reference_memhacl_oracle``.
# ---------------------------------------------------------------------------


def _conv_gap_stack(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """Reference conv encoder: Sequential of Conv1d/BN1d/ReLU repeats +
    AdaptiveAvgPool1d + Flatten + Linear -> flax ``_ConvStack``
    (models/memhacl.py) params/stats. Conv1d weights keep the torch
    ``(out, in, k)`` layout (``models/eeg.py::conv1d`` consumes it)."""
    conv_is: list[int] = []
    lin_i = None
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.weight$")
    for k, v in sd.items():
        m = pat.match(k)
        if not m:
            continue
        i, a = int(m.group(1)), _a(v)
        if a.ndim == 3:
            conv_is.append(i)
        elif a.ndim == 2:
            lin_i = i
    conv_is.sort()
    params: dict = {"proj": _dense(sd, f"{prefix}.{lin_i}")}
    stats: dict = {}
    for j, (ci, bi) in enumerate(zip(conv_is, _bn_indices(sd, prefix))):
        params[f"conv{j}_weight"] = _a(sd[f"{prefix}.{ci}.weight"])
        params[f"conv{j}_bias"] = _a(sd[f"{prefix}.{ci}.bias"])
        params[f"bn{j}"] = _bn_params(sd, f"{prefix}.{bi}")
        stats[f"bn{j}"] = _bn_stats(sd, f"{prefix}.{bi}")
    return params, stats


def memhacl_encoder_variables_from_torch_state_dict(
    state_dict: Mapping[str, Any],
) -> dict:
    """Reference ME-MHACL ``MultiModalEncoder.state_dict()`` -> flax
    variables for :class:`..models.memhacl.MEMHACLEncoder`
    (``ME-MHACL/model.py:7-74``)."""
    from ..utils.checkpoint import strip_module_prefix

    sd = strip_module_prefix(dict(state_dict))
    params, batch_stats = {}, {}
    for name in ("eeg_encoder", "eye_encoder", "phy_encoder"):
        params[name], batch_stats[name] = _conv_gap_stack(sd, name)
    params["multihead_attn"] = _mha(sd, "multihead_attn")
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """``torch.load`` a reference checkpoint file (``.pt``/``.pth``,
    a ``state_dict`` or a dict containing one) and convert it."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return variables_from_torch_state_dict(obj)
