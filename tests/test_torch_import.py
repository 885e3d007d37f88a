"""Reference torch-checkpoint ingestion (models/torch_import.py).

Uses the parity-proven ``TorchFullModel`` twin from
``test_full_model_parity`` (its logits == the flax model's under the
hand-built weight map). Here its ``state_dict`` is RENAMED into the
reference's key schema (``MultimodalModel.py`` module names:
``eeg_net.temp_conv.0.weight`` …), run through
:func:`variables_from_torch_state_dict`, and the imported variables must
reproduce the torch logits — i.e. the exact bytes a reference user's
``torch.save(model.state_dict())`` produces evaluate correctly here.
"""

import numpy as np
import pytest
import torch

from multimodal_sentiment_aanalysis_tpu.models import (
    MultimodalTransformerModel,
    variables_from_torch_state_dict,
)

from test_full_model_parity import TorchFullModel

pytestmark = pytest.mark.fast


def _reference_keyed_state_dict(tm: TorchFullModel) -> dict:
    """Rename the twin's state_dict into the reference's key schema."""
    ren = {
        # EEG stem: attribute names -> reference Sequential positions
        # (MultimodalModel.py:28-62)
        "eeg_net.conv1.": "eeg_net.temp_conv.0.",
        "eeg_net.bn1.": "eeg_net.temp_conv.1.",
        "eeg_net.conv2.": "eeg_net.temp_conv.5.",
        "eeg_net.bn2.": "eeg_net.temp_conv.6.",
        "eeg_net.freq1.": "eeg_net.freq_branch.0.",
        "eeg_net.freq2.": "eeg_net.freq_branch.2.",
        "eeg_net.lstm.": "eeg_net.bilstm.",
        "eeg_net.fusion_dense.": "eeg_net.fusion.0.",
        "eeg_net.fusion_ln.": "eeg_net.fusion.1.",
        # cross-modal blocks (:108-122)
        "cross_e2p.attn.": "cross_attn_e2p.multihead_attn.",
        "cross_e2p.gate.": "cross_attn_e2p.gate.0.",
        "cross_e2p.norm.": "cross_attn_e2p.norm.",
        "cross_p2e.attn.": "cross_attn_p2e.multihead_attn.",
        "cross_p2e.gate.": "cross_attn_p2e.gate.0.",
        "cross_p2e.norm.": "cross_attn_p2e.norm.",
        # modality-weight MLP (:171-177)
        "attn_w1.": "attention_weights.0.",
        "attn_w2.": "attention_weights.2.",
        # trunks: the twin's _bn_trunk Sequential indices match the
        # reference trunks (Linear,BN,GELU,Dropout), only the prefixes
        # and the separate out-linear differ (:179-225)
        "arousal_trunk.": "arousal_head.",
        "arousal_out.": "arousal_head.4.",
        "valence_trunk.": "valence_head.",
        "valence_out.": "valence_head.16.",
        "fusion.": "fusion.",
        "eye_net.": "eye_net.",
        "pps_net.": "pps_net.",
    }
    out = {}
    for k, v in tm.state_dict().items():
        for old, new in sorted(ren.items(), key=lambda kv: -len(kv[0])):
            if k.startswith(old):
                out[new + k[len(old):]] = v
                break
        else:
            raise AssertionError(f"unmapped twin key {k}")
    # learnable loss params the twin doesn't carry (:228-230)
    out["contrastive_weight"] = torch.ones(1)
    out["temperature"] = torch.tensor(0.01)
    return out


@pytest.fixture(scope="module")
def torch_model_and_inputs():
    torch.manual_seed(3)
    tm = TorchFullModel().eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
    rng = np.random.default_rng(7)
    eeg = rng.normal(size=(4, 32, 585)).astype(np.float32)
    eye = rng.normal(size=(4, 38)).astype(np.float32)
    pps = rng.normal(size=(4, 230)).astype(np.float32)
    with torch.no_grad():
        ta, tv = tm(torch.from_numpy(eeg), torch.from_numpy(eye),
                    torch.from_numpy(pps))
    return tm, (eeg, eye, pps), (ta.numpy(), tv.numpy())


def _assert_logits_match(variables, inputs, expected):
    import jax

    eeg, eye, pps = inputs
    model = MultimodalTransformerModel()
    # imported tree must match the model's real variable structure
    ref = model.init(jax.random.key(0), eeg[:2], eye[:2], pps[:2])
    for col in ("params", "batch_stats"):
        ref_paths = {jax.tree_util.keystr(k) for k, _ in
                     jax.tree_util.tree_flatten_with_path(ref[col])[0]}
        got_paths = {jax.tree_util.keystr(k) for k, _ in
                     jax.tree_util.tree_flatten_with_path(variables[col])[0]}
        assert ref_paths == got_paths, (
            f"{col} missing: {ref_paths - got_paths}\n"
            f"extra: {got_paths - ref_paths}"
        )
    ja, jv = model.apply(variables, eeg, eye, pps)
    np.testing.assert_allclose(np.asarray(ja), expected[0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(jv), expected[1], atol=2e-4)


def test_state_dict_import_reproduces_torch_logits(torch_model_and_inputs):
    tm, inputs, expected = torch_model_and_inputs
    variables = variables_from_torch_state_dict(
        _reference_keyed_state_dict(tm)
    )
    _assert_logits_match(variables, inputs, expected)


def test_dataparallel_module_prefix_stripped(torch_model_and_inputs):
    tm, inputs, expected = torch_model_and_inputs
    sd = {f"module.{k}": v
          for k, v in _reference_keyed_state_dict(tm).items()}
    variables = variables_from_torch_state_dict(sd)
    _assert_logits_match(variables, inputs, expected)


def test_torch_file_roundtrip_via_tester_load(torch_model_and_inputs, tmp_path):
    """torch.save -> Tester.load_model('.pt') -> same logits."""
    from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
    from multimodal_sentiment_aanalysis_tpu.eval import Tester

    tm, inputs, expected = torch_model_and_inputs
    path = tmp_path / "reference_ckpt.pt"
    torch.save(_reference_keyed_state_dict(tm), path)

    eeg, eye, pps = inputs
    ds = DeviceDataset({
        "eeg": eeg, "eye": eye, "pps": pps,
        "arousal": np.zeros(len(eeg), np.int64),
        "valence": np.zeros(len(eeg), np.int64),
    })
    tester = Tester(MultimodalTransformerModel(), ds)
    tester.load_model(str(path))
    _assert_logits_match(tester.variables, inputs, expected)
