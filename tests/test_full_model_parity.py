"""Full-model logits parity: MultimodalTransformerModel vs a torch build.

The torch model below is re-expressed from the architecture documented in
SURVEY.md §2 #7-#11 (reference ``MultimodalModel.py:24-322``) — conv/BN/
GELU/pool EEG stem + freq branch + 2-layer BiLSTM, eye/pps transformer
subnetworks, gated cross-modal attention, softmax modality weighting,
fusion MLP, dual heads. Weights are generated in torch and mapped into the
flax variable tree; eval-mode logits must agree to float tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

from multimodal_sentiment_aanalysis_tpu.models import MultimodalTransformerModel

torch.manual_seed(0)
F = 256  # feat dim


class TorchEEGNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv1d(32, 64, 15, padding=7)
        self.bn1 = tnn.BatchNorm1d(64)
        self.conv2 = tnn.Conv1d(64, F, 5, padding=2)
        self.bn2 = tnn.BatchNorm1d(F)
        self.pool1 = tnn.MaxPool1d(4)
        self.pool2 = tnn.MaxPool1d(2)
        self.act = tnn.GELU()
        self.freq1 = tnn.Linear(585, 128)
        self.freq2 = tnn.Linear(128, 64)
        self.lstm = tnn.LSTM(F, F // 2, num_layers=2, bidirectional=True,
                             batch_first=True)
        self.fusion_dense = tnn.Linear(F + 64, F)
        self.fusion_ln = tnn.LayerNorm(F)

    def forward(self, x):  # (B, 32, 585)
        h = self.pool1(self.act(self.bn1(self.conv1(x))))
        h = self.pool2(self.act(self.bn2(self.conv2(h))))
        freq = self.freq2(self.act(self.freq1(x.mean(dim=1))))
        h, _ = self.lstm(h.transpose(1, 2))
        temp = h.mean(dim=1)
        return self.act(self.fusion_ln(self.fusion_dense(
            torch.cat([temp, freq], dim=1))))


class TorchSubnetwork(tnn.Module):
    def __init__(self, input_dim):
        super().__init__()
        self.proj = tnn.Linear(input_dim, F)
        layer = tnn.TransformerEncoderLayer(
            d_model=F, nhead=4, dim_feedforward=3 * F, dropout=0.3,
            batch_first=True)
        self.transformer = tnn.TransformerEncoder(layer, num_layers=2)
        self.norm = tnn.LayerNorm(F)
        pe = torch.zeros(1, F)
        position = torch.arange(1, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(torch.arange(0, F, 2).float() * (-np.log(10000.0) / F))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)

    def forward(self, x):
        h = self.proj(x).unsqueeze(1) + self.pe
        h = self.transformer(h)
        return self.norm(h[:, 0])


class TorchCrossModal(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attn = tnn.MultiheadAttention(F, 4, batch_first=True)
        self.gate = tnn.Linear(2 * F, F)
        self.norm = tnn.LayerNorm(F)

    def forward(self, q, k, v):
        a, _ = self.attn(q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1))
        a = a[:, 0]
        g = torch.sigmoid(self.gate(torch.cat([q, a], dim=1)))
        return self.norm(g * q + (1 - g) * a)


def _bn_trunk(widths, in_dim):
    mods = []
    d = in_dim
    for w in widths:
        mods += [tnn.Linear(d, w), tnn.BatchNorm1d(w), tnn.GELU(),
                 tnn.Dropout(0.3)]
        d = w
    return tnn.Sequential(*mods), d


class TorchFullModel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.eeg_net = TorchEEGNet()
        self.eye_net = TorchSubnetwork(38)
        self.pps_net = TorchSubnetwork(230)
        self.cross_e2p = TorchCrossModal()
        self.cross_p2e = TorchCrossModal()
        self.attn_w1 = tnn.Linear(3 * F, 64)
        self.attn_w2 = tnn.Linear(64, 3)
        self.fusion, d = _bn_trunk((F, 128), 3 * F)
        self.arousal_trunk, da = _bn_trunk((128,), d)
        self.arousal_out = tnn.Linear(da, 3)
        self.valence_trunk, dv = _bn_trunk((256, 256, 128, 64), d)
        self.valence_out = tnn.Linear(dv, 3)
        self.act = tnn.GELU()

    def forward(self, eeg, eye, pps):
        fe = self.eeg_net(eeg)
        fy = self.eye_net(eye)
        fp = self.pps_net(pps)
        ey = self.cross_e2p(fe, fy, fy)
        pp = self.cross_p2e(fe, fp, fp)
        concat = torch.cat([fe, fy, fp], dim=1)
        w = torch.softmax(self.attn_w2(self.act(self.attn_w1(concat))), dim=1)
        fused = torch.cat([fe * w[:, 0:1], ey * w[:, 1:2], pp * w[:, 2:3]],
                          dim=1)
        fused = self.fusion(fused)
        return self.arousal_out(self.arousal_trunk(fused)), \
            self.valence_out(self.valence_trunk(fused))


# ---------------------------------------------------------------------------
# weight mapping torch -> flax
# ---------------------------------------------------------------------------

def _np(x):
    return x.detach().numpy()


def _dense(lin):
    return {"kernel": _np(lin.weight).T, "bias": _np(lin.bias)}


def _ln(ln):
    return {"scale": _np(ln.weight), "bias": _np(ln.bias)}


def _bn_params(bn):
    return {"scale": _np(bn.weight), "bias": _np(bn.bias)}


def _bn_stats(bn):
    return {"mean": _np(bn.running_mean), "var": _np(bn.running_var)}


def _mha(attn):
    return {
        "in_proj_weight": _np(attn.in_proj_weight),
        "in_proj_bias": _np(attn.in_proj_bias),
        "out_proj_weight": _np(attn.out_proj.weight),
        "out_proj_bias": _np(attn.out_proj.bias),
    }


def _subnetwork_params(sub):
    t = {}
    for i, layer in enumerate(sub.transformer.layers):
        t[f"layers_{i}"] = {
            "self_attn": _mha(layer.self_attn),
            "linear1": _dense(layer.linear1),
            "linear2": _dense(layer.linear2),
            "norm1": _ln(layer.norm1),
            "norm2": _ln(layer.norm2),
        }
    return {"proj": _dense(sub.proj), "transformer": t, "norm": _ln(sub.norm)}


def _cross_params(cm):
    return {"attn": _mha(cm.attn), "gate": _dense(cm.gate), "norm": _ln(cm.norm)}


def _trunk_params(seq):
    p, i = {}, 0
    for mod in seq:
        if isinstance(mod, tnn.Linear):
            p[f"dense_{i}"] = _dense(mod)
        elif isinstance(mod, tnn.BatchNorm1d):
            p[f"bn_{i}"] = _bn_params(mod)
            i += 1
    return p


def _trunk_stats(seq):
    s, i = {}, 0
    for mod in seq:
        if isinstance(mod, tnn.BatchNorm1d):
            s[f"bn_{i}"] = _bn_stats(mod)
            i += 1
    return s


def _eeg_params(net):
    p = {
        "conv1_weight": _np(net.conv1.weight),
        "conv1_bias": _np(net.conv1.bias),
        "conv2_weight": _np(net.conv2.weight),
        "conv2_bias": _np(net.conv2.bias),
        "bn1": _bn_params(net.bn1),
        "bn2": _bn_params(net.bn2),
        "freq1": _dense(net.freq1),
        "freq2": _dense(net.freq2),
        "fusion_dense": _dense(net.fusion_dense),
        "fusion_ln": _ln(net.fusion_ln),
    }
    for k in range(2):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            p[f"lstm{k}_w_ih_{direction}"] = _np(
                getattr(net.lstm, f"weight_ih_l{k}{suffix}"))
            p[f"lstm{k}_w_hh_{direction}"] = _np(
                getattr(net.lstm, f"weight_hh_l{k}{suffix}"))
            p[f"lstm{k}_b_ih_{direction}"] = _np(
                getattr(net.lstm, f"bias_ih_l{k}{suffix}"))
            p[f"lstm{k}_b_hh_{direction}"] = _np(
                getattr(net.lstm, f"bias_hh_l{k}{suffix}"))
    return p


def test_full_model_logits_match_torch():
    tm = TorchFullModel().eval()
    # randomize BN running stats so inference-BN mapping is truly exercised
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(5, 32, 585)).astype(np.float32)
    eye = rng.normal(size=(5, 38)).astype(np.float32)
    pps = rng.normal(size=(5, 230)).astype(np.float32)

    with torch.no_grad():
        ta, tv = tm(torch.from_numpy(eeg), torch.from_numpy(eye),
                    torch.from_numpy(pps))

    params = {
        "eeg_net": _eeg_params(tm.eeg_net),
        "eye_net": _subnetwork_params(tm.eye_net),
        "pps_net": _subnetwork_params(tm.pps_net),
        "cross_attn_e2p": _cross_params(tm.cross_e2p),
        "cross_attn_p2e": _cross_params(tm.cross_p2e),
        "attn_w1": _dense(tm.attn_w1),
        "attn_w2": _dense(tm.attn_w2),
        "fusion_stack": _trunk_params(tm.fusion),
        "arousal_head": {"trunk": _trunk_params(tm.arousal_trunk),
                         "out": _dense(tm.arousal_out)},
        "valence_head": {"trunk": _trunk_params(tm.valence_trunk),
                         "out": _dense(tm.valence_out)},
        "contrastive_weight": np.ones((1,), np.float32),
        "temperature": np.asarray(0.01, np.float32),
    }
    batch_stats = {
        "eeg_net": {"bn1": _bn_stats(tm.eeg_net.bn1),
                    "bn2": _bn_stats(tm.eeg_net.bn2)},
        "fusion_stack": _trunk_stats(tm.fusion),
        "arousal_head": {"trunk": _trunk_stats(tm.arousal_trunk)},
        "valence_head": {"trunk": _trunk_stats(tm.valence_trunk)},
    }

    model = MultimodalTransformerModel()
    ref = model.init(jax.random.key(0), eeg[:2], eye[:2], pps[:2])
    # structural agreement between mapped tree and the real variable tree
    ref_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths, (
        f"missing: {ref_paths - got_paths}\nextra: {got_paths - ref_paths}"
    )

    ja, jv = model.apply(
        {"params": params, "batch_stats": batch_stats}, eeg, eye, pps
    )
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=2e-4)
