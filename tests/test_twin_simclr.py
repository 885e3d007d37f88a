"""SimCLR-stack twin: pretrain -> frozen finetune, torch vs the rebuild.

VERDICT r3 gap #2: the single-stage objective and the 5-phase curriculum
had end-to-end torch twins, but the contrastive pretrain -> frozen-encoder
finetune STACK (reference ``train.py:45-138`` over
``MultimodalModel.py:357-451``) had loss-level parity only. This test
trains the torch twin of ``MultiModalEncoder`` + ``ProjectionHead`` +
``Classifier`` and the flax rebuild from IDENTICAL initial weights, on the
SAME planted-signal pairs with the SAME batch plans and hyperparameters
(Adam 1e-3 pretrain with two-view supervised NT-Xent temp 0.1; Adam 1e-4
finetune, joint CE, frozen eval-mode encoder — the rebuild's documented
deviation from the reference's train-mode "frozen" encoder is applied to
BOTH sides so the twins stay comparable). Dropout off, so the only
divergence source is float noise.

Asserts: step-0 pretrain loss parity, per-epoch pretrain AND finetune loss
trajectories track, and final test accuracies agree.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp
import optax

import test_full_model_parity as fmp
from multimodal_sentiment_aanalysis_tpu.models import (
    Classifier,
    MultiModalEncoder,
    ProjectionHead,
)
from multimodal_sentiment_aanalysis_tpu.ops.losses import (
    ntxent_supervised_two_view,
)

PRE_EPOCHS, FT_EPOCHS = 5, 5
PAIR_BATCH, FT_BATCH = 64, 50
PRE_LR, FT_LR, TEMP = 1e-3, 1e-4, 0.1


# ---------------------------------------------------------------------------
# torch twins (reference MultimodalModel.py:325-451)
# ---------------------------------------------------------------------------


class TorchMLPNet(tnn.Module):
    def __init__(self, in_dim):
        super().__init__()
        self.fc1 = tnn.Linear(in_dim, 128)
        self.bn1 = tnn.BatchNorm1d(128)
        self.fc2 = tnn.Linear(128, 256)
        self.bn2 = tnn.BatchNorm1d(256)

    def forward(self, x):
        x = self.bn1(tF.relu(self.fc1(x)))
        return self.bn2(tF.relu(self.fc2(x)))


class TorchEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.eeg_net = fmp.TorchEEGNet()
        self.eye_net = TorchMLPNet(38)
        self.pps_net = TorchMLPNet(230)
        self.attn = tnn.MultiheadAttention(256, 8, batch_first=True)
        self.fusion = tnn.Linear(256, 256)
        self.fusion_bn = tnn.BatchNorm1d(256)

    def forward(self, eeg, eye, pps):
        fe = tF.normalize(self.eeg_net(eeg), dim=-1)
        fy = tF.normalize(self.eye_net(eye), dim=-1)
        fp = tF.normalize(self.pps_net(pps), dim=-1)
        feats = torch.stack([fe, fy, fp], dim=1)
        att, _ = self.attn(feats, feats, feats)
        fused = att.max(dim=1).values
        return self.fusion_bn(tF.relu(self.fusion(fused)))


class TorchProjection(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = tnn.Linear(256, 256)
        self.bn1 = tnn.BatchNorm1d(256)
        self.fc2 = tnn.Linear(256, 128)
        self.bn2 = tnn.BatchNorm1d(128)
        self.out = tnn.Linear(128, 128)

    def forward(self, x):  # dropout off by construction
        x = self.bn1(tF.relu(self.fc1(x)))
        x = self.bn2(tF.relu(self.fc2(x)))
        return self.out(x)


class TorchClassifier(tnn.Module):
    def __init__(self):
        super().__init__()
        self.shared = tnn.Linear(256, 128)
        self.fc_a = tnn.Linear(128, 3)
        self.fc_v = tnn.Linear(128, 3)

    def forward(self, x):
        h = tF.relu(self.shared(x))
        return self.fc_a(h), self.fc_v(h)


def _torch_ntxent(z1, z2, labels, t):
    # reference train.py:16-40 numerics
    za, zb = tF.normalize(z1, dim=1), tF.normalize(z2, dim=1)
    z = torch.cat([za, zb])
    sim = z @ z.T / t
    lab = torch.cat([labels.view(-1, 1), labels.view(-1, 1)])
    mask = (lab == lab.T).float()
    self_mask = torch.eye(len(z), dtype=torch.bool)
    mask = mask.masked_fill(self_mask, 0)
    e = sim.exp().masked_fill(self_mask, 0)
    log_prob = sim - torch.log(e.sum(1, keepdim=True) + 1e-8)
    return (-(mask * log_prob).sum(1) / (mask.sum(1) + 1e-8)).mean()


def _mlp_params(m):
    return {"net": {
        "dense_0": fmp._dense(m.fc1), "bn_0": fmp._bn_params(m.bn1),
        "dense_1": fmp._dense(m.fc2), "bn_1": fmp._bn_params(m.bn2),
    }}


def _mlp_stats(m):
    return {"net": {
        "bn_0": fmp._bn_stats(m.bn1), "bn_1": fmp._bn_stats(m.bn2),
    }}


@pytest.mark.slow
def test_simclr_stack_twin_trajectories_match():
    # ---- shared data: planted-signal synthetic, LOSO subject 0 ----------
    from multimodal_sentiment_aanalysis_tpu.data import (
        assemble_features,
        build_contrastive_pairs,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.data.splits import loso_split

    n_subj, ex = 6, 20
    data = make_synthetic_hci_data(seed=42, n_subjects=n_subj, ex_nums=ex)
    feats, _ = assemble_features(
        data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    la = np.asarray(data["arousal_label"]).reshape(-1).astype(np.int64)
    lv = np.asarray(data["valence_label"]).reshape(-1).astype(np.int64)
    tr_idx, te_idx = loso_split(n_subj, ex, 0)
    eeg = feats["eeg"].astype(np.float32)
    eye = feats["eye"].astype(np.float32)
    pps = feats["pps"].astype(np.float32)

    pair_idx, pair_lab = build_contrastive_pairs(
        la[tr_idx], lv[tr_idx], tr_idx // ex, seed=3
    )
    pair_idx = tr_idx[pair_idx]  # split-local -> dataset row indices
    rng = np.random.default_rng(5)
    nbp = len(pair_idx) // PAIR_BATCH
    pre_plans = np.stack([
        rng.permutation(len(pair_idx))[: nbp * PAIR_BATCH].reshape(
            nbp, PAIR_BATCH)
        for _ in range(PRE_EPOCHS)
    ])  # (E, nb, B) indices into the pair table
    nbf = len(tr_idx) // FT_BATCH
    ft_plans = np.stack([
        tr_idx[rng.permutation(len(tr_idx))[: nbf * FT_BATCH]].reshape(
            nbf, FT_BATCH)
        for _ in range(FT_EPOCHS)
    ])

    # ---- torch stack, dropout off, weights exported to the flax twin ----
    torch.manual_seed(21)
    tenc, tproj, tclf = TorchEncoder(), TorchProjection(), TorchClassifier()

    enc_params0 = {
        "eeg_net": fmp._eeg_params(tenc.eeg_net),
        "eye_net": _mlp_params(tenc.eye_net),
        "pps_net": _mlp_params(tenc.pps_net),
        "multihead_attn": fmp._mha(tenc.attn),
        "fusion_dense": fmp._dense(tenc.fusion),
        "fusion_bn": fmp._bn_params(tenc.fusion_bn),
    }
    enc_stats0 = {
        "eeg_net": {"bn1": fmp._bn_stats(tenc.eeg_net.bn1),
                    "bn2": fmp._bn_stats(tenc.eeg_net.bn2)},
        "eye_net": _mlp_stats(tenc.eye_net),
        "pps_net": _mlp_stats(tenc.pps_net),
        "fusion_bn": fmp._bn_stats(tenc.fusion_bn),
    }
    proj_params0 = {
        "dense_0": fmp._dense(tproj.fc1), "bn_0": fmp._bn_params(tproj.bn1),
        "dense_1": fmp._dense(tproj.fc2), "bn_1": fmp._bn_params(tproj.bn2),
        "out": fmp._dense(tproj.out),
    }
    proj_stats0 = {"bn_0": fmp._bn_stats(tproj.bn1),
                   "bn_1": fmp._bn_stats(tproj.bn2)}
    clf_params0 = {
        "shared": fmp._dense(tclf.shared),
        "fc_arousal": fmp._dense(tclf.fc_a),
        "fc_valence": fmp._dense(tclf.fc_v),
    }
    # fmp._np returns VIEWS of torch storage; copy before the torch
    # optimizer mutates them in place
    snap = lambda t: jax.tree.map(lambda x: jnp.asarray(np.copy(x)), t)
    jparams = snap({"enc": enc_params0, "proj": proj_params0})
    jbs = snap({"enc": enc_stats0, "proj": proj_stats0})

    # ---- torch pretrain (reference train.py:45-80, dropout off) ---------
    t_pre = []
    opt = torch.optim.Adam(
        list(tenc.parameters()) + list(tproj.parameters()), lr=PRE_LR
    )
    T = lambda a: torch.from_numpy(a)
    t_loss0 = None
    tenc.train(), tproj.train()
    for e in range(PRE_EPOCHS):
        ep = 0.0
        for b in range(nbp):
            rows = pair_idx[pre_plans[e, b]]
            labs = T(pair_lab[pre_plans[e, b]])
            i1, i2 = rows[:, 0], rows[:, 1]
            z1 = tproj(tenc(T(eeg[i1]), T(eye[i1]), T(pps[i1])))
            z2 = tproj(tenc(T(eeg[i2]), T(eye[i2]), T(pps[i2])))
            loss = _torch_ntxent(z1, z2, labs, TEMP)
            if t_loss0 is None:
                t_loss0 = float(loss)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ep += float(loss)
        t_pre.append(ep / nbp)

    # ---- torch finetune (train.py:83-138; eval-mode frozen encoder — the
    # rebuild's documented deviation, applied to both twins) ---------------
    tenc.eval()
    for p in tenc.parameters():
        p.requires_grad = False
    fopt = torch.optim.Adam(tclf.parameters(), lr=FT_LR)
    t_ft = []
    for e in range(FT_EPOCHS):
        ep = 0.0
        tclf.train()
        for b in range(nbf):
            idx = ft_plans[e, b]
            with torch.no_grad():
                f = tenc(T(eeg[idx]), T(eye[idx]), T(pps[idx]))
            oa, ov = tclf(f)
            loss = tF.cross_entropy(oa, T(la[idx])) + tF.cross_entropy(
                ov, T(lv[idx]))
            fopt.zero_grad()
            loss.backward()
            fopt.step()
            ep += float(loss)
        t_ft.append(ep / nbf)
    tclf.eval()
    with torch.no_grad():
        fte = tenc(T(eeg[te_idx]), T(eye[te_idx]), T(pps[te_idx]))
        oa, ov = tclf(fte)
    t_acc_a = float((oa.argmax(1).numpy() == la[te_idx]).mean())
    t_acc_v = float((ov.argmax(1).numpy() == lv[te_idx]).mean())

    # ---- flax stack: same semantics as train/simclr.py, shared plans ----
    encoder = MultiModalEncoder(dropout=0.0)
    projector = ProjectionHead(dropout=0.0)
    classifier = Classifier(dropout=0.0)
    tx = optax.adam(PRE_LR)
    opt_state = tx.init(jparams)
    eeg_d, eye_d, pps_d = map(jnp.asarray, (eeg, eye, pps))

    def encode(params, bs, idx, train=True):
        e = encoder.apply(
            {"params": params["enc"], "batch_stats": bs["enc"]},
            eeg_d[idx], eye_d[idx], pps_d[idx],
            train=train, mutable=["batch_stats"] if train else False,
        )
        if not train:
            return e
        feat, mut = e
        z, pmut = projector.apply(
            {"params": params["proj"], "batch_stats": bs["proj"]},
            feat, train=True, mutable=["batch_stats"],
        )
        return z, {"enc": mut["batch_stats"], "proj": pmut["batch_stats"]}

    def pre_loss(params, bs, rows, labs):
        z1, bs1 = encode(params, bs, rows[:, 0])
        z2, bs2 = encode(params, bs1, rows[:, 1])
        return ntxent_supervised_two_view(z1, z2, labs, TEMP), bs2

    @jax.jit
    def pre_step(params, bs, opt_state, rows, labs):
        (loss, nbs), grads = jax.value_and_grad(pre_loss, has_aux=True)(
            params, bs, rows, labs)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nbs, opt_state, loss

    j_loss0 = float(pre_loss(
        jparams, jbs,
        jnp.asarray(pair_idx[pre_plans[0, 0]]),
        jnp.asarray(pair_lab[pre_plans[0, 0]]))[0])

    j_pre = []
    for e in range(PRE_EPOCHS):
        ep = 0.0
        for b in range(nbp):
            jparams, jbs, opt_state, loss = pre_step(
                jparams, jbs, opt_state,
                jnp.asarray(pair_idx[pre_plans[e, b]]),
                jnp.asarray(pair_lab[pre_plans[e, b]]),
            )
            ep += float(loss)
        j_pre.append(ep / nbp)

    enc_vars = {"params": jparams["enc"], "batch_stats": jbs["enc"]}
    cparams = snap(clf_params0)
    ftx = optax.adam(FT_LR)
    fopt_state = ftx.init(cparams)

    def ft_loss(cp, feat, a, v):
        oa, ov = classifier.apply({"params": cp}, feat, train=True,
                                  rngs={"dropout": jax.random.key(0)})
        ones = jnp.ones(a.shape[0], jnp.float32)
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            masked_cross_entropy,
        )
        return masked_cross_entropy(oa, a, ones) + \
            masked_cross_entropy(ov, v, ones)

    @jax.jit
    def ft_step(cp, fopt_state, idx, a, v):
        feat = encoder.apply(enc_vars, eeg_d[idx], eye_d[idx], pps_d[idx])
        loss, grads = jax.value_and_grad(ft_loss)(cp, feat, a, v)
        updates, fopt_state = ftx.update(grads, fopt_state, cp)
        return optax.apply_updates(cp, updates), fopt_state, loss

    j_ft = []
    for e in range(FT_EPOCHS):
        ep = 0.0
        for b in range(nbf):
            idx = ft_plans[e, b]
            cparams, fopt_state, loss = ft_step(
                cparams, fopt_state, jnp.asarray(idx),
                jnp.asarray(la[idx]), jnp.asarray(lv[idx]))
            ep += float(loss)
        j_ft.append(ep / nbf)

    @jax.jit
    def j_eval(cp, idx):
        feat = encoder.apply(enc_vars, eeg_d[idx], eye_d[idx], pps_d[idx])
        return classifier.apply({"params": cp}, feat)

    ja, jv = j_eval(cparams, jnp.asarray(te_idx))
    j_acc_a = float((np.asarray(ja).argmax(1) == la[te_idx]).mean())
    j_acc_v = float((np.asarray(jv).argmax(1) == lv[te_idx]).mean())

    print(f"step-0 pretrain loss: torch {t_loss0:.4f} jax {j_loss0:.4f}")
    print(f"torch pretrain: {np.round(t_pre, 4)}")
    print(f"jax   pretrain: {np.round(j_pre, 4)}")
    print(f"torch finetune: {np.round(t_ft, 4)}")
    print(f"jax   finetune: {np.round(j_ft, 4)}")
    print(f"test acc torch a/v {t_acc_a:.3f}/{t_acc_v:.3f} "
          f"jax {j_acc_a:.3f}/{j_acc_v:.3f}")

    # forward parity at the shared starting point (pre-update)
    assert abs(t_loss0 - j_loss0) < 1e-2 * max(abs(t_loss0), 1.0)
    # pretrain and finetune loss trajectories track throughout
    for tl, jl in zip(t_pre, j_pre):
        assert abs(tl - jl) < 0.05 * max(abs(tl), 1.0), (t_pre, j_pre)
    for tl, jl in zip(t_ft, j_ft):
        assert abs(tl - jl) < 0.08 * max(abs(tl), 1.0), (t_ft, j_ft)
    # the finetuned twins agree on held-out accuracy (20-row split)
    assert abs(t_acc_a - j_acc_a) <= 0.2
    assert abs(t_acc_v - j_acc_v) <= 0.2
