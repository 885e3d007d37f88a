"""Twin-training accuracy parity: the rebuild vs a torch twin, same data.

The real MAHNOB-HCI pickle isn't distributed, so BASELINE.md's LOSO accuracy
rows can't be checked directly. This is the strongest available parity
statement instead (VERDICT round 1, item 5): train the torch twin of the
flagship model (the builder from ``test_full_model_parity``) and the JAX
rebuild from the SAME initial weights, on the SAME synthetic planted-signal
data, with the SAME batch plans and hyperparameters (AdamW 1e-4 / wd 0.01 /
clip 1.0, CE both heads + learnable-weighted InfoNCE — reference
``Trainer.py:63-81``), dropout off so the only divergence source is float
noise.

Measured (CPU, 10 epochs): step-0 loss identical to 4 decimals
(51.9750 both), per-epoch mean losses track to <0.01 absolute the whole
run (epoch 1: 36.3546 torch / 36.3607 jax; epoch 10: 1.3837 / 1.3848),
and both reach 100% train AND held-out accuracy. The assertions keep
margin for platform-dependent float noise (the temperature-0.01 InfoNCE
amplifies tiny differences) but pin the trajectory, not just the
endpoint.

Summarized in README.md ("Accuracy parity").
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
from multimodal_sentiment_aanalysis_tpu.models import MultimodalTransformerModel
from multimodal_sentiment_aanalysis_tpu.ops.losses import (
    masked_accuracy,
    masked_cross_entropy,
)
from multimodal_sentiment_aanalysis_tpu.train.state import clip_by_global_norm

EPOCHS = 10
BATCH = 64
LR, WD = 1e-4, 0.01


def _torch_infonce(feat, labels, t):
    f = tF.normalize(feat, dim=1)
    sim = f @ f.T / t
    pos = (labels[:, None] == labels[None, :]).float()
    pos = pos * (1.0 - torch.eye(len(labels)))
    sim = sim - sim.max(dim=1, keepdim=True).values
    e = sim.exp()
    return (
        -torch.log((e * pos).sum(1) + 1e-12) + torch.log(e.sum(1) + 1e-12)
    ).mean()


def _torch_forward(tm, eeg, eye, pps):
    fe = tm.eeg_net(eeg)
    fy = tm.eye_net(eye)
    fp = tm.pps_net(pps)
    ey = tm.cross_e2p(fe, fy, fy)
    pp = tm.cross_p2e(fe, fp, fp)
    concat = torch.cat([fe, fy, fp], dim=1)
    w = torch.softmax(tm.attn_w2(tm.act(tm.attn_w1(concat))), dim=1)
    fused = torch.cat([fe * w[:, 0:1], ey * w[:, 1:2], pp * w[:, 2:3]], dim=1)
    fused = tm.fusion(fused)
    return (tm.arousal_out(tm.arousal_trunk(fused)),
            tm.valence_out(tm.valence_trunk(fused)), fe, fy, fp)


@pytest.mark.slow
def test_twin_training_trajectories_and_accuracy_match():
    # ---- shared data: one LOSO split of the synthetic planted-signal set
    from multimodal_sentiment_aanalysis_tpu.data import (
        assemble_features,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.data.splits import loso_split

    data = make_synthetic_hci_data(seed=42)
    feats, _ = assemble_features(
        data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    la = np.asarray(data["arousal_label"]).reshape(-1).astype(np.int64)
    lv = np.asarray(data["valence_label"]).reshape(-1).astype(np.int64)
    tr_idx, te_idx = loso_split(la.shape[0] // 20, 20, 0)

    eeg = feats["eeg"].astype(np.float32)
    eye = feats["eye"].astype(np.float32)
    pps = feats["pps"].astype(np.float32)

    # shared per-epoch batch plans (full batches; same order on both sides)
    rng = np.random.default_rng(7)
    nb = len(tr_idx) // BATCH
    plans = np.stack(
        [tr_idx[rng.permutation(len(tr_idx))[: nb * BATCH]].reshape(nb, BATCH)
         for _ in range(EPOCHS)]
    )  # (E, nb, B)

    # ---- torch twin, dropout off, shared initial weights ---------------
    torch.manual_seed(11)
    tm = fmp.TorchFullModel().train()
    for mod in tm.modules():
        if isinstance(mod, tnn.Dropout):
            mod.p = 0.0
        if isinstance(mod, tnn.MultiheadAttention):
            mod.dropout = 0.0
    temp = tnn.Parameter(torch.tensor(0.01))
    model_cw = tnn.Parameter(torch.ones(1))
    trainer_cw = tnn.Parameter(torch.ones(1))
    tparams = list(tm.parameters()) + [temp, model_cw, trainer_cw]

    params0 = {
        "eeg_net": fmp._eeg_params(tm.eeg_net),
        "eye_net": fmp._subnetwork_params(tm.eye_net),
        "pps_net": fmp._subnetwork_params(tm.pps_net),
        "cross_attn_e2p": fmp._cross_params(tm.cross_e2p),
        "cross_attn_p2e": fmp._cross_params(tm.cross_p2e),
        "attn_w1": fmp._dense(tm.attn_w1),
        "attn_w2": fmp._dense(tm.attn_w2),
        "fusion_stack": fmp._trunk_params(tm.fusion),
        "arousal_head": {"trunk": fmp._trunk_params(tm.arousal_trunk),
                         "out": fmp._dense(tm.arousal_out)},
        "valence_head": {"trunk": fmp._trunk_params(tm.valence_trunk),
                         "out": fmp._dense(tm.valence_out)},
        "contrastive_weight": fmp._np(model_cw),
        "temperature": fmp._np(temp).reshape(()),
    }
    bs0 = {
        "eeg_net": {"bn1": fmp._bn_stats(tm.eeg_net.bn1),
                    "bn2": fmp._bn_stats(tm.eeg_net.bn2)},
        "fusion_stack": fmp._trunk_stats(tm.fusion),
        "arousal_head": {"trunk": fmp._trunk_stats(tm.arousal_trunk)},
        "valence_head": {"trunk": fmp._trunk_stats(tm.valence_trunk)},
    }
    # IMPORTANT: fmp._np returns numpy VIEWS of torch storage, and
    # jnp.asarray on the CPU backend is zero-copy — without np.copy the
    # torch optimizer's in-place updates would leak into the JAX params.
    snap = lambda tree: jax.tree.map(lambda x: jnp.asarray(np.copy(x)), tree)
    jparams = snap({
        "model": params0,
        "trainer": {"contrastive_weight": np.ones((1,), np.float32)},
    })
    jbs = snap(bs0)

    # ---- step-0 loss parity (before any update) -------------------------
    idx0 = plans[0, 0]
    with torch.no_grad():
        a0, v0, fe0, fy0, fp0 = _torch_forward(
            tm, torch.from_numpy(eeg[idx0]), torch.from_numpy(eye[idx0]),
            torch.from_numpy(pps[idx0]))
        tla0 = torch.from_numpy(la[idx0])
        t_loss0 = float(
            tF.cross_entropy(a0, tla0)
            + tF.cross_entropy(v0, torch.from_numpy(lv[idx0]))
            + _torch_infonce(fe0, tla0, temp) + _torch_infonce(fy0, tla0, temp)
            + _torch_infonce(fp0, tla0, temp))

    # ---- torch training loop -------------------------------------------
    opt = torch.optim.AdamW(tparams, lr=LR, weight_decay=WD)
    t_losses = []
    for e in range(EPOCHS):
        ep = 0.0
        for b in range(nb):
            idx = plans[e, b]
            opt.zero_grad()
            a, v, fe, fy, fp = _torch_forward(
                tm, torch.from_numpy(eeg[idx]), torch.from_numpy(eye[idx]),
                torch.from_numpy(pps[idx]),
            )
            tla = torch.from_numpy(la[idx])
            ce = tF.cross_entropy(a, tla) + tF.cross_entropy(
                v, torch.from_numpy(lv[idx]))
            con = model_cw[0] * (
                _torch_infonce(fe, tla, temp) + _torch_infonce(fy, tla, temp)
                + _torch_infonce(fp, tla, temp))
            loss = ce + trainer_cw[0] * con
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tparams, 1.0)
            opt.step()
            ep += float(loss)
        t_losses.append(ep / nb)
    tm.eval()
    with torch.no_grad():
        ta, _, *_ = _torch_forward(
            tm, torch.from_numpy(eeg[te_idx]), torch.from_numpy(eye[te_idx]),
            torch.from_numpy(pps[te_idx]))
        at, _, *_ = _torch_forward(
            tm, torch.from_numpy(eeg[tr_idx]), torch.from_numpy(eye[tr_idx]),
            torch.from_numpy(pps[tr_idx]))
    t_test_acc = float((ta.argmax(1).numpy() == la[te_idx]).mean())
    t_train_acc = float((at.argmax(1).numpy() == la[tr_idx]).mean())

    # ---- JAX training loop (engine objective, same plans) ---------------
    model = MultimodalTransformerModel(dropout=0.0)
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(jparams)
    ones = jnp.ones(BATCH, jnp.float32)

    def loss_fn(params, batch_stats, batch):
        outs, mutated = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            batch["eeg"], batch["eye"], batch["pps"],
            labels=(batch["a"], batch["v"], ones),
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )
        a, v, c1, c2, c3 = outs
        ce = masked_cross_entropy(a, batch["a"], ones) + \
            masked_cross_entropy(v, batch["v"], ones)
        loss = ce + params["trainer"]["contrastive_weight"][0] * (c1 + c2 + c3)
        return loss, mutated["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        grads, _ = clip_by_global_norm(grads, 1.0)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    batch0 = {"eeg": jnp.asarray(eeg[idx0]), "eye": jnp.asarray(eye[idx0]),
              "pps": jnp.asarray(pps[idx0]), "a": jnp.asarray(la[idx0]),
              "v": jnp.asarray(lv[idx0])}
    j_loss0 = float(loss_fn(jparams, jbs, batch0)[0])

    j_losses = []
    for e in range(EPOCHS):
        ep = 0.0
        for b in range(nb):
            idx = plans[e, b]
            batch = {"eeg": jnp.asarray(eeg[idx]), "eye": jnp.asarray(eye[idx]),
                     "pps": jnp.asarray(pps[idx]), "a": jnp.asarray(la[idx]),
                     "v": jnp.asarray(lv[idx])}
            jparams, jbs, opt_state, loss = step(jparams, jbs, opt_state, batch)
            ep += float(loss)
        j_losses.append(ep / nb)

    @jax.jit
    def eval_logits(params, batch_stats, eeg_, eye_, pps_):
        return model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            eeg_, eye_, pps_)

    ja, _ = eval_logits(jparams, jbs, jnp.asarray(eeg[te_idx]),
                        jnp.asarray(eye[te_idx]), jnp.asarray(pps[te_idx]))
    jat, _ = eval_logits(jparams, jbs, jnp.asarray(eeg[tr_idx]),
                         jnp.asarray(eye[tr_idx]), jnp.asarray(pps[tr_idx]))
    j_test_acc = float((np.asarray(ja).argmax(1) == la[te_idx]).mean())
    j_train_acc = float((np.asarray(jat).argmax(1) == la[tr_idx]).mean())

    print(f"step-0 loss: torch {t_loss0:.4f} jax {j_loss0:.4f}")
    print(f"torch losses: {np.round(t_losses, 4)}")
    print(f"jax   losses: {np.round(j_losses, 4)}")
    print(f"train acc torch {t_train_acc:.3f} jax {j_train_acc:.3f}; "
          f"test acc torch {t_test_acc:.3f} jax {j_test_acc:.3f}")

    # forward parity at the shared starting point (pre-update)
    assert abs(t_loss0 - j_loss0) < 1e-2 * max(abs(t_loss0), 1.0)
    # per-epoch losses track throughout (measured <0.01 abs; margin for
    # float noise amplified by the temp-0.01 InfoNCE)
    for tl, jl in zip(t_losses, j_losses):
        assert abs(tl - jl) < 0.05 * max(abs(tl), 1.0), (t_losses, j_losses)
    assert abs(t_losses[-1] - j_losses[-1]) < 0.15, (t_losses, j_losses)
    # both learn the planted signal, and agree on where they land
    assert t_train_acc > 0.8 and j_train_acc > 0.8
    assert abs(t_train_acc - j_train_acc) < 0.1
    assert abs(t_test_acc - j_test_acc) < 0.2  # 20-row split: 0.05/row
