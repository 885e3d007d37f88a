"""Phased-curriculum twin training: MultiTaskTrainer vs a torch twin.

Extends the single-stage twin experiment (``test_twin_training.py``) to the
5-phase curriculum (reference ``MultiTaskTrainer.py:50-177, 556-673``): the
torch twin reproduces the reference's control flow — per-phase
``requires_grad`` sets, the phase-3 asymmetry (fusion modules get grads and
enter the clip norm but the optimizer covers the valence head only), and
the per-epoch optimizer rebuild — while the JAX side runs the production
:class:`MultiTaskTrainer` host loop in parity mode. Same initial weights,
same batch plans (shared host-RNG stream), dropout off. Asserts per-phase
per-epoch loss trajectories track and final params agree.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

import test_full_model_parity as fmp
from test_twin_training import _torch_forward, _torch_infonce

BATCH = 64
N_TRAIN = 256  # 4 full batches: no wrap-pad, so torch needs no masking
SEED = 31
CURRICULUM = (("eeg", 2), ("eye", 2), ("pps", 2),
              ("fusion_arousal", 2), ("valence", 2))


@pytest.mark.slow
def test_phased_twin_trajectories_match():
    from multimodal_sentiment_aanalysis_tpu.data import (
        DeviceDataset,
        assemble_features,
        make_synthetic_hci_data,
    )
    from multimodal_sentiment_aanalysis_tpu.data.pipeline import (
        epoch_batch_indices,
    )
    from multimodal_sentiment_aanalysis_tpu.data.splits import loso_split
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )
    from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer
    from multimodal_sentiment_aanalysis_tpu.train.multitask import PHASES

    # ---- shared data: subject-0 LOSO split, trimmed to full batches ----
    data = make_synthetic_hci_data(seed=42)
    feats, _ = assemble_features(
        data, ["eeg", "eye", "pps"], norm="Z_score", label_type="arousal"
    )
    la = np.asarray(data["arousal_label"]).reshape(-1).astype(np.int64)
    lv = np.asarray(data["valence_label"]).reshape(-1).astype(np.int64)
    tr_idx, te_idx = loso_split(la.shape[0] // 20, 20, 0)
    tr_idx = tr_idx[:N_TRAIN]
    eeg = feats["eeg"].astype(np.float32)
    eye = feats["eye"].astype(np.float32)
    pps = feats["pps"].astype(np.float32)

    # ---- torch twin with shared initial weights ------------------------
    torch.manual_seed(5)
    tm = fmp.TorchFullModel().train()
    for mod in tm.modules():
        if isinstance(mod, tnn.Dropout):
            mod.p = 0.0
        if isinstance(mod, tnn.MultiheadAttention):
            mod.dropout = 0.0
    temp = torch.tensor(0.01)        # never trained in any phase
    model_cw = torch.ones(1)         # (not in any module set)

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
        "contrastive_weight": np.ones((1,), np.float32),
        "temperature": np.asarray(0.01, np.float32),
    }
    bs0 = {
        "eeg_net": {"bn1": fmp._bn_stats(tm.eeg_net.bn1),
                    "bn2": fmp._bn_stats(tm.eeg_net.bn2)},
        "fusion_stack": fmp._trunk_stats(tm.fusion),
        "arousal_head": {"trunk": fmp._trunk_stats(tm.arousal_trunk)},
        "valence_head": {"trunk": fmp._trunk_stats(tm.valence_trunk)},
    }
    snap = lambda tree: jax.tree.map(lambda x: jnp.asarray(np.copy(x)), tree)
    # SNAPSHOT NOW: the fmp._* helpers return numpy VIEWS of torch
    # storage, and the torch training below updates in place — the JAX
    # twin must start from the INITIAL weights
    jparams0 = snap(params0)
    jbs0 = snap(bs0)

    torch_modules = {
        "eeg_net": [tm.eeg_net], "eye_net": [tm.eye_net],
        "pps_net": [tm.pps_net],
        "cross_attn_e2p": [tm.cross_e2p], "cross_attn_p2e": [tm.cross_p2e],
        "attn_w1": [tm.attn_w1], "attn_w2": [tm.attn_w2],
        "fusion_stack": [tm.fusion],
        "arousal_head": [tm.arousal_trunk, tm.arousal_out],
        "valence_head": [tm.valence_trunk, tm.valence_out],
    }

    def params_of(names):
        out = []
        for n in names:
            for m in torch_modules[n]:
                out.extend(m.parameters())
        return out

    def phase_loss(phase, idx):
        a, v, fe, fy, fp = _torch_forward(
            tm, torch.from_numpy(eeg[idx]), torch.from_numpy(eye[idx]),
            torch.from_numpy(pps[idx]),
        )
        tla = torch.from_numpy(la[idx])
        if phase == "eeg":
            return model_cw[0] * _torch_infonce(fe, tla, temp)
        if phase == "eye":
            return model_cw[0] * _torch_infonce(fy, tla, temp)
        if phase == "pps":
            return model_cw[0] * _torch_infonce(fp, tla, temp)
        if phase == "fusion_arousal":
            return tF.cross_entropy(a, tla)
        return tF.cross_entropy(v, torch.from_numpy(lv[idx]))

    all_params = list(tm.parameters())
    rng = np.random.default_rng(SEED)  # same stream the trainer consumes
    t_losses = []
    for phase, epochs in CURRICULUM:
        spec = PHASES[phase]
        gset = params_of(spec.grad_modules)
        uset = params_of(spec.update_modules)
        for p in all_params:
            p.requires_grad_(False)
        for p in gset:
            p.requires_grad_(True)
        for _ in range(epochs):
            # reference quirk: optimizer (and its Adam moments) rebuilt
            # from scratch every epoch
            opt = torch.optim.AdamW(uset, lr=1e-4, weight_decay=1e-4)
            plan, _ = epoch_batch_indices(N_TRAIN, BATCH, rng, shuffle=True)
            ep = 0.0
            for b in range(plan.shape[0]):
                idx = tr_idx[plan[b]]
                opt.zero_grad(set_to_none=True)
                loss = phase_loss(phase, idx)
                loss.backward()
                # clip over the requires-grad set (torch clip_grad_norm_)
                torch.nn.utils.clip_grad_norm_(gset, 1.0)
                opt.step()
                ep += float(loss)
            t_losses.append(ep / plan.shape[0])

    # ---- JAX side: the production MultiTaskTrainer host loop -----------
    model = MultimodalTransformerModel(dropout=0.0)
    train_ds = DeviceDataset({
        "eeg": eeg[tr_idx], "eye": eye[tr_idx], "pps": pps[tr_idx],
        "arousal": la[tr_idx], "valence": lv[tr_idx],
    })
    test_ds = DeviceDataset({
        "eeg": eeg[te_idx], "eye": eye[te_idx], "pps": pps[te_idx],
        "arousal": la[te_idx], "valence": lv[te_idx],
    })
    mt = MultiTaskTrainer(
        model, train_ds, test_ds, batch_size=BATCH, seed=SEED,
        verbose=False,
    )
    # shared starting point: overwrite the fresh init with the torch copy
    # (snapshotted before the torch loop ran)
    mt.params = jparams0
    mt.batch_stats = jbs0
    mt.run(2, 2, 2, 2, 2, save=False, plot=False)
    j_losses = mt.metrics["train"]["loss"]

    print(f"torch losses: {np.round(t_losses, 4)}")
    print(f"jax   losses: {np.round(j_losses, 4)}")
    assert len(j_losses) == len(t_losses) == 10
    # per-epoch per-phase losses track throughout the curriculum
    for i, (tl, jl) in enumerate(zip(t_losses, j_losses)):
        assert abs(tl - jl) < 0.05 * max(abs(tl), 1.0), (i, t_losses, j_losses)

    # final params agree (phase-by-phase freeze/update sets matched, else
    # entire modules would have diverged or stayed frozen wrongly)
    tfinal = {
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
    }
    deltas = {
        k: max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(jax.tree.leaves(tfinal[k]),
                            jax.tree.leaves(mt.params[k]))
        )
        for k in tfinal
    }
    print("per-module max param delta:", deltas)
    assert max(deltas.values()) < 5e-3, deltas
    # the phase-3 asymmetry really happened: valence head moved in both,
    # and the frozen-in-phase-3 fusion modules still match tightly
    assert deltas["valence_head"] < 5e-3
