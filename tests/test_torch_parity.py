"""Op-level numerics parity vs PyTorch (torch-cpu is in the image).

These tests copy weights from freshly-initialized torch layers into our flax
params and assert forward-pass agreement within float32 tolerance — the
"reference-numerics first" requirement of SURVEY.md §7 step 2. They exercise
torch's public API only.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

torch.manual_seed(0)


def t2n(t):
    return t.detach().numpy()


class TestLSTMParity:
    def test_bilstm_2layer(self):
        from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_stack

        B, T, I, H = 4, 9, 12, 8
        ref = torch.nn.LSTM(I, H, num_layers=2, bidirectional=True, batch_first=True)
        x = torch.randn(B, T, I)
        with torch.no_grad():
            out_ref, _ = ref(x)

        layers = []
        for k in range(2):
            layers.append(
                {
                    "w_ih_fwd": jnp.asarray(t2n(getattr(ref, f"weight_ih_l{k}"))),
                    "w_hh_fwd": jnp.asarray(t2n(getattr(ref, f"weight_hh_l{k}"))),
                    "b_ih_fwd": jnp.asarray(t2n(getattr(ref, f"bias_ih_l{k}"))),
                    "b_hh_fwd": jnp.asarray(t2n(getattr(ref, f"bias_hh_l{k}"))),
                    "w_ih_bwd": jnp.asarray(t2n(getattr(ref, f"weight_ih_l{k}_reverse"))),
                    "w_hh_bwd": jnp.asarray(t2n(getattr(ref, f"weight_hh_l{k}_reverse"))),
                    "b_ih_bwd": jnp.asarray(t2n(getattr(ref, f"bias_ih_l{k}_reverse"))),
                    "b_hh_bwd": jnp.asarray(t2n(getattr(ref, f"bias_hh_l{k}_reverse"))),
                }
            )
        out = bilstm_stack(jnp.asarray(x.numpy()), layers)
        np.testing.assert_allclose(np.asarray(out), t2n(out_ref), atol=2e-5)


class TestMHAParity:
    def test_self_attention(self):
        from multimodal_sentiment_aanalysis_tpu.models.layers import (
            MultiheadAttention,
        )

        B, T, E, H = 3, 5, 16, 4
        ref = torch.nn.MultiheadAttention(E, H, batch_first=True)
        x = torch.randn(B, T, E)
        with torch.no_grad():
            out_ref, _ = ref(x, x, x)

        mod = MultiheadAttention(E, H)
        params = {
            "params": {
                "in_proj_weight": jnp.asarray(t2n(ref.in_proj_weight)),
                "in_proj_bias": jnp.asarray(t2n(ref.in_proj_bias)),
                "out_proj_weight": jnp.asarray(t2n(ref.out_proj.weight)),
                "out_proj_bias": jnp.asarray(t2n(ref.out_proj.bias)),
            }
        }
        xj = jnp.asarray(x.numpy())
        out = mod.apply(params, xj, xj, xj)
        np.testing.assert_allclose(np.asarray(out), t2n(out_ref), atol=2e-5)

    def test_cross_attention(self):
        from multimodal_sentiment_aanalysis_tpu.models.layers import (
            MultiheadAttention,
        )

        B, E, H = 3, 16, 4
        ref = torch.nn.MultiheadAttention(E, H, batch_first=True)
        q = torch.randn(B, 1, E)
        k = torch.randn(B, 1, E)
        with torch.no_grad():
            out_ref, _ = ref(q, k, k)
        mod = MultiheadAttention(E, H)
        params = {
            "params": {
                "in_proj_weight": jnp.asarray(t2n(ref.in_proj_weight)),
                "in_proj_bias": jnp.asarray(t2n(ref.in_proj_bias)),
                "out_proj_weight": jnp.asarray(t2n(ref.out_proj.weight)),
                "out_proj_bias": jnp.asarray(t2n(ref.out_proj.bias)),
            }
        }
        out = mod.apply(
            params, jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(k.numpy())
        )
        np.testing.assert_allclose(np.asarray(out), t2n(out_ref), atol=2e-5)


class TestTransformerLayerParity:
    def test_post_norm_layer_eval(self):
        from multimodal_sentiment_aanalysis_tpu.models.layers import (
            TransformerEncoderLayer,
        )

        B, T, E, H, FF = 2, 4, 16, 4, 48
        ref = torch.nn.TransformerEncoderLayer(
            d_model=E, nhead=H, dim_feedforward=FF, dropout=0.3, batch_first=True
        )
        ref.eval()
        x = torch.randn(B, T, E)
        with torch.no_grad():
            out_ref = ref(x)

        mod = TransformerEncoderLayer(E, H, FF, dropout=0.3)
        params = {
            "params": {
                "self_attn": {
                    "in_proj_weight": jnp.asarray(t2n(ref.self_attn.in_proj_weight)),
                    "in_proj_bias": jnp.asarray(t2n(ref.self_attn.in_proj_bias)),
                    "out_proj_weight": jnp.asarray(t2n(ref.self_attn.out_proj.weight)),
                    "out_proj_bias": jnp.asarray(t2n(ref.self_attn.out_proj.bias)),
                },
                "linear1": {
                    "kernel": jnp.asarray(t2n(ref.linear1.weight).T),
                    "bias": jnp.asarray(t2n(ref.linear1.bias)),
                },
                "linear2": {
                    "kernel": jnp.asarray(t2n(ref.linear2.weight).T),
                    "bias": jnp.asarray(t2n(ref.linear2.bias)),
                },
                "norm1": {
                    "scale": jnp.asarray(t2n(ref.norm1.weight)),
                    "bias": jnp.asarray(t2n(ref.norm1.bias)),
                },
                "norm2": {
                    "scale": jnp.asarray(t2n(ref.norm2.weight)),
                    "bias": jnp.asarray(t2n(ref.norm2.bias)),
                },
            }
        }
        out = mod.apply(params, jnp.asarray(x.numpy()), train=False)
        np.testing.assert_allclose(np.asarray(out), t2n(out_ref), atol=3e-5)


class TestConvPoolParity:
    def test_conv_bn_gelu_pool_train_mode(self):
        """EEG stem block: Conv1d+BN(train)+GELU+MaxPool vs torch."""
        from multimodal_sentiment_aanalysis_tpu.models.eeg import conv1d, max_pool1d

        B, C, T, O, K, P = 3, 32, 100, 64, 15, 7
        conv = torch.nn.Conv1d(C, O, K, padding=P)
        bn = torch.nn.BatchNorm1d(O)
        x = torch.randn(B, C, T)
        bn.train()
        with torch.no_grad():
            ref = torch.nn.functional.max_pool1d(
                torch.nn.functional.gelu(bn(conv(x))), 4
            )

        xj = jnp.transpose(jnp.asarray(x.numpy()), (0, 2, 1))
        h = conv1d(xj, jnp.asarray(t2n(conv.weight)), jnp.asarray(t2n(conv.bias)), P)
        # train-mode BN with fresh stats: normalize by biased batch stats
        mean = h.mean(axis=(0, 1))
        var = ((h - mean) ** 2).mean(axis=(0, 1))
        h = (h - mean) / jnp.sqrt(var + 1e-5)
        h = jax.nn.gelu(h, approximate=False)
        h = max_pool1d(h, 4)
        out = jnp.transpose(h, (0, 2, 1))
        np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=2e-5)

    def test_gelu_exact(self):
        x = torch.linspace(-4, 4, 101)
        ref = torch.nn.functional.gelu(x)
        out = jax.nn.gelu(jnp.asarray(x.numpy()), approximate=False)
        np.testing.assert_allclose(np.asarray(out), t2n(ref), atol=1e-6)

    def test_positional_encoding(self):
        import math

        from multimodal_sentiment_aanalysis_tpu.models.layers import make_sincos_pe

        d_model, max_len = 16, 30
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model)
        )
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        ours = make_sincos_pe(d_model, max_len)
        # float32 exp/sin differ slightly between torch and XLA
        np.testing.assert_allclose(np.asarray(ours), pe.numpy(), atol=1e-4)


class TestLossParity:
    def test_supervised_infonce_vs_torch(self):
        """Reference in-model InfoNCE formula, written in torch from its
        mathematical definition (normalize, sim/T, label mask w/o diagonal,
        row-max LSE, -log(pos/all))."""
        from multimodal_sentiment_aanalysis_tpu.ops.losses import supervised_infonce

        B, D = 16, 32
        feat = torch.randn(B, D)
        labels = torch.randint(0, 3, (B,))
        temp = 0.07

        f = torch.nn.functional.normalize(feat, dim=1)
        sim = f @ f.T / temp
        pos = (labels.unsqueeze(1) == labels.unsqueeze(0)).float()
        pos.fill_diagonal_(0)
        sim = sim - sim.max(dim=1, keepdim=True).values
        e = sim.exp()
        ref = (-torch.log((e * pos).sum(1) + 1e-12) + torch.log(e.sum(1) + 1e-12)).mean()

        ours = supervised_infonce(
            jnp.asarray(feat.numpy()), jnp.asarray(feat.numpy()),
            jnp.asarray(labels.numpy()), temp,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_infonce_masked_equals_unpadded(self):
        """Padded batch with mask == unpadded batch exactly."""
        from multimodal_sentiment_aanalysis_tpu.ops.losses import supervised_infonce

        rng = np.random.default_rng(0)
        feat = rng.normal(size=(10, 8)).astype(np.float32)
        labels = rng.integers(0, 3, 10)
        base = supervised_infonce(
            jnp.asarray(feat), jnp.asarray(feat), jnp.asarray(labels), 0.1
        )
        # pad with garbage rows + mask
        pad_feat = np.concatenate([feat, rng.normal(size=(6, 8)).astype(np.float32)])
        pad_labels = np.concatenate([labels, rng.integers(0, 3, 6)])
        mask = np.concatenate([np.ones(10, np.float32), np.zeros(6, np.float32)])
        padded = supervised_infonce(
            jnp.asarray(pad_feat), jnp.asarray(pad_feat),
            jnp.asarray(pad_labels), 0.1, jnp.asarray(mask),
        )
        np.testing.assert_allclose(float(padded), float(base), rtol=1e-5)

    def test_ntxent_indexed_vs_torch(self):
        """Canonical NT-Xent written in torch from its definition."""
        from multimodal_sentiment_aanalysis_tpu.ops.losses import ntxent_indexed

        B, D = 8, 16
        z1, z2 = torch.randn(B, D), torch.randn(B, D)
        z = torch.nn.functional.normalize(torch.cat([z1, z2]), dim=1)
        sim = z @ z.T
        sim.masked_fill_(torch.eye(2 * B, dtype=torch.bool), -9e15)
        sim = sim / 0.5
        tgt = torch.cat([torch.arange(B, 2 * B), torch.arange(0, B)])
        ref = torch.nn.functional.cross_entropy(sim, tgt)
        ours = ntxent_indexed(jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy()), 0.5)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_ntxent_supervised_two_view_vs_torch(self):
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            ntxent_supervised_two_view,
        )

        B, D = 8, 16
        z1, z2 = torch.randn(B, D), torch.randn(B, D)
        labels = torch.randint(0, 2, (B,)).float()
        za = torch.nn.functional.normalize(z1, dim=1)
        zb = torch.nn.functional.normalize(z2, dim=1)
        z = torch.cat([za, zb])
        sim = z @ z.T / 0.1
        lab = torch.cat([labels.view(-1, 1), labels.view(-1, 1)])
        mask = (lab == lab.T).float()
        self_mask = torch.eye(2 * B, dtype=torch.bool)
        mask = mask.masked_fill(self_mask, 0)
        e = sim.exp().masked_fill(self_mask, 0)
        log_prob = sim - torch.log(e.sum(1, keepdim=True) + 1e-8)
        ref = (-(mask * log_prob).sum(1) / (mask.sum(1) + 1e-8)).mean()
        ours = ntxent_supervised_two_view(
            jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy()),
            jnp.asarray(labels.numpy()), 0.1,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.slow
class TestBackwardOptimizerParity:
    """One full-model training step vs torch: CE+contrastive loss backward,
    global-norm clip 1.0, AdamW(1e-4, wd 0.01) — gradients AND updated
    params must agree (reference ``Trainer.py:63-81``,
    ``MultimodalModel.py:232-260``). Dropout off, train-mode BatchNorm."""

    def test_full_model_adamw_step_matches_torch(self):
        import optax
        import test_full_model_parity as fmp
        import torch.nn as tnn
        import torch.nn.functional as tF

        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            masked_cross_entropy,
            supervised_infonce,
        )
        from multimodal_sentiment_aanalysis_tpu.train.state import (
            clip_by_global_norm,
        )

        torch.manual_seed(3)
        tm = fmp.TorchFullModel().train()
        with torch.no_grad():
            for mod in tm.modules():
                if isinstance(mod, tnn.BatchNorm1d):
                    mod.running_mean.normal_(0, 0.2)
                    mod.running_var.uniform_(0.5, 1.5)
        # dropout off everywhere (incl. attention-prob dropout), BN stays
        # in train mode (batch statistics)
        for mod in tm.modules():
            if isinstance(mod, tnn.Dropout):
                mod.p = 0.0
            if isinstance(mod, tnn.MultiheadAttention):
                mod.dropout = 0.0

        temp = tnn.Parameter(torch.tensor(0.01))
        model_cw = tnn.Parameter(torch.ones(1))
        trainer_cw = tnn.Parameter(torch.ones(1))
        tparams = list(tm.parameters()) + [temp, model_cw, trainer_cw]

        rng = np.random.default_rng(1)
        B = 8
        eeg = rng.normal(size=(B, 32, 585)).astype(np.float32)
        eye = rng.normal(size=(B, 38)).astype(np.float32)
        pps = rng.normal(size=(B, 230)).astype(np.float32)
        lab_a = rng.integers(0, 3, B)
        lab_v = rng.integers(0, 3, B)

        def torch_infonce(feat, labels, t):
            f = tF.normalize(feat, dim=1)
            sim = f @ f.T / t
            pos = (labels[:, None] == labels[None, :]).float()
            pos = pos * (1.0 - torch.eye(len(labels)))
            sim = sim - sim.max(dim=1, keepdim=True).values
            e = sim.exp()
            return (
                -torch.log((e * pos).sum(1) + 1e-12)
                + torch.log(e.sum(1) + 1e-12)
            ).mean()

        te, ty, tp = (torch.from_numpy(x) for x in (eeg, eye, pps))
        tla = torch.from_numpy(lab_a)
        fe = tm.eeg_net(te)
        fy = tm.eye_net(ty)
        fp = tm.pps_net(tp)
        ey = tm.cross_e2p(fe, fy, fy)
        pp = tm.cross_p2e(fe, fp, fp)
        concat = torch.cat([fe, fy, fp], dim=1)
        w = torch.softmax(tm.attn_w2(tm.act(tm.attn_w1(concat))), dim=1)
        fused = torch.cat(
            [fe * w[:, 0:1], ey * w[:, 1:2], pp * w[:, 2:3]], dim=1
        )
        fused = tm.fusion(fused)
        ta = tm.arousal_out(tm.arousal_trunk(fused))
        tv = tm.valence_out(tm.valence_trunk(fused))
        ce = tF.cross_entropy(ta, tla) + tF.cross_entropy(
            tv, torch.from_numpy(lab_v)
        )
        con = model_cw[0] * (
            torch_infonce(fe, tla, temp)
            + torch_infonce(fy, tla, temp)
            + torch_infonce(fp, tla, temp)
        )
        tloss = ce + trainer_cw[0] * con
        tloss.backward()
        torch.nn.utils.clip_grad_norm_(tparams, 1.0)

        def extract_model_tree():
            return {
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

        def full_tree():
            return {
                "model": extract_model_tree(),
                "trainer": {"contrastive_weight": fmp._np(trainer_cw)},
            }

        params0 = jax.tree.map(np.copy, full_tree())
        # read clipped grads through the same extractors by temporarily
        # swapping each parameter's data for its grad
        with torch.no_grad():
            saved = [p.data.clone() for p in tparams]
            for p in tparams:
                p.data = p.grad.clone()
            tgrads = jax.tree.map(np.copy, full_tree())
            for p, s in zip(tparams, saved):
                p.data = s

        opt = torch.optim.AdamW(tparams, lr=1e-4, weight_decay=0.01)
        opt.step()
        tparams1 = jax.tree.map(np.copy, full_tree())

        # --- JAX side: identical objective (engine Trainer._loss_fn) -----
        batch_stats = {
            "eeg_net": {"bn1": fmp._bn_stats(tm.eeg_net.bn1),
                        "bn2": fmp._bn_stats(tm.eeg_net.bn2)},
            "fusion_stack": fmp._trunk_stats(tm.fusion),
            "arousal_head": {"trunk": fmp._trunk_stats(tm.arousal_trunk)},
            "valence_head": {"trunk": fmp._trunk_stats(tm.valence_trunk)},
        }
        model = MultimodalTransformerModel(dropout=0.0)
        ones = jnp.ones(B, jnp.float32)

        def loss_fn(params):
            outs, _ = model.apply(
                {"params": params["model"], "batch_stats": batch_stats},
                eeg, eye, pps,
                labels=(jnp.asarray(lab_a), jnp.asarray(lab_v), ones),
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)},
            )
            a, v, c1, c2, c3 = outs
            ce = masked_cross_entropy(jnp.nan_to_num(a), lab_a, ones) + \
                masked_cross_entropy(jnp.nan_to_num(v), lab_v, ones)
            return ce + params["trainer"]["contrastive_weight"][0] * (
                c1 + c2 + c3
            )

        jgrads = jax.grad(loss_fn)(params0)
        jgrads, _ = clip_by_global_norm(jgrads, 1.0)

        # gradient agreement (the strong statement: full-model backward
        # through conv/BN-train/BiLSTM/MHA/InfoNCE matches torch autograd)
        flat_t = jax.tree_util.tree_flatten_with_path(tgrads)[0]
        flat_j = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_flatten_with_path(jgrads)[0]}
        gmax = max(float(np.abs(v).max()) for _, v in flat_t)
        for k, tg in flat_t:
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                flat_j[ks], tg, atol=2e-5 * max(gmax, 1.0), rtol=2e-3,
                err_msg=f"grad mismatch at {ks}",
            )

        tx = optax.adamw(1e-4, weight_decay=0.01)
        updates, _ = tx.update(jgrads, tx.init(params0), params0)
        jparams1 = optax.apply_updates(params0, updates)

        # updated-param agreement. First-step AdamW moves every param by
        # ~±lr·sign(g); where |g| is at float-noise scale the sign can
        # legitimately differ between frameworks, so the tolerance is a
        # fraction of lr on top of exact agreement.
        for (k, tp1), jp1 in zip(
            jax.tree_util.tree_flatten_with_path(tparams1)[0],
            jax.tree.leaves(jparams1),
        ):
            np.testing.assert_allclose(
                np.asarray(jp1), tp1, atol=2.5e-4,
                err_msg=f"param mismatch at {jax.tree_util.keystr(k)}",
            )
