"""Model smoke + behavior tests (shapes, train/eval paths, mutables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.normal(size=(8, 32, 585)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(8, 38)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(8, 230)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 3, 8)),
        jnp.asarray(rng.integers(0, 3, 8)),
    )


class TestEEGNet:
    def test_forward_shape(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import EEGMultiScaleNet

        eeg = tiny_batch[0]
        mod = EEGMultiScaleNet()
        variables = mod.init(jax.random.key(0), eeg)
        out = mod.apply(variables, eeg)
        assert out.shape == (8, 256)
        assert jnp.isfinite(out).all()

    def test_train_mode_updates_batch_stats(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import EEGMultiScaleNet

        eeg = tiny_batch[0]
        mod = EEGMultiScaleNet()
        variables = mod.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            eeg,
            train=True,
        )
        out, mutated = mod.apply(
            variables,
            eeg,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(2)},
        )
        assert "batch_stats" in mutated
        before = variables["batch_stats"]["bn1"]["mean"]
        after = mutated["batch_stats"]["bn1"]["mean"]
        assert float(jnp.abs(before - after).max()) > 0


class TestFlagship:
    def test_eval_returns_two_heads(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )

        eeg, eye, pps, _, _ = tiny_batch
        mod = MultimodalTransformerModel()
        variables = mod.init(jax.random.key(0), eeg, eye, pps)
        out = mod.apply(variables, eeg, eye, pps)
        assert isinstance(out, tuple) and len(out) == 2
        assert out[0].shape == (8, 3) and out[1].shape == (8, 3)

    def test_train_returns_five_outputs(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )

        eeg, eye, pps, a, v = tiny_batch
        mod = MultimodalTransformerModel()
        variables = mod.init(jax.random.key(0), eeg, eye, pps)
        out, _ = mod.apply(
            variables,
            eeg,
            eye,
            pps,
            labels=(a, v),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        assert len(out) == 5
        arousal, valence, c1, c2, c3 = out
        assert arousal.shape == (8, 3) and valence.shape == (8, 3)
        for c in (c1, c2, c3):
            assert c.shape == () and jnp.isfinite(c)

    def test_learnable_scalars_exist(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )

        eeg, eye, pps, _, _ = tiny_batch
        mod = MultimodalTransformerModel(temperature=0.01)
        variables = mod.init(jax.random.key(0), eeg, eye, pps)
        p = variables["params"]
        assert float(p["temperature"]) == pytest.approx(0.01)
        assert np.asarray(p["contrastive_weight"]).shape == (1,)

    def test_eval_deterministic(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )

        eeg, eye, pps, _, _ = tiny_batch
        mod = MultimodalTransformerModel()
        variables = mod.init(jax.random.key(0), eeg, eye, pps)
        a1, v1 = mod.apply(variables, eeg, eye, pps)
        a2, v2 = mod.apply(variables, eeg, eye, pps)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_jit_forward(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )

        eeg, eye, pps, _, _ = tiny_batch
        mod = MultimodalTransformerModel()
        variables = mod.init(jax.random.key(0), eeg, eye, pps)
        fwd = jax.jit(lambda v, e, y, p: mod.apply(v, e, y, p))
        a, v = fwd(variables, eeg, eye, pps)
        assert a.shape == (8, 3)


class TestSimCLRSuite:
    def test_encoder_projector_classifier(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import (
            Classifier,
            MultiModalEncoder,
            ProjectionHead,
        )

        eeg, eye, pps, _, _ = tiny_batch
        enc = MultiModalEncoder()
        venc = enc.init(jax.random.key(0), eeg, eye, pps)
        h = enc.apply(venc, eeg, eye, pps)
        assert h.shape == (8, 256)

        proj = ProjectionHead()
        vproj = proj.init(jax.random.key(1), h)
        z = proj.apply(vproj, h)
        assert z.shape == (8, 128)

        clf = Classifier()
        vclf = clf.init(jax.random.key(2), h)
        a, v = clf.apply(vclf, h)
        assert a.shape == (8, 3) and v.shape == (8, 3)


class TestMEMHACL:
    def test_encoder_classifier(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import (
            MEMHACLClassifier,
            MEMHACLEncoder,
        )

        eeg, eye, pps, _, _ = tiny_batch
        enc = MEMHACLEncoder()
        v = enc.init(jax.random.key(0), eeg, eye, pps)
        h = enc.apply(v, eeg, eye, pps)
        assert h.shape == (8, 256)
        clf = MEMHACLClassifier()
        vc = clf.init(jax.random.key(1), h)
        a, val = clf.apply(vc, h)
        assert a.shape == (8, 2) and val.shape == (8, 2)

    def test_accepts_3d_eye_phy(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import MEMHACLEncoder

        eeg, eye, pps, _, _ = tiny_batch
        enc = MEMHACLEncoder()
        v = enc.init(jax.random.key(0), eeg, eye[:, None, :], pps[:, None, :])
        h = enc.apply(v, eeg, eye[:, None, :], pps[:, None, :])
        assert h.shape == (8, 256)


class TestSubnetworkAndCrossModal:
    def test_subnetwork(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import Subnetwork

        eye = tiny_batch[1]
        mod = Subnetwork(input_dim=38)
        v = mod.init(jax.random.key(0), eye)
        out = mod.apply(v, eye)
        assert out.shape == (8, 256)

    def test_cross_modal_gate_range(self, tiny_batch):
        from multimodal_sentiment_aanalysis_tpu.models import CrossModalTransformer

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
        kv = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
        mod = CrossModalTransformer()
        v = mod.init(jax.random.key(0), q, kv, kv)
        out = mod.apply(v, q, kv, kv)
        assert out.shape == (8, 256)
        # LayerNorm output: per-row mean ~0
        np.testing.assert_allclose(np.asarray(out).mean(axis=1), 0.0, atol=1e-5)
