"""ME-MHACL stack: data ingest, pretrain, joint finetune (SURVEY.md §2
#31-#33)."""

import numpy as np
import pytest

from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
from multimodal_sentiment_aanalysis_tpu.data.memhacl import (
    load_emotion_npy,
    make_synthetic_emotion_arrays,
    random_split_indices,
)
from multimodal_sentiment_aanalysis_tpu.models import (
    MEMHACLClassifier,
    MEMHACLEncoder,
    ProjectionHead,
)
from multimodal_sentiment_aanalysis_tpu.train import (
    memhacl_finetune,
    memhacl_pretrain,
)


class TestMEMHACLData:
    def test_npy_roundtrip(self, tmp_path, rng):
        n = 12
        paths = {}
        for name, shape in (
            ("eeg", (n, 32, 585)), ("eye", (n, 38)), ("phy", (n, 230)),
        ):
            arr = rng.normal(size=shape).astype(np.float32)
            p = tmp_path / f"{name}.npy"
            np.save(p, arr)
            paths[name] = str(p)
        labels = rng.integers(0, 2, (n, 2)).astype(np.int64)
        lp = tmp_path / "labels.npy"
        np.save(lp, labels)
        arrays = load_emotion_npy(paths["eeg"], paths["eye"], paths["phy"], str(lp))
        assert arrays["eeg"].shape == (n, 32, 585)
        np.testing.assert_array_equal(arrays["arousal"], labels[:, 0])
        np.testing.assert_array_equal(arrays["valence"], labels[:, 1])

    def test_random_split(self):
        tr, va = random_split_indices(100, 0.8, seed=3)
        assert len(tr) == 80 and len(va) == 20
        assert set(tr) | set(va) == set(range(100))
        tr2, _ = random_split_indices(100, 0.8, seed=3)
        np.testing.assert_array_equal(tr, tr2)


class TestMEMHACLEngines:
    @pytest.fixture(scope="class")
    def small_arrays(self):
        arrays = make_synthetic_emotion_arrays(n=24, seed=1, planted_signal=2.0)
        # shrink EEG time so CPU compiles stay fast
        arrays["eeg"] = arrays["eeg"][:, :, :64]
        return arrays

    def test_pretrain_then_finetune(self, small_arrays):
        full = DeviceDataset(small_arrays)
        tr, va = random_split_indices(len(full), 0.8, seed=0)
        encoder = MEMHACLEncoder(feat_dim=32, num_heads=4)
        enc_vars, proj_vars, losses = memhacl_pretrain(
            encoder, ProjectionHead(hidden_dim=32, out_dim=16), full,
            num_epochs=2, batch_size=8, seed=0, verbose=False,
        )
        assert len(losses) == 2 and all(np.isfinite(losses))
        enc_vars2, clf_vars, metrics = memhacl_finetune(
            encoder, enc_vars, MEMHACLClassifier(in_dim=32, hidden_dim=16),
            full.subset(tr), full.subset(va),
            num_epochs=2, batch_size=8, seed=0, verbose=False,
        )
        assert 0.0 <= metrics["a_acc"] <= 1.0
        assert 0.0 <= metrics["v_acc"] <= 1.0
        # joint finetune must move the encoder (reference train.py:44)
        import jax

        moved = max(
            float(abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(
                jax.tree.leaves(enc_vars2["params"]),
                jax.tree.leaves(enc_vars["params"]),
            )
        )
        assert moved > 0
