"""Vectorized LOSO trainer: all subject models trained in one program."""

import jax
import numpy as np
import pytest

from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
from multimodal_sentiment_aanalysis_tpu.models import MultimodalTransformerModel
from multimodal_sentiment_aanalysis_tpu.train import VectorizedLOSOTrainer


@pytest.fixture(scope="module")
def trainer():
    rng = np.random.default_rng(0)
    n_subj, ex, signal = 3, 12, 3.0
    n = n_subj * ex
    lab = rng.integers(0, 3, n)
    arrays = {
        "eeg": (rng.normal(size=(n, 32, 32)) + signal * lab[:, None, None]).astype(
            np.float32
        ),
        "eye": (rng.normal(size=(n, 38)) + signal * lab[:, None]).astype(np.float32),
        "pps": rng.normal(size=(n, 230)).astype(np.float32),
        "arousal": lab.astype(np.int64),
        "valence": rng.integers(0, 3, n).astype(np.int64),
    }
    return VectorizedLOSOTrainer(
        MultimodalTransformerModel(feat_dim=32, eeg_time=32),
        DeviceDataset(arrays), n_subj, ex, batch_size=8, seed=0,
    )


class TestVectorizedLOSO:
    def test_trains_all_models_independently(self, trainer):
        before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
        metrics = trainer.train_epoch()
        assert metrics["loss"].shape == (3,)
        assert np.isfinite(metrics["loss"]).all()
        # every model's params moved, and per-model deltas are independent
        for leaf_b, leaf_a in zip(
            jax.tree.leaves(before), jax.tree.leaves(trainer.params)
        ):
            a = np.asarray(leaf_a)
            if a.ndim < 2:
                continue
            per_model_delta = np.abs(a - leaf_b).reshape(3, -1).max(axis=1)
            assert (per_model_delta > 0).all()

    def test_learns_planted_signal_and_eval_shapes(self, trainer):
        res = trainer.run(30, verbose=False)
        assert res["per_subject_arousal"].shape == (3,)
        assert res["mean_arousal_acc"] > 0.5


def test_bf16_compute_dtype(rng):
    n = 2 * 10
    lab = rng.integers(0, 3, n)
    arrays = {
        "eeg": rng.normal(size=(n, 32, 16)).astype(np.float32),
        "eye": rng.normal(size=(n, 38)).astype(np.float32),
        "pps": rng.normal(size=(n, 230)).astype(np.float32),
        "arousal": lab.astype(np.int64),
        "valence": rng.integers(0, 3, n).astype(np.int64),
    }
    tr = VectorizedLOSOTrainer(
        MultimodalTransformerModel(feat_dim=16, eeg_time=16),
        DeviceDataset(arrays), 2, 10, batch_size=4, seed=0,
        compute_dtype="bfloat16",
    )
    m = tr.train_epoch()
    assert np.isfinite(m["loss"]).all()
    # master params stay float32
    assert all(
        np.asarray(x).dtype == np.float32
        for x in jax.tree.leaves(tr.params["model"])
    )
