"""Data layer tests: feature assembly, splits, pairs, pipeline."""

import numpy as np
import pytest

from multimodal_sentiment_aanalysis_tpu.data import (
    DataFeatures,
    assemble_features,
    binary_label_filter,
    build_contrastive_pairs,
    epoch_batch_indices,
    kfold_split,
    loso_split,
    per_subject_count_split,
    subject_holdout_split,
    zscore_normalize,
    DeviceDataset,
)
from multimodal_sentiment_aanalysis_tpu.data.splits import (
    loso_block_split,
    subject_ids_array,
)


class TestFeatures:
    def test_shapes(self, assembled):
        feats, label = assembled
        assert feats["eeg"].shape == (480, 32, 585)
        assert feats["eye"].shape == (480, 38)
        assert feats["pps"].shape == (480, 230)
        assert label.shape == (480,)

    def test_no_nans(self, assembled):
        feats, _ = assembled
        for m in ("eeg", "eye", "pps"):
            assert np.isfinite(feats[m]).all(), m

    def test_zscore(self, assembled):
        feats, _ = assembled
        # dataset-level Z-score: per-feature mean ~0, std ~1
        for m in ("eeg", "eye", "pps"):
            np.testing.assert_allclose(feats[m].mean(axis=0), 0.0, atol=1e-4)
            np.testing.assert_allclose(feats[m].std(axis=0), 1.0, atol=1e-3)

    def test_zscore_std_guard(self):
        x = np.zeros((10, 3), np.float32)
        x[:, 1] = np.arange(10)
        out = zscore_normalize(x)
        assert np.isfinite(out).all()  # std==0 column guarded to 1
        np.testing.assert_allclose(out[:, 0], 0.0)

    def test_label_selection(self, hci_data):
        _, arousal = assemble_features(hci_data, ["eye"], label_type="arousal")
        _, valence = assemble_features(hci_data, ["eye"], label_type="valence")
        np.testing.assert_array_equal(arousal, hci_data["arousal_label"])
        np.testing.assert_array_equal(valence, hci_data["valence_label"])

    def test_class_facade(self, hci_pickle):
        df = DataFeatures(
            hci_pickle,
            modalities=["eeg", "eye", "pps"],
            Norm="Z_score",
            label_type="arousal",
        )
        assert df.features["eeg"].shape == (480, 32, 585)
        assert df.label.shape == (480,)

    def test_raw_path_not_supported(self, hci_data):
        stripped = {k: v for k, v in hci_data.items() if k != "features"}
        with pytest.raises(NotImplementedError):
            assemble_features(stripped, ["eeg"])


class TestSplits:
    def test_loso(self):
        train, test = loso_split(24, 20, 5)
        assert len(train) == 460 and len(test) == 20
        assert set(test) == set(range(100, 120))
        assert len(np.intersect1d(train, test)) == 0

    def test_subject_holdout(self):
        train, val, test = subject_holdout_split(24, 20)
        # subject-level: sample counts are multiples of ex_nums
        assert len(train) % 20 == 0 and len(val) % 20 == 0 and len(test) % 20 == 0
        assert len(train) + len(val) + len(test) == 480
        subj = subject_ids_array(24, 20)
        assert set(subj[train]) & set(subj[test]) == set()
        # deterministic under the fixed seed
        train2, _, _ = subject_holdout_split(24, 20)
        np.testing.assert_array_equal(train, train2)

    def test_per_subject_count(self):
        train, val, test = per_subject_count_split(24, 20)
        assert len(train) == 24 * 16 and len(val) == 24 and len(test) == 24 * 3
        subj = subject_ids_array(24, 20)
        for s in range(24):
            assert (subj[train] == s).sum() == 16
            assert (subj[test] == s).sum() == 3

    def test_kfold(self):
        folds = [kfold_split(480, 10, i) for i in range(10)]
        all_test = np.concatenate([t for _, t in folds])
        assert sorted(all_test) == list(range(480))  # partition
        tr, te = folds[0]
        assert len(np.intersect1d(tr, te)) == 0
        # deterministic (seed 42)
        tr2, te2 = kfold_split(480, 10, 0)
        np.testing.assert_array_equal(te, te2)

    def test_binary_filter(self):
        labels = np.array([0, 1, 2, 2, 0, 1])
        idx, mapped = binary_label_filter(labels)
        np.testing.assert_array_equal(idx, [0, 2, 3, 4])
        np.testing.assert_array_equal(mapped, [0, 1, 1, 1, 0, 1])

    def test_loso_block_with_filter(self):
        labels = np.tile(np.array([0, 1, 2, 2] * 5), 24)  # 480
        idx, _ = binary_label_filter(labels)
        train, test = loso_block_split(480, 20, 3, indices=idx)
        assert np.all((test >= 60) & (test < 80))
        assert np.all(np.isin(train, idx)) and np.all(np.isin(test, idx))
        assert len(np.intersect1d(train, test)) == 0


class TestPairs:
    def test_balance_and_labels(self, rng):
        n_subj, ex = 6, 20
        subj = subject_ids_array(n_subj, ex)
        arousal = rng.integers(0, 3, n_subj * ex)
        valence = rng.integers(0, 3, n_subj * ex)
        pairs, labels = build_contrastive_pairs(arousal, valence, subj, seed=1)
        assert pairs.shape[1] == 2
        assert set(np.unique(labels)) <= {0.0, 1.0}
        # balanced overall (each subject contributes equal pos/neg)
        assert labels.sum() == len(labels) / 2
        # label correctness
        agree = (arousal[pairs[:, 0]] == arousal[pairs[:, 1]]) & (
            valence[pairs[:, 0]] == valence[pairs[:, 1]]
        )
        np.testing.assert_array_equal(agree.astype(np.float32), labels)
        # pairs stay within subject
        assert np.all(subj[pairs[:, 0]] == subj[pairs[:, 1]])

    def test_skips_degenerate_subject(self):
        # one subject whose labels are all identical -> no negatives -> skipped
        subj = subject_ids_array(2, 4)
        arousal = np.array([0, 0, 0, 0, 0, 1, 0, 1])
        valence = np.array([0, 0, 0, 0, 0, 0, 0, 0])
        pairs, labels = build_contrastive_pairs(arousal, valence, subj, seed=0)
        assert np.all(subj[pairs[:, 0]] == 1)

    def test_deterministic(self, rng):
        subj = subject_ids_array(4, 20)
        a = rng.integers(0, 3, 80)
        v = rng.integers(0, 3, 80)
        p1, l1 = build_contrastive_pairs(a, v, subj, seed=7)
        p2, l2 = build_contrastive_pairs(a, v, subj, seed=7)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(l1, l2)


class TestPipeline:
    def test_epoch_indices_cover_all(self, rng):
        idx, mask = epoch_batch_indices(480, 64, rng)
        assert idx.shape == (8, 64) and mask.shape == (8, 64)
        covered = idx.reshape(-1)[mask.reshape(-1) > 0]
        assert sorted(covered) == list(range(480))
        assert mask.sum() == 480

    def test_device_dataset_gather(self, assembled):
        import jax.numpy as jnp

        feats, label = assembled
        ds = DeviceDataset({**feats, "label": label})
        batch, mask = next(iter(ds.batches(64, shuffle=False)))
        assert batch["eeg"].shape == (64, 32, 585)
        np.testing.assert_allclose(
            np.asarray(batch["eeg"]), feats["eeg"][:64], rtol=1e-6
        )
        sub = ds.subset(np.arange(20))
        assert len(sub) == 20
        assert sub.arrays["eye"].shape == (20, 38)

    def test_epoch_plan_on_device(self):
        import jax

        from multimodal_sentiment_aanalysis_tpu.data.pipeline import (
            epoch_plan_on_device,
        )

        idx, mask = epoch_plan_on_device(jax.random.key(0), 480, 64)
        assert idx.shape == (8, 64)
        covered = np.asarray(idx).reshape(-1)[np.asarray(mask).reshape(-1) > 0]
        assert sorted(covered.tolist()) == list(range(480))


class TestAugment:
    def test_gaussian_views_shapes(self):
        import jax
        import jax.numpy as jnp

        from multimodal_sentiment_aanalysis_tpu.data.augment import two_views

        eeg = jnp.zeros((8, 32, 585))
        eye = jnp.zeros((8, 38))
        pps = jnp.zeros((8, 230))
        (e1, y1, p1), (e2, y2, p2) = two_views(jax.random.key(0), eeg, eye, pps)
        assert e1.shape == eeg.shape
        # the two views differ and noise scale is as configured
        assert float(jnp.abs(e1 - e2).max()) > 0
        assert float(jnp.std(e1)) == pytest.approx(0.01, rel=0.2)
        assert float(jnp.std(y1)) == pytest.approx(0.05, rel=0.2)

    def test_sliding_window(self):
        from multimodal_sentiment_aanalysis_tpu.data.augment import sliding_window

        trial = np.arange(100 * 3).reshape(100, 3).astype(np.float32)
        win, lab = sliding_window(trial, 2, win_len=20, overlap=0.0)
        assert win.shape == (5, 20, 3)
        np.testing.assert_array_equal(lab, [2] * 5)
        win2, _ = sliding_window(trial, 1, win_len=20, overlap=0.5)
        assert win2.shape[1:] == (20, 3)
        np.testing.assert_array_equal(win2[1], trial[10:30])


class TestDatasetFacade:
    def test_load_data_loso(self, hci_data):
        from multimodal_sentiment_aanalysis_tpu.config import Config
        from multimodal_sentiment_aanalysis_tpu.data import load_data

        cfg = Config()
        cfg.training.dependent = False
        train, test = load_data(cfg, test_person=2, data=hci_data)
        assert len(test) == 20 and len(train) == 460
        assert set(train.arrays) == {"eeg", "eye", "pps", "arousal", "valence"}

    def test_load_data_kfold_dependent(self, hci_data):
        from multimodal_sentiment_aanalysis_tpu.config import Config
        from multimodal_sentiment_aanalysis_tpu.data import load_data

        cfg = Config()
        cfg.training.dependent = True
        train, test = load_data(cfg, test_person=0, data=hci_data)
        assert len(train) + len(test) == 480
        assert len(test) == 48  # 480 / n_folds(10)

    def test_feature_dataset_binary_filter(self, assembled, hci_data):
        import numpy as np

        from multimodal_sentiment_aanalysis_tpu.data import FeatureDataset

        feats, label = assembled
        ds = FeatureDataset(
            feats, label, mode="train", test_person=0, cls_num=2,
            dependent=False,
        )
        assert set(np.unique(ds.labels)) <= {0, 1}
        sample, lab = ds[0]
        assert set(sample) == set(feats)


class TestAuFeatures:
    def test_group_normalize(self, rng):
        from multimodal_sentiment_aanalysis_tpu.data.features import (
            au_group_normalize,
        )

        x = rng.normal(size=(40, 17 * 7)) * 3 + 1
        out = au_group_normalize(x)
        for au in range(17):
            blk = out[:, au * 7 : (au + 1) * 7]
            assert abs(blk.min()) < 1e-12 and abs(blk.max() - 1) < 1e-12

    def test_npy_loading(self, tmp_path, rng):
        import numpy as np

        from multimodal_sentiment_aanalysis_tpu.data.features import AuFeatures

        au_dir = tmp_path / "au_feature"
        au_dir.mkdir()
        for s in (1, 2):
            np.save(au_dir / f"{s}.npy", rng.normal(size=(20, 119)))
        au = AuFeatures(None, [1, 2], str(tmp_path / "hci_data.pkl"))
        feats = au.get_features()
        assert feats.shape == (40, 119)
        assert np.isfinite(feats).all()
