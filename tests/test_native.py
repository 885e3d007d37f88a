"""Native C++ data-runtime: build, load, and parity vs the numpy path."""

import numpy as np
import pytest

from multimodal_sentiment_aanalysis_tpu import native
from multimodal_sentiment_aanalysis_tpu.data.pairs import build_contrastive_pairs


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable; numpy fallback covers API")


class TestNativeOps:
    def test_nan_to_num(self, rng):
        x = rng.normal(size=(64, 32)).astype(np.float32)
        x[0, 0] = np.nan
        x[1, 1] = np.inf
        x[2, 2] = -np.inf
        ref = np.nan_to_num(x)
        out = native.nan_to_num_(x.copy())
        np.testing.assert_allclose(out, ref)

    def test_zscore_columns(self, rng):
        x = rng.normal(size=(480, 230)).astype(np.float32) * 5 + 3
        x[:, 7] = 2.5  # zero-std column exercises the guard
        ref = x.astype(np.float64)
        mean, std = ref.mean(0), ref.std(0)
        std = np.where(std == 0, 1.0, std)
        ref = (ref - mean) / std
        out = native.zscore_columns_(x.copy())
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_global_norm(self, rng):
        x = rng.normal(size=(24, 20, 38)).astype(np.float32)
        flat = x.astype(np.float64)
        z = (flat - flat.mean()) / flat.std()
        ref = (z - z.min()) / (z.max() - z.min())
        out = native.global_norm_(x.copy())
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestNativePairs:
    def test_structural_parity_with_numpy_engine(self, rng):
        n_subj, per = 6, 20
        subject_ids = np.repeat(np.arange(n_subj), per)
        arousal = rng.integers(0, 3, n_subj * per)
        valence = rng.integers(0, 3, n_subj * per)

        np_pairs, np_labels = build_contrastive_pairs(
            arousal, valence, subject_ids, seed=0
        )
        nat_pairs, nat_labels = native.build_pairs(
            arousal, valence, subject_ids, seed=0
        )

        # same class balance per engine
        assert nat_labels.sum() * 2 == len(nat_labels)
        assert np_labels.sum() * 2 == len(np_labels)
        # same pair count (min(pos, neg) is RNG-independent)
        assert len(nat_pairs) == len(np_pairs)
        # within-subject + label correctness for every native pair
        for (i, j), lab in zip(nat_pairs, nat_labels):
            assert subject_ids[i] == subject_ids[j]
            assert i != j
            same = arousal[i] == arousal[j] and valence[i] == valence[j]
            assert lab == (1.0 if same else 0.0)

    def test_deterministic_given_seed(self, rng):
        subject_ids = np.repeat(np.arange(3), 15)
        arousal = rng.integers(0, 2, 45)
        valence = rng.integers(0, 2, 45)
        p1, l1 = native.build_pairs(arousal, valence, subject_ids, seed=7)
        p2, l2 = native.build_pairs(arousal, valence, subject_ids, seed=7)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(l1, l2)
        p3, _ = native.build_pairs(arousal, valence, subject_ids, seed=8)
        assert not np.array_equal(p1, p3)
