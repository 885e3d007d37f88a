"""Vectorized SimCLR LOSO trainer (train/vsimclr.py).

The vectorized form must (a) run all subjects' pretrain+finetune in one
vmapped program per epoch and (b) keep subjects fully independent — the
vmapped epoch applied to the full (S, ...) state must equal the same epoch
applied per-subject to sliced state (any cross-subject coupling, e.g.
batch-stat mixing, breaks this).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def trio():
    from multimodal_sentiment_aanalysis_tpu.models import (
        Classifier, MultiModalEncoder, ProjectionHead,
    )

    return (MultiModalEncoder(feat_dim=32, eeg_time=64),
            ProjectionHead(in_dim=32), Classifier(in_dim=32))


@pytest.fixture(scope="module")
def tiny_ds():
    from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset

    r = np.random.default_rng(0)
    n_subj, ex = 4, 8
    n = n_subj * ex
    arrays = {
        "eeg": r.normal(size=(n, 32, 64)).astype(np.float32),
        "eye": r.normal(size=(n, 38)).astype(np.float32),
        "pps": r.normal(size=(n, 230)).astype(np.float32),
        "arousal": r.integers(0, 3, n).astype(np.int64),
        "valence": r.integers(0, 3, n).astype(np.int64),
    }
    return DeviceDataset(arrays), n_subj, ex


def _make(trio, tiny_ds, **kw):
    from multimodal_sentiment_aanalysis_tpu.train import (
        VectorizedSimCLRTrainer,
    )

    ds, n_subj, ex = tiny_ds
    enc, proj, clf = trio
    return VectorizedSimCLRTrainer(
        enc, proj, clf, ds, n_subj, ex, batch_size=8, verbose=False, **kw)


class TestVectorizedSimCLR:
    @pytest.mark.slow
    def test_run_end_to_end(self, trio, tiny_ds):
        tr = _make(trio, tiny_ds)
        out = tr.run(pretrain_epochs=2, finetune_epochs=2)
        assert out["per_subject"]["a_acc"].shape == (4,)
        assert np.isfinite(out["mean_arousal_acc"])
        assert np.isfinite(out["mean_valence_acc"])
        for leaf in jax.tree.leaves(tr.params):
            assert bool(jnp.isfinite(leaf).all())

    def test_per_subject_fresh_inits(self, trio, tiny_ds):
        tr = _make(trio, tiny_ds)
        # independent per-subject inits (reference main-loop semantics);
        # skip deterministic leaves (zero biases, unit BN scales)
        differs = [
            not np.allclose(np.asarray(w[0]), np.asarray(w[1]))
            for w in jax.tree.leaves(tr.params["enc"])
            if np.asarray(w[0]).std() > 0
        ]
        assert differs and all(differs)

    def test_pair_sets_match_sequential_builder(self, trio, tiny_ds):
        from multimodal_sentiment_aanalysis_tpu.data import (
            build_contrastive_pairs, loso_split,
        )
        from multimodal_sentiment_aanalysis_tpu.data.splits import (
            subject_ids_array,
        )

        ds, n_subj, ex = tiny_ds
        tr = _make(trio, tiny_ds, seed=42)
        arrays = {k: np.asarray(v) for k, v in ds.arrays.items()}
        sids = subject_ids_array(n_subj, ex)
        for s in (0, 2):
            tr_idx, _ = loso_split(n_subj, ex, s)
            pidx, plab = build_contrastive_pairs(
                arrays["arousal"][tr_idx], arrays["valence"][tr_idx],
                sids[tr_idx], seed=42 + s,
            )
            n = len(plab)
            assert int(tr.n_pairs[s]) == n
            np.testing.assert_array_equal(
                tr.pair_idx[s, :n], tr_idx[pidx])
            np.testing.assert_array_equal(tr.pair_lab[s, :n], plab)

    @pytest.mark.slow
    def test_no_cross_subject_coupling(self, trio, tiny_ds):
        """Perturbing one subject's epoch plan must leave every other
        subject's result bit-identical (same program, same vmap width —
        any cross-subject coupling, e.g. batch-stat mixing, breaks this).

        Not tested as full-vmap == sliced-vmap: vmap width changes float
        reduction order, and Adam's sqrt(v) normalization amplifies that
        ulp-level noise into update-sized (~lr) drift within one epoch.
        """
        tr = _make(trio, tiny_ds)
        rows, labs = tr._pretrain_plans()
        full = tr._pre_epoch(tr.params, tr.batch_stats, tr.pre_opt,
                             tr.dropout_keys, (rows, labs))
        alt = tr._pre_epoch(
            tr.params, tr.batch_stats, tr.pre_opt, tr.dropout_keys,
            (rows.at[-1].set(jnp.roll(rows[-1], 1, axis=0)),
             labs.at[-1].set(1.0 - labs[-1])))
        p_full, p_alt = full[0], alt[0]
        for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_alt)):
            np.testing.assert_array_equal(
                np.asarray(a)[:-1], np.asarray(b)[:-1])
        # and the perturbation itself was not a no-op
        last_diff = any(
            not np.array_equal(np.asarray(a)[-1], np.asarray(b)[-1])
            for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_alt))
        )
        assert last_diff
