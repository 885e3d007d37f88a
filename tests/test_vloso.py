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


@pytest.mark.slow
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


def _tiny_arrays(rng, n_subj=4, ex=8):
    n = n_subj * ex
    lab = rng.integers(0, 3, n)
    return {
        "eeg": rng.normal(size=(n, 32, 16)).astype(np.float32),
        "eye": rng.normal(size=(n, 38)).astype(np.float32),
        "pps": rng.normal(size=(n, 230)).astype(np.float32),
        "arousal": lab.astype(np.int64),
        "valence": rng.integers(0, 3, n).astype(np.int64),
    }


def _tiny_trainer(arrays, n_subj=4, ex=8, mesh=None):
    return VectorizedLOSOTrainer(
        MultimodalTransformerModel(feat_dim=16, eeg_time=16),
        DeviceDataset(arrays), n_subj, ex, batch_size=8, seed=0, mesh=mesh,
    )


def test_epoch_plans_index_only_train_rows(rng):
    """Fast (no training compile): host epoch plans draw only from each
    model's own LOSO train rows, full batches, all-ones masks."""
    arrays = _tiny_arrays(rng, n_subj=3)
    t = _tiny_trainer(arrays, n_subj=3)
    plans, masks = t._epoch_plans()
    assert plans.shape == (3, 2, 8)  # 16 train rows, batch 8
    assert masks.shape == plans.shape and (masks == 1.0).all()
    for s in range(3):
        assert set(plans[s].ravel()) <= set(t.train_idx[s])
        assert not set(plans[s].ravel()) & set(t.test_idx[s])


def test_epoch_plans_cover_tail_rows(rng):
    """When n_train % batch_size != 0 the host plan wrap-pads the last
    batch and masks the padding — every train row appears exactly once
    among mask==1 slots (same distribution as the fused on-device plan;
    round 2 silently dropped the tail here)."""
    arrays = _tiny_arrays(rng, n_subj=3)
    t = VectorizedLOSOTrainer(
        MultimodalTransformerModel(feat_dim=16, eeg_time=16),
        DeviceDataset(arrays), 3, 8, batch_size=6, seed=0,
    )
    plans, masks = t._epoch_plans()  # 16 train rows, batch 6 -> nb=3
    assert plans.shape == (3, 3, 6) and masks.shape == plans.shape
    assert masks.sum() == 3 * 16  # one real slot per train row per model
    for s in range(3):
        real = plans[s].ravel()[masks[s].ravel() == 1.0]
        assert sorted(real) == sorted(t.train_idx[s])
        assert set(plans[s].ravel()) <= set(t.train_idx[s])  # pads wrap


@pytest.mark.slow
class TestShardedAndFused:
    """Subject-axis DP sharding + the fused multi-epoch program."""

    def test_dp_sharded_matches_single_device(self, rng):
        """Sharding the subject axis over a mesh is pure SPMD scale-out:
        params/metrics after 2 epochs match the unsharded program (up to
        compiler reduction-order noise)."""
        from multimodal_sentiment_aanalysis_tpu.parallel import make_mesh

        arrays = _tiny_arrays(rng)
        t_single = _tiny_trainer(arrays)
        t_dp = _tiny_trainer(arrays, mesh=make_mesh(4))
        for _ in range(2):
            m1 = t_single.train_epoch()
            m2 = t_dp.train_epoch()
        np.testing.assert_allclose(m1["loss"], m2["loss"], atol=1e-5)
        for a, b in zip(
            jax.tree.leaves(t_single.params), jax.tree.leaves(t_dp.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )
        e1, e2 = t_single.evaluate(), t_dp.evaluate()
        np.testing.assert_allclose(e1["a_acc"], e2["a_acc"], atol=1e-6)

    def test_fused_epochs_deterministic(self, rng):
        """The fused E-epoch program is deterministic in the seed and
        returns per-epoch (E, S) metrics."""
        arrays = _tiny_arrays(rng)
        t1 = _tiny_trainer(arrays)
        t2 = _tiny_trainer(arrays)
        m1 = t1.train_epochs_fused(2)
        m2 = t2.train_epochs_fused(2)
        assert m1["loss"].shape == (2, 4)
        assert np.isfinite(m1["loss"]).all()
        np.testing.assert_array_equal(m1["loss"], m2["loss"])
        for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_with_mesh_padding(self, rng):
        """3 subjects on a 4-device mesh pad to 4 models; every result is
        sliced back to the real subject count."""
        from multimodal_sentiment_aanalysis_tpu.parallel import make_mesh

        arrays = _tiny_arrays(rng, n_subj=3)
        t = _tiny_trainer(arrays, n_subj=3, mesh=make_mesh(4))
        assert t.n_total == 4
        m = t.train_epochs_fused(2)
        assert m["loss"].shape == (2, 3)
        assert np.isfinite(m["loss"]).all()
        ev = t.evaluate()
        assert ev["a_acc"].shape == (3,)


@pytest.mark.slow
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


@pytest.mark.slow
class TestVLOSOResume:
    def test_save_restore_roundtrip(self, rng, tmp_path):
        """Full-state resume: a restored trainer continues bit-identically
        (host epoch path) and via the fused program."""
        arrays = _tiny_arrays(rng, n_subj=3)
        a = _tiny_trainer(arrays, n_subj=3)
        a.train_epoch()
        path = a.save_state(str(tmp_path / "vloso.msgpack"))

        b = _tiny_trainer(arrays, n_subj=3)
        b.restore_state(path)
        for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree.leaves(a.opt_state), jax.tree.leaves(b.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

        # identical continuation: host-plan epoch (host RNG restored) ...
        ma = a.train_epoch()
        mb = b.train_epoch()
        np.testing.assert_allclose(ma["loss"], mb["loss"], rtol=1e-6)
        # ... and the fused multi-epoch program (_fused_key restored)
        fa = a.train_epochs_fused(2)
        fb = b.train_epochs_fused(2)
        np.testing.assert_allclose(fa["loss"], fb["loss"], rtol=1e-6)

    def test_subject_variables_slice(self, rng, tmp_path):
        arrays = _tiny_arrays(rng, n_subj=3)
        t = _tiny_trainer(arrays, n_subj=3)
        v = t.subject_variables(1)
        ref = jax.tree.leaves(t.params["model"])[0]
        got = jax.tree.leaves(v["params"])[0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref)[1])
        # sliced variables drive a plain model.apply (Tester/serving payload)
        out = t.model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            arrays["eeg"][:2], arrays["eye"][:2], arrays["pps"][:2],
        )
        assert np.isfinite(np.asarray(out[0])).all()


def test_fused_lstm_vmem_gate():
    """The VMEM estimator reproduces the measured TPU envelope
    (2026-08-19: 24-model fp32 B=256 needed 146.43M of the 128M budget
    at one batch block), and the v8 batch-blocked backward keeps every
    production config fused: B<=128 fp32 at one block (unchanged
    schedule), B=256 fp32 as two Bb=128 blocks."""
    from multimodal_sentiment_aanalysis_tpu.kernels.lstm import (
        _bwdc_vmem_est,
        fused_bwd_vmem_fits,
        pick_block_b,
    )

    # the pre-v8 single-block estimate matches the measured 146.43M dump
    assert abs(_bwdc_vmem_est(24, 256, 256, 128, 4) - 146_430_000) < 2e6
    # block choices: unchanged schedule up to B=128 fp32, blocked above
    assert pick_block_b(24, 64, 256, 128, 4) == 64
    assert pick_block_b(24, 128, 256, 128, 4) == 128
    assert pick_block_b(24, 256, 256, 128, 4) == 128  # NB=2
    assert pick_block_b(24, 256, 256, 128, 2) == 256  # bf16 single block
    # all flagship configs now stay on the fused path
    assert fused_bwd_vmem_fits(24, 64, 128, 4)
    assert fused_bwd_vmem_fits(24, 128, 128, 4)
    assert fused_bwd_vmem_fits(24, 256, 128, 4)  # was the VMEM cliff
    assert fused_bwd_vmem_fits(24, 256, 128, 2)

    rng = np.random.default_rng(1)
    arrays = _tiny_arrays(rng)
    ds = DeviceDataset(arrays)
    model = MultimodalTransformerModel(feat_dim=32, eeg_time=16)
    small = VectorizedLOSOTrainer(model, ds, 4, 8, batch_size=8, seed=0)
    assert small._fused_lstm_ok  # tiny config fits
    # an absurd odd batch cannot be halved into blocks -> routes to XLA
    big = VectorizedLOSOTrainer(model, ds, 4, 8, batch_size=999_999,
                                seed=0)
    assert not big._fused_lstm_ok
    # the gated trainer still builds and runs a step program
    m = small.train_epoch()
    assert np.isfinite(m["loss"]).all()


# ---------------------------------------------------------------------------
# early stopping + plateau LR (reference Trainer.py:28,107-117 — the
# vectorized form runs the whole control loop inside the fused program)
# ---------------------------------------------------------------------------


def test_vector_schedule_matches_host_classes(rng):
    """Fast, pure: the branchless (S,)-lane transition reproduces the host
    ReduceLROnPlateau + EarlyStopping dataclasses decision-for-decision in
    the exact calling pattern of engine.Trainer.run (scheduler finite-
    gated, early stop ungated, loop break on stop) — over random loss
    sequences including improving trends and a NaN epoch."""
    import jax.numpy as jnp

    from multimodal_sentiment_aanalysis_tpu.utils.schedule import (
        EarlyStopping,
        ReduceLROnPlateau,
        vector_schedule_init,
        vector_schedule_step,
    )

    n_lanes, n_epochs, lr0 = 16, 40, 1e-3
    losses = rng.normal(1.0, 0.3, size=(n_epochs, n_lanes)).astype(
        np.float32
    )
    losses[:, :4] -= np.linspace(0, 1, n_epochs)[:, None]  # keep improving
    losses[5, 6] = np.nan  # scheduler must skip, early stop must count

    state = vector_schedule_init(n_lanes, lr0)
    lr_hist, stop_hist, best_hist = [], [], []
    for e in range(n_epochs):
        state, improved = vector_schedule_step(
            state, jnp.asarray(losses[e]), e + 1
        )
        lr_hist.append(np.asarray(state["lr"]))
        stop_hist.append(np.asarray(state["stopped"]))
        best_hist.append(np.asarray(improved))
    stop_epoch = np.asarray(state["stop_epoch"])

    for lane in range(n_lanes):
        sch = ReduceLROnPlateau(lr=lr0, patience=3, factor=0.5)
        early = EarlyStopping(patience=5)
        host_stop = 0
        for e in range(n_epochs):
            te = float(losses[e, lane])
            if np.isfinite(te):
                sch.step(te)
            saved = early.step(te)
            assert lr_hist[e][lane] == np.float32(sch.lr), (lane, e)
            assert best_hist[e][lane] == saved, (lane, e)
            if early.should_stop:
                host_stop = e + 1
                break
        assert stop_epoch[lane] == host_stop, lane
        if host_stop:  # lanes freeze exactly at the host's break point
            assert stop_hist[host_stop - 1][lane]
            for e in range(host_stop, n_epochs):
                assert lr_hist[e][lane] == lr_hist[host_stop - 1][lane]


@pytest.mark.slow
class TestVLOSOEarlyStop:
    def _es_trainer(self, rng, **kw):
        arrays = _tiny_arrays(rng)
        return VectorizedLOSOTrainer(
            MultimodalTransformerModel(feat_dim=16, eeg_time=16),
            DeviceDataset(arrays), 4, 8, batch_size=8, seed=0,
            early_stop=True, es_patience=2, **kw,
        )

    def test_fused_program_matches_host_replay(self, rng):
        """The fused program's in-scan schedule decisions, replayed on the
        host dataclasses over the program's own recorded te_loss history,
        agree on every subject's stop epoch and LR trajectory — i.e. the
        vectorized trainer stops exactly where the sequential engine would
        on the same losses."""
        from multimodal_sentiment_aanalysis_tpu.utils.schedule import (
            EarlyStopping,
            ReduceLROnPlateau,
        )

        t = self._es_trainer(rng)
        E = 10
        tm = t.train_epochs_fused(E)
        te, lrs = tm["te_loss"], tm["lr"]
        stop_epoch = np.asarray(jax.device_get(t.sched["stop_epoch"]))

        for s in range(t.n_subjects):
            sch = ReduceLROnPlateau(lr=1e-4, patience=3, factor=0.5)
            early = EarlyStopping(patience=2)
            host_stop = 0
            for e in range(E):
                v = float(te[e, s])
                if np.isfinite(v):
                    sch.step(v)
                early.step(v)
                assert np.float32(sch.lr) == lrs[e, s], (s, e)
                if early.should_stop:
                    host_stop = e + 1
                    break
            assert stop_epoch[s] == host_stop, s

        # stopped subjects are frozen: eval-mode te_loss is deterministic,
        # so every epoch after the stop must repeat it bit-for-bit
        for s in range(t.n_subjects):
            if stop_epoch[s] and stop_epoch[s] < E:
                frozen = te[stop_epoch[s] - 1, s]
                np.testing.assert_array_equal(
                    te[stop_epoch[s]:, s], frozen
                )

        # best-checkpoint lanes: the captured best equals the min te_loss
        es_best = np.asarray(jax.device_get(t.sched["es_best"]))
        for s in range(t.n_subjects):
            hist = te[: stop_epoch[s] or E, s]
            assert np.float32(es_best[s]) == np.nanmin(hist), s

    def test_params_freeze_after_all_stopped(self, rng):
        t = self._es_trainer(rng)
        t.run(20, verbose=False, fused=True, chunk=5)
        stopped = np.asarray(jax.device_get(t.sched["stopped"]))
        if not stopped.all():  # force the remainder to stop
            while not np.asarray(
                    jax.device_get(t.sched["stopped"])).all():
                t.train_epochs_fused(5)
        before = jax.tree.map(lambda x: np.asarray(x).copy(), t.params)
        t.train_epochs_fused(2)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(t.params)):
            np.testing.assert_array_equal(a, np.asarray(b))

    def test_run_reports_and_best_eval(self, rng):
        t = self._es_trainer(rng)
        res = t.run(8, verbose=False, fused=True, chunk=4)
        assert res["stop_epochs"].shape == (4,)
        assert "mean_arousal_acc" in res and "final_arousal_acc" in res
        rep = t.stop_report()
        assert "Early stopping:" in rep and "subject 3" in rep
        ev = t.evaluate(best=True)
        assert np.isfinite(ev["a_acc"]).all()

    def test_host_path_and_resume(self, rng, tmp_path):
        """The non-fused path advances the same schedule state eagerly, and
        a save/restore round-trip carries schedule + best buffers so a
        resumed run continues identically."""
        arrays = _tiny_arrays(rng)
        mk = lambda: VectorizedLOSOTrainer(
            MultimodalTransformerModel(feat_dim=16, eeg_time=16),
            DeviceDataset(arrays), 4, 8, batch_size=8, seed=0,
            early_stop=True, es_patience=2,
        )
        t1 = mk()
        t1._host_es_epoch(1)
        t1._host_es_epoch(2)
        path = t1.save_state(str(tmp_path / "es_state"))
        t2 = mk()
        t2.restore_state(path)
        for a, b in zip(
            jax.tree.leaves(t1.sched), jax.tree.leaves(t2.sched)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        m1 = t1._host_es_epoch(3)
        m2 = t2._host_es_epoch(3)
        np.testing.assert_allclose(m1["te_loss"], m2["te_loss"], atol=1e-6)
