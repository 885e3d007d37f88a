"""Vectorized phased-curriculum LOSO: equivalence vs the sequential loop.

The vectorized trainer must reproduce, per subject, what an independent
sequential :class:`MultiTaskTrainer` run with the same seed produces
(reference flagship loop ``main.py:62-68``), up to float accumulation
order under vmap/XLA fusion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


N_SUBJECTS = 3
EX = 16
SEED = 123


@pytest.fixture(scope="module")
def tiny_model():
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )

    return MultimodalTransformerModel(feat_dim=32, eeg_time=64)


@pytest.fixture(scope="module")
def subject_data():
    """Synthetic arrays with LOSO subject structure (3 subjects x 16)."""
    rng = np.random.default_rng(7)
    n = N_SUBJECTS * EX
    labels_a = rng.integers(0, 3, n)
    sig = rng.normal(size=(3, 32, 64)).astype(np.float32)
    return {
        "eeg": (rng.normal(size=(n, 32, 64)) * 0.3 + sig[labels_a]).astype(
            np.float32
        ),
        "eye": rng.normal(size=(n, 38)).astype(np.float32),
        "pps": rng.normal(size=(n, 230)).astype(np.float32),
        "arousal": labels_a.astype(np.int64),
        "valence": rng.integers(0, 3, n).astype(np.int64),
    }


@pytest.fixture(scope="module")
def full_ds(subject_data):
    from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset

    return DeviceDataset(subject_data)


class TestVectorizedPhased:
    def test_single_phase_smoke(self, tiny_model, full_ds):
        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )

        vt = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, batch_size=16,
            seed=SEED, verbose=False,
        )
        out = vt.run_phase("eeg", 1)
        assert out["loss"].shape == (N_SUBJECTS,)
        assert np.isfinite(out["loss"]).all()
        assert len(vt.metrics["train"]["loss"]) == 1
        # 0-epoch phases are no-ops, like the sequential loop
        assert vt.run_phase("eye", 0) == {}

    def test_subjects_get_independent_inits(self, tiny_model, full_ds):
        """Reference parity: each subject trains from a fresh init
        (main.py:66 — the torch global RNG advances between subjects)."""
        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )

        vt = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, batch_size=16,
            seed=SEED, verbose=False,
        )
        # some leaves (biases) are zero-init for every seed; at least one
        # weight leaf must differ between subject inits
        diff = max(
            float(np.max(np.abs(np.asarray(l[0]) - np.asarray(l[1]))))
            for l in jax.tree.leaves(vt.params)
        )
        assert diff > 1e-3, diff

    @pytest.mark.slow
    def test_bf16_compute_runs_and_learns(self, tiny_model, full_ds):
        """bfloat16 compute (fp32 master params): finite metrics, fp32
        state preserved, loss moves."""
        import jax.numpy as jnp

        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )

        vt = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, batch_size=16,
            seed=SEED, compute_dtype="bfloat16", verbose=False,
        )
        out = vt.run_phase("fusion_arousal", 2)
        assert np.isfinite(out["loss"]).all()
        # master params and BN stats stay float32
        assert all(
            l.dtype == jnp.float32
            for l in jax.tree.leaves(vt.params)
            if jnp.issubdtype(l.dtype, jnp.floating)
        )
        assert all(
            l.dtype == jnp.float32
            for l in jax.tree.leaves(vt.batch_stats)
        )
        losses = np.stack(vt.metrics["train"]["loss"])  # (E, S)
        assert losses[1].mean() < losses[0].mean() + 0.5

    @pytest.mark.slow
    def test_matches_sequential_loop(self, tiny_model, full_ds, subject_data):
        """Every subject's curriculum == an independent sequential
        MultiTaskTrainer run with the same per-subject seed."""
        from multimodal_sentiment_aanalysis_tpu.data import (
            DeviceDataset,
            loso_split,
        )
        from multimodal_sentiment_aanalysis_tpu.train import (
            MultiTaskTrainer,
            VectorizedPhasedTrainer,
        )

        epochs = (1, 1, 1, 2, 2)
        vt = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, batch_size=16,
            seed=SEED, verbose=False,
        )
        vres = vt.run(*epochs)

        mt = None
        for sid in range(N_SUBJECTS):
            tr_idx, te_idx = loso_split(N_SUBJECTS, EX, sid)
            train_ds = full_ds.subset(tr_idx)
            test_ds = full_ds.subset(te_idx)
            if mt is None:
                mt = MultiTaskTrainer(
                    tiny_model, train_ds, test_ds, test_person=sid,
                    batch_size=16, seed=SEED + sid, fused_phases=True,
                    verbose=False,
                )
            else:
                mt.reset(train_ds, test_ds, test_person=sid,
                         seed=SEED + sid)
            seq_final = mt.run(*epochs, save=False, plot=False)

            vp = jax.tree.map(lambda x: np.asarray(x[sid]), vt.params)
            deltas = jax.tree.map(
                lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
                vp, mt.params,
            )
            worst = max(jax.tree.leaves(deltas))
            # vmap + XLA fusion reorder float accumulation; after 7 total
            # epochs the param drift stays tiny if the math is identical
            assert worst < 2e-3, (sid, worst)
            assert abs(
                float(vres["per_subject_arousal"][sid]) - seq_final["a_acc"]
            ) < 1e-6 or worst < 2e-3

    @pytest.mark.slow
    def test_mesh_matches_single_device(self, tiny_model, full_ds):
        """Subject-sharded run over the CPU mesh == unsharded run
        (incl. subject-axis padding to the device multiple)."""
        from jax.sharding import Mesh

        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )

        devs = np.asarray(jax.devices()[:4])
        mesh = Mesh(devs, ("subjects",))

        kw = dict(batch_size=16, seed=SEED, verbose=False)
        a = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, **kw
        )
        b = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, mesh=mesh, **kw
        )
        assert b.n_total == 4  # padded to the device multiple
        ra = a.run_phase("fusion_arousal", 1)
        rb = b.run_phase("fusion_arousal", 1)
        np.testing.assert_allclose(ra["loss"], rb["loss"], rtol=2e-4)
        pa = jax.tree.leaves(a.params)[0]
        pb = jax.tree.leaves(b.params)[0]
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb)[:N_SUBJECTS], atol=2e-5
        )


@pytest.mark.slow
class TestVPhasedResume:
    def test_save_restore_roundtrip(self, tiny_model, full_ds, tmp_path):
        """Phase-boundary resume: a restored trainer finishes the
        curriculum exactly like the original would."""
        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )

        kw = dict(batch_size=16, seed=SEED, verbose=False)
        a = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, **kw
        )
        a.run_phase("eeg", 2)
        path = a.save_state(str(tmp_path / "vphased.msgpack"))

        b = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, **kw
        )
        b.restore_state(path)
        for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert len(b.metrics["train"]["loss"]) == 2
        np.testing.assert_array_equal(
            b.metrics["train"]["loss"][-1], a.metrics["train"]["loss"][-1]
        )
        np.testing.assert_array_equal(
            b._last_test["a_acc"], a._last_test["a_acc"]
        )

        # identical continuation through the next phase (host RNGs +
        # dropout keys restored)
        ra = a.run_phase("fusion_arousal", 1)
        rb = b.run_phase("fusion_arousal", 1)
        np.testing.assert_allclose(ra["loss"], rb["loss"], rtol=1e-6)
        deltas = jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a.params, b.params
        )
        assert max(jax.tree.leaves(deltas)) == 0.0


@pytest.mark.slow
class TestVPhasedSchedule:
    """Per-subject plateau-LR + early-stop lanes inside the fused phase
    scan (vphased module docstring; reference MultiTaskTrainer.py:517-527
    dormant early stop, :67-176 per-phase schedulers)."""

    def test_default_mode_is_constant_lr_no_stop(self, tiny_model, full_ds):
        """Parity defaults: the schedule transition is a no-op — constant
        LR, no lane ever stops (the reference rebuilds its scheduler every
        epoch and its early-stop calls are commented out)."""
        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )

        vt = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, seed=SEED, batch_size=8,
            rng_impl="rbg", verbose=False,
        )
        vt.run_phase("fusion_arousal", 3)
        hist = vt._last_hist
        np.testing.assert_array_equal(hist["lr"], np.float32(vt.lr))
        assert not hist["stopped"].any()

    def test_schedule_lanes_match_host_replay(self, tiny_model, full_ds):
        """Improvement mode (--no-reset-optimizer + early stop): replaying
        the phase's recorded per-epoch test losses through the host
        ReduceLROnPlateau/EarlyStopping classes reproduces each subject's
        in-program LR trajectory and stop epoch."""
        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )
        from multimodal_sentiment_aanalysis_tpu.train.multitask import PHASES
        from multimodal_sentiment_aanalysis_tpu.utils.schedule import (
            EarlyStopping,
            ReduceLROnPlateau,
        )

        vt = VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, seed=SEED, batch_size=8,
            rng_impl="rbg", verbose=False,
            reset_optimizer_each_epoch=False, early_stop=True,
            es_patience=2,
        )
        E = 8
        phase = "fusion_arousal"
        spec = PHASES[phase]
        vt.run_phase(phase, E)
        hist = vt._last_hist  # dicts of (S, E)
        te = np.stack(vt.metrics["test"]["loss"], axis=1)  # (S, E)
        stop_epoch = np.asarray(
            jax.device_get(vt._phase_sched[phase]["stop_epoch"])
        )

        for s in range(vt.n_subjects):
            sch = ReduceLROnPlateau(
                lr=vt.lr, patience=spec.sched_patience,
                factor=spec.sched_factor,
            )
            early = EarlyStopping(patience=2)
            host_stop = 0
            for e in range(E):
                v = float(te[s, e])
                if np.isfinite(v):
                    sch.step(v)
                early.step(v)
                assert np.float32(sch.lr) == hist["lr"][s, e], (s, e)
                if early.should_stop:
                    host_stop = e + 1
                    break
            assert stop_epoch[s] == host_stop, s

        # stopped subjects freeze: deterministic eval repeats bit-for-bit
        for s in range(vt.n_subjects):
            if stop_epoch[s] and stop_epoch[s] < E:
                np.testing.assert_array_equal(
                    te[s, stop_epoch[s]:], te[s, stop_epoch[s] - 1]
                )
        rep = vt.stop_report(phase)
        assert "early stopping:" in rep

    def test_parity_tests_unaffected(self, tiny_model, full_ds):
        """The new schedule plumbing leaves the default phase program's
        numbers unchanged: same seed twice -> identical metrics."""
        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedPhasedTrainer,
        )

        mk = lambda: VectorizedPhasedTrainer(
            tiny_model, full_ds, N_SUBJECTS, EX, seed=SEED, batch_size=8,
            rng_impl="rbg", verbose=False,
        )
        a, b = mk(), mk()
        ra = a.run_phase("eeg", 2)
        rb = b.run_phase("eeg", 2)
        for k in ra:
            np.testing.assert_array_equal(ra[k], rb[k])
