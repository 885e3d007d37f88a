"""Training engine tests: masks, phases, NaN skip, schedules, checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_model():
    """Flagship model with shrunk dims to keep CPU tests fast."""
    from multimodal_sentiment_aanalysis_tpu.models import MultimodalTransformerModel

    return MultimodalTransformerModel(feat_dim=32, eeg_time=64)


@pytest.fixture(scope="module")
def tiny_data():
    from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset

    rng = np.random.default_rng(0)
    n = 48
    labels_a = rng.integers(0, 3, n)
    labels_v = rng.integers(0, 3, n)
    sig = rng.normal(size=(3, 32, 64)).astype(np.float32)
    arrays = {
        "eeg": (rng.normal(size=(n, 32, 64)) * 0.3 + sig[labels_a]).astype(np.float32),
        "eye": rng.normal(size=(n, 38)).astype(np.float32),
        "pps": rng.normal(size=(n, 230)).astype(np.float32),
        "arousal": labels_a.astype(np.int64),
        "valence": labels_v.astype(np.int64),
    }
    train = DeviceDataset({k: v[:40] for k, v in arrays.items()})
    test = DeviceDataset({k: v[40:] for k, v in arrays.items()})
    return train, test


class TestMasks:
    def test_module_mask_selects_submodules(self):
        from multimodal_sentiment_aanalysis_tpu.train import module_mask

        params = {
            "eeg_net": {"w": jnp.zeros(2), "nested": {"b": jnp.zeros(1)}},
            "eye_net": {"w": jnp.zeros(2)},
            "temperature": jnp.zeros(()),
        }
        mask = module_mask(params, {"eeg_net", "temperature"})
        assert mask["eeg_net"]["w"] is True
        assert mask["eeg_net"]["nested"]["b"] is True
        assert mask["eye_net"]["w"] is False
        assert mask["temperature"] is True

    def test_zero_masked_grads(self):
        from multimodal_sentiment_aanalysis_tpu.train import (
            module_mask,
            zero_masked_grads,
        )

        grads = {"a": {"w": jnp.ones(3)}, "b": {"w": jnp.ones(3)}}
        mask = module_mask(grads, {"a"})
        out = zero_masked_grads(grads, mask)
        assert float(out["a"]["w"].sum()) == 3.0
        assert float(out["b"]["w"].sum()) == 0.0

    def test_clip_matches_torch_semantics(self):
        import torch

        from multimodal_sentiment_aanalysis_tpu.train.state import (
            clip_by_global_norm,
        )

        g = [np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)]
        t = torch.tensor(g[0], requires_grad=True)
        (t * 1.0).sum().backward()
        t.grad = torch.tensor(g[0])
        torch.nn.utils.clip_grad_norm_([t], 1.0)
        ours, norm = clip_by_global_norm({"w": jnp.asarray(g[0])}, 1.0)
        np.testing.assert_allclose(
            np.asarray(ours["w"]), t.grad.numpy(), rtol=2e-4
        )


class TestMultiTask:
    @pytest.fixture(scope="class")
    def trainer(self, tiny_model, tiny_data, tmp_path_factory):
        from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer

        train, test = tiny_data
        return MultiTaskTrainer(
            tiny_model,
            train,
            test,
            batch_size=16,
            checkpoint_dir=str(tmp_path_factory.mktemp("ckpt")),
            verbose=False,
        )

    @pytest.mark.slow
    def test_phase_eeg_updates_only_eeg(self, trainer):
        p_before = jax.device_get(trainer.params)
        trainer.schedulers["eeg"] = __import__(
            "multimodal_sentiment_aanalysis_tpu.utils.schedule",
            fromlist=["ReduceLROnPlateau"],
        ).ReduceLROnPlateau(lr=1e-4)
        trainer.train_epoch_phase("eeg")
        p_after = jax.device_get(trainer.params)

        def max_delta(a, b):
            return max(
                float(np.abs(x - y).max())
                for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
            )

        assert max_delta(p_before["eeg_net"], p_after["eeg_net"]) > 0
        for frozen in ("eye_net", "pps_net", "arousal_head", "valence_head"):
            assert max_delta(p_before[frozen], p_after[frozen]) == 0.0
        # learnable scalars frozen in phase 1 too
        assert float(p_before["temperature"]) == float(p_after["temperature"])

    def test_phase3_updates_only_valence_head(self, trainer):
        from multimodal_sentiment_aanalysis_tpu.utils.schedule import (
            ReduceLROnPlateau,
        )

        trainer.schedulers["valence"] = ReduceLROnPlateau(lr=1e-4)
        p_before = jax.device_get(trainer.params)
        trainer.train_epoch_phase("valence")
        p_after = jax.device_get(trainer.params)

        def max_delta(a, b):
            return max(
                float(np.abs(x - y).max())
                for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
            )

        assert max_delta(p_before["valence_head"], p_after["valence_head"]) > 0
        # fusion modules have grads (clip-norm set) but NO updates
        for frozen in ("fusion_stack", "cross_attn_e2p", "eeg_net", "arousal_head"):
            assert max_delta(p_before[frozen], p_after[frozen]) == 0.0

    def test_evaluate_records_metrics(self, trainer):
        m = trainer.evaluate()
        for k in ("loss", "a_loss", "v_loss", "c_loss", "a_acc", "v_acc"):
            assert k in m and np.isfinite(m[k])

    @pytest.mark.slow
    def test_short_run_saves_checkpoint_and_plot(self, trainer):
        import glob
        import os

        test_m = trainer.run(1, 1, 1, 1, 1, save=True, plot=True)
        assert 0.0 <= test_m["a_acc"] <= 1.0
        files = os.listdir(trainer.checkpoint_dir)
        assert any(f.endswith(".msgpack") for f in files)
        assert any(f.endswith(".png") for f in files)

    @pytest.mark.slow
    def test_fused_phase_matches_host_loop(self, tiny_model, tiny_data):
        """run_phase_fused == the per-epoch host loop: same plans, same
        dropout threading, same per-epoch optimizer reset — params and
        recorded metrics must agree to float tolerance."""
        from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer

        train, test = tiny_data
        mk = lambda: MultiTaskTrainer(
            tiny_model, train, test, batch_size=16, seed=5, verbose=False
        )
        loop, fused = mk(), mk()
        m_loop = loop._run_phase("eeg", 3, "")
        m_fused = fused.run_phase_fused("eeg", 3)

        for k in m_loop:
            assert abs(m_loop[k] - m_fused[k]) < 1e-4, (k, m_loop, m_fused)
        for split in ("train", "test"):
            for k, series in loop.metrics[split].items():
                np.testing.assert_allclose(
                    fused.metrics[split][k], series, atol=1e-4, err_msg=k
                )
        deltas = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            loop.params, fused.params,
        )
        # same math, different program boundaries: XLA fusion reorders
        # float accumulation, so allow ~1e-3 drift after 3 trained epochs
        assert max(jax.tree.leaves(deltas)) < 1e-3

    def test_fused_phase_zero_epochs_is_noop(self, tiny_model, tiny_data):
        # regression: jnp.stack over an empty plan list used to raise
        from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer

        train, test = tiny_data
        tr = MultiTaskTrainer(
            tiny_model, train, test, batch_size=16, fused_phases=True,
            verbose=False,
        )
        assert tr.run_phase_fused("eeg", 0) == {}
        assert "eeg" not in tr.schedulers

    def test_fused_phase_rejects_scheduler_feedback_mode(
        self, tiny_model, tiny_data
    ):
        from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer

        train, test = tiny_data
        tr = MultiTaskTrainer(
            tiny_model, train, test, batch_size=16,
            reset_optimizer_each_epoch=False, verbose=False,
        )
        with pytest.raises(ValueError):
            tr.run_phase_fused("eeg", 1)
        # and the constructor flag silently stays off in that mode
        tr2 = MultiTaskTrainer(
            tiny_model, train, test, batch_size=16,
            reset_optimizer_each_epoch=False, fused_phases=True, verbose=False,
        )
        assert tr2.fused_phases is False


class TestSingleTaskTrainer:
    @pytest.mark.slow
    def test_run_with_early_stop_and_ckpt(self, tiny_model, tiny_data, tmp_path):
        from multimodal_sentiment_aanalysis_tpu.train import Trainer

        train, test = tiny_data
        tr = Trainer(
            tiny_model,
            train,
            test,
            batch_size=16,
            checkpoint_dir=str(tmp_path),
            verbose=False,
        )
        tr.run(epochs=3, test_person=0)
        assert len(tr.train_loss) >= 1
        assert all(np.isfinite(x) for x in tr.train_loss)
        import os

        assert "best_model.msgpack" in os.listdir(tmp_path)

    def test_trainer_contrastive_weight_learns(self, tiny_model, tiny_data, tmp_path):
        from multimodal_sentiment_aanalysis_tpu.train import Trainer

        train, test = tiny_data
        tr = Trainer(
            tiny_model, train, test, batch_size=16,
            checkpoint_dir=str(tmp_path), verbose=False,
        )
        w0 = float(tr.params["trainer"]["contrastive_weight"][0])
        tr.train_epoch(1)
        w1 = float(tr.params["trainer"]["contrastive_weight"][0])
        assert w0 != w1  # the weight is in the optimizer's param group

    @pytest.mark.slow
    def test_test_with_loaded_model(self, tiny_model, tiny_data, tmp_path, capsys):
        """Engine-side re-evaluation of a saved checkpoint
        (reference Trainer.py:192-243)."""
        from multimodal_sentiment_aanalysis_tpu.train import Trainer
        from multimodal_sentiment_aanalysis_tpu.utils.checkpoint import (
            save_checkpoint,
        )

        train, test = tiny_data
        tr = Trainer(
            tiny_model, train, test, batch_size=16,
            checkpoint_dir=str(tmp_path), verbose=False,
        )
        tr.train_epoch(1)
        ref_metrics = tr._eval_metrics()
        path = save_checkpoint(
            str(tmp_path / "m.msgpack"),
            {"params": tr.params["model"], "batch_stats": tr.batch_stats},
        )
        # perturb the live MODEL params; the load must restore the saved ones
        # (the trainer-level contrastive weight is NOT in the checkpoint,
        # matching the reference's model.state_dict() scope)
        tr.params = {
            "model": jax.tree.map(
                lambda x: x + 1.0 if jnp.issubdtype(x.dtype, jnp.floating) else x,
                tr.params["model"],
            ),
            "trainer": tr.params["trainer"],
        }
        loss, ce, con, acc = tr.test_with_loaded_model(path)
        out = capsys.readouterr().out
        assert "Test Loss:" in out and "Contrastive Loss:" in out
        assert np.isfinite([loss, ce, con]).all()
        np.testing.assert_allclose(
            [loss, ce, con, acc], list(ref_metrics), rtol=1e-5
        )


class TestResetOptimizerFlag:
    def _adam_count(self, opt_state) -> int:
        counts = [
            int(l)
            for l in jax.tree.leaves(opt_state)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.integer)
            and l.ndim == 0
        ]
        assert counts, "no step counter found in opt state"
        return max(counts)

    @pytest.mark.slow
    @pytest.mark.parametrize("reset", [True, False])
    def test_moments_persist_across_epochs(self, tiny_model, tiny_data,
                                           tmp_path, reset):
        """reset=True re-inits Adam each epoch (reference quirk,
        MultiTaskTrainer.py:181,237,293,351,412); False keeps moments —
        visible in the Adam step counter after 2 epochs."""
        from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer

        train, test = tiny_data
        tr = MultiTaskTrainer(
            tiny_model, train, test, batch_size=16,
            checkpoint_dir=str(tmp_path), verbose=False,
            reset_optimizer_each_epoch=reset,
        )
        tr._run_phase("eeg", 2, "phase eeg")
        nb = -(-len(train) // 16)
        count = self._adam_count(tr._opt_state["eeg"])
        assert count == (nb if reset else 2 * nb)

    def test_cli_flag_wiring(self, monkeypatch):
        from multimodal_sentiment_aanalysis_tpu import cli

        seen = {}
        monkeypatch.setattr(cli, "cmd_phased", lambda args: seen.update(vars(args)))
        cli.main(["phased", "--synthetic", "--no-reset-optimizer"])
        assert seen["no_reset_optimizer"] is True
        seen.clear()
        cli.main(["phased", "--synthetic"])
        assert seen["no_reset_optimizer"] is False


class TestSchedules:
    def test_plateau_reduces_after_patience(self):
        from multimodal_sentiment_aanalysis_tpu.utils.schedule import (
            ReduceLROnPlateau,
        )

        s = ReduceLROnPlateau(lr=1.0, patience=2, factor=0.5)
        assert s.step(1.0) == 1.0  # best
        assert s.step(1.1) == 1.0  # bad 1
        assert s.step(1.1) == 1.0  # bad 2
        assert s.step(1.1) == 0.5  # bad 3 > patience -> reduce

    def test_early_stopping(self):
        from multimodal_sentiment_aanalysis_tpu.utils.schedule import EarlyStopping

        e = EarlyStopping(patience=2)
        assert e.step(1.0) is True  # improvement -> save point
        assert e.step(2.0) is False
        assert not e.should_stop
        e.step(2.0)
        assert e.should_stop


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from multimodal_sentiment_aanalysis_tpu.utils import (
            load_checkpoint,
            save_checkpoint,
        )

        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        p = save_checkpoint(str(tmp_path / "x.msgpack"), tree)
        restored = load_checkpoint(p, jax.tree.map(jnp.zeros_like, tree))
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))

    def test_strip_module_prefix(self):
        from multimodal_sentiment_aanalysis_tpu.utils import strip_module_prefix

        d = {"module.a": 1, "module.b": 2}
        assert strip_module_prefix(d) == {"a": 1, "b": 2}
        d2 = {"module.a": 1, "b": 2}  # not uniform -> untouched
        assert strip_module_prefix(d2) == d2


@pytest.mark.slow
class TestSimCLREngines:
    def test_pretrain_and_finetune(self, tiny_data):
        from multimodal_sentiment_aanalysis_tpu.data import build_contrastive_pairs
        from multimodal_sentiment_aanalysis_tpu.models import (
            Classifier,
            MultiModalEncoder,
            ProjectionHead,
        )
        from multimodal_sentiment_aanalysis_tpu.train import (
            contrastive_pretrain,
            finetune,
        )

        train, test = tiny_data

        class TinyEncoder(MultiModalEncoder):
            pass

        # build pairs over the 40 train samples as 2 pseudo-subjects
        a = np.asarray(train.arrays["arousal"])
        v = np.asarray(train.arrays["valence"])
        subj = np.repeat([0, 1], 20)
        pairs, labels = build_contrastive_pairs(a, v, subj, seed=0)
        assert len(pairs) > 0

        # a small encoder (feat_dim stays 256 but eeg stem is the tiny one)
        from multimodal_sentiment_aanalysis_tpu.models import MultiModalEncoder

        enc = MultiModalEncoder()
        proj = ProjectionHead()
        enc_vars, proj_vars, losses = contrastive_pretrain(
            enc, proj, train, pairs, labels, num_epochs=1, batch_size=16,
            verbose=False,
        )
        assert len(losses) == 1 and np.isfinite(losses[0])

        clf = Classifier()
        clf_vars, metrics = finetune(
            enc, enc_vars, clf, train, test, num_epochs=1, batch_size=16,
            verbose=False,
        )
        assert 0.0 <= metrics["a_acc"] <= 1.0


class TestProfilingUtils:
    def test_timed_and_dumps(self):
        import jax.numpy as jnp

        from multimodal_sentiment_aanalysis_tpu.utils import (
            StepTimer,
            dump_hlo,
            dump_jaxpr,
            timed,
        )

        fn = lambda x: (x * 2).sum()
        secs, result = timed(jax.jit(fn), jnp.ones(8), iters=3)
        assert secs > 0 and float(result) == 16.0
        assert "mul" in dump_jaxpr(fn, jnp.ones(8))
        assert "stablehlo" in dump_hlo(fn, jnp.ones(8)) or "module" in dump_hlo(fn, jnp.ones(8))
        t = StepTimer()
        with t:
            pass
        assert t.rate(64) > 0


@pytest.mark.slow
class TestCheckpointResume:
    def test_trainer_save_restore_roundtrip(self, tmp_path, rng):
        from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )
        from multimodal_sentiment_aanalysis_tpu.train import Trainer

        n = 24
        arrays = {
            "eeg": rng.normal(size=(n, 32, 64)).astype(np.float32),
            "eye": rng.normal(size=(n, 38)).astype(np.float32),
            "pps": rng.normal(size=(n, 230)).astype(np.float32),
            "arousal": rng.integers(0, 3, n).astype(np.int64),
            "valence": rng.integers(0, 3, n).astype(np.int64),
        }
        ds = DeviceDataset(arrays)
        model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
        tr = Trainer(model, ds, ds, batch_size=8,
                     checkpoint_dir=str(tmp_path), verbose=False)
        tr.train_epoch(1)
        tr.test()
        path = tr.save_state(str(tmp_path / "state.msgpack"))

        tr2 = Trainer(model, ds, ds, batch_size=8,
                      checkpoint_dir=str(tmp_path), verbose=False)
        tr2.restore_state(path)
        for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert tr2.scheduler.best == tr.scheduler.best
        assert tr2.train_loss == tr.train_loss

        # both continue identically for one more epoch
        r1 = tr.train_epoch(2)
        r2 = tr2.train_epoch(2)
        np.testing.assert_allclose(r1[0], r2[0], rtol=1e-6)

    def test_multitask_save_restore(self, tmp_path, rng):
        from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )
        from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer

        n = 20
        arrays = {
            "eeg": rng.normal(size=(n, 32, 64)).astype(np.float32),
            "eye": rng.normal(size=(n, 38)).astype(np.float32),
            "pps": rng.normal(size=(n, 230)).astype(np.float32),
            "arousal": rng.integers(0, 3, n).astype(np.int64),
            "valence": rng.integers(0, 3, n).astype(np.int64),
        }
        ds = DeviceDataset(arrays)
        model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
        tr = MultiTaskTrainer(model, ds, ds, batch_size=8,
                              checkpoint_dir=str(tmp_path), verbose=False)
        tr._run_phase("eeg", 1, "phase eeg")
        path = tr.save_state(str(tmp_path / "mt_state.msgpack"))

        tr2 = MultiTaskTrainer(model, ds, ds, batch_size=8,
                               checkpoint_dir=str(tmp_path), verbose=False)
        tr2.restore_state(path)
        for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert tr2.metrics["train"]["loss"] == tr.metrics["train"]["loss"]
        m1 = tr.train_epoch_phase("eeg")
        m2 = tr2.train_epoch_phase("eeg")
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)

    def test_trainer_best_checkpoint_loads_into_tester(self, tmp_path, rng):
        from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
        from multimodal_sentiment_aanalysis_tpu.eval import Tester
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )
        from multimodal_sentiment_aanalysis_tpu.train import Trainer

        n = 16
        arrays = {
            "eeg": rng.normal(size=(n, 32, 64)).astype(np.float32),
            "eye": rng.normal(size=(n, 38)).astype(np.float32),
            "pps": rng.normal(size=(n, 230)).astype(np.float32),
            "arousal": rng.integers(0, 3, n).astype(np.int64),
            "valence": rng.integers(0, 3, n).astype(np.int64),
        }
        ds = DeviceDataset(arrays)
        model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
        tr = Trainer(model, ds, ds, batch_size=8, checkpoint_dir=str(tmp_path),
                     verbose=False)
        tr.train_epoch(1)
        te = tr.test()
        assert tr.early.step(te[0])  # first loss is an improvement
        from multimodal_sentiment_aanalysis_tpu.utils.checkpoint import (
            save_checkpoint,
        )

        save_checkpoint(
            str(tmp_path / "best_model.msgpack"),
            {"params": tr.params["model"], "batch_stats": tr.batch_stats},
        )
        tester = Tester(model, ds)
        res = tester.run(model_path=str(tmp_path / "best_model.msgpack"),
                         verbose=False, plot_dir=str(tmp_path))
        assert 0.0 <= res["arousal"]["accuracy"] <= 1.0


class TestAdamWLowp:
    """Low-precision-moment AdamW (train.state.adamw_lowp)."""

    def _tree(self, rng):
        return {
            "w": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
        }

    def test_fp32_moments_match_optax_adamw(self, rng):
        import optax

        from multimodal_sentiment_aanalysis_tpu.train.state import adamw_lowp

        params = self._tree(rng)
        ref = optax.adamw(1e-3, weight_decay=0.01)
        lowp = adamw_lowp(1e-3, weight_decay=0.01, moment_dtype=jnp.float32)
        s_ref, s_lowp = ref.init(params), lowp.init(params)
        p_ref = p_lowp = params
        for i in range(5):
            g = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape).astype(np.float32)),
                params,
            )
            u_ref, s_ref = ref.update(g, s_ref, p_ref)
            u_lowp, s_lowp = lowp.update(g, s_lowp, p_lowp)
            for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_lowp)):
                np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
            p_ref = optax.apply_updates(p_ref, u_ref)
            p_lowp = optax.apply_updates(p_lowp, u_lowp)

    def test_bf16_moments_dtype_and_proximity(self, rng):
        import optax

        from multimodal_sentiment_aanalysis_tpu.train.state import adamw_lowp

        params = self._tree(rng)
        ref = optax.adamw(1e-3, weight_decay=0.01)
        lowp = adamw_lowp(1e-3, weight_decay=0.01, moment_dtype=jnp.bfloat16)
        s_ref, s_lowp = ref.init(params), lowp.init(params)
        # moments stored bf16 -> half the optimizer-state bytes
        for leaf in jax.tree.leaves((s_lowp[0].mu, s_lowp[0].nu)):
            assert leaf.dtype == jnp.bfloat16
        p_ref = p_lowp = params
        for i in range(10):
            g = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape).astype(np.float32)),
                params,
            )
            u_ref, s_ref = ref.update(g, s_ref, p_ref)
            u_lowp, s_lowp = lowp.update(g, s_lowp, p_lowp)
            p_ref = optax.apply_updates(p_ref, u_ref)
            p_lowp = optax.apply_updates(p_lowp, u_lowp)
        # ~8-bit moment mantissa: updates track optax within ~1%
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_lowp)):
            np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)

    def test_vloso_moment_dtype_smoke(self, tiny_model):
        from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
        from multimodal_sentiment_aanalysis_tpu.train import (
            VectorizedLOSOTrainer,
        )

        r = np.random.default_rng(0)
        n_subj, ex = 4, 6
        n = n_subj * ex
        arrays = {
            "eeg": r.normal(size=(n, 32, 64)).astype(np.float32),
            "eye": r.normal(size=(n, 38)).astype(np.float32),
            "pps": r.normal(size=(n, 230)).astype(np.float32),
            "arousal": r.integers(0, 3, n).astype(np.int64),
            "valence": r.integers(0, 3, n).astype(np.int64),
        }
        tr = VectorizedLOSOTrainer(
            tiny_model, DeviceDataset(arrays), n_subj, ex, batch_size=8,
            compute_dtype="bfloat16", moment_dtype="bfloat16",
        )
        tr.train_epoch()
        for leaf in jax.tree.leaves((tr.opt_state[0].mu, tr.opt_state[0].nu)):
            assert leaf.dtype == jnp.bfloat16
        assert all(
            bool(jnp.isfinite(x).all())
            for x in jax.tree.leaves(tr.params)
        )
