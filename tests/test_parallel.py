"""Data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_sentiment_aanalysis_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force an 8-device CPU mesh"
    return make_mesh(8)


@pytest.fixture(scope="module")
def setup(mesh):
    """Tiny flagship model + batch + CE-arousal loss, DP vs single-device."""
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )
    from multimodal_sentiment_aanalysis_tpu.ops.losses import (
        masked_accuracy,
        masked_cross_entropy,
    )

    model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
    rng = np.random.default_rng(0)
    b = 32
    batch = {
        "eeg": rng.normal(size=(b, 32, 64)).astype(np.float32),
        "eye": rng.normal(size=(b, 38)).astype(np.float32),
        "pps": rng.normal(size=(b, 230)).astype(np.float32),
        "arousal": rng.integers(0, 3, b).astype(np.int64),
        "valence": rng.integers(0, 3, b).astype(np.int64),
        "mask": np.ones(b, np.float32),
    }
    variables = model.init(
        jax.random.key(0), batch["eeg"][:2], batch["eye"][:2], batch["pps"][:2]
    )

    def loss_fn(params, batch_stats, batch, key):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["eeg"], batch["eye"], batch["pps"],
            labels=(batch["arousal"], batch["valence"], batch["mask"]),
            train=True, mutable=["batch_stats"], rngs={"dropout": key},
        )
        arousal, valence, *_ = outs
        loss = masked_cross_entropy(arousal, batch["arousal"], batch["mask"])
        metrics = {
            "loss": loss * batch["mask"].sum(),
            "a_acc": masked_accuracy(arousal, batch["arousal"], batch["mask"])
            * batch["mask"].sum(),
            "n": batch["mask"].sum(),
        }
        return loss, (mutated["batch_stats"], metrics)

    return model, variables, batch, loss_fn


class TestDPStep:
    @pytest.mark.slow
    def test_dp_step_runs_and_replicates(self, mesh, setup):
        model, variables, batch, loss_fn = setup
        tx = optax.adamw(1e-4)
        opt_state = tx.init(variables["params"])
        step = make_dp_train_step(loss_fn, tx, mesh)

        params = replicate(mesh, variables["params"])
        bs = replicate(mesh, variables.get("batch_stats", {}))
        opt_state = replicate(mesh, opt_state)
        sharded = shard_batch(mesh, batch)

        new_params, new_bs, new_opt, metrics = step(
            params, bs, opt_state, jax.random.key(1), sharded
        )
        n = float(metrics["n"])
        assert n == 32.0
        assert np.isfinite(float(metrics["loss"]) / n)
        # params actually moved
        delta = max(
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(params))
        )
        assert delta > 0

    @pytest.mark.slow
    def test_dp_matches_single_device_ce_grads(self, mesh, setup):
        """DP weighted-psum of per-shard CE grads == global-batch grads.

        Dropout is per-device folded, so compare with dropout disabled
        (train=False eval apply inside a grad-only loss)."""
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            masked_cross_entropy,
        )

        model, variables, batch, _ = setup

        def det_loss(params, batch_stats, batch, key):
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["eeg"], batch["eye"], batch["pps"],
                labels=(batch["arousal"], batch["valence"], batch["mask"]),
                train=False,
            )
            arousal = outs[0]
            loss = masked_cross_entropy(arousal, batch["arousal"], batch["mask"])
            return loss, (batch_stats, {"n": batch["mask"].sum()})

        tx = optax.sgd(1e-2)
        opt_state = tx.init(variables["params"])
        step = make_dp_train_step(det_loss, tx, mesh, clip_norm=None)
        params_r = replicate(mesh, variables["params"])
        bs_r = replicate(mesh, variables.get("batch_stats", {}))
        opt_r = replicate(mesh, opt_state)
        dp_params, *_ = step(params_r, bs_r, opt_r, jax.random.key(0), shard_batch(mesh, batch))

        # single-device reference
        grads = jax.grad(
            lambda p: det_loss(p, variables.get("batch_stats", {}), batch, None)[0]
        )(variables["params"])
        updates, _ = tx.update(grads, opt_state, variables["params"])
        ref_params = optax.apply_updates(variables["params"], updates)

        for a, b in zip(jax.tree.leaves(dp_params), jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_uneven_batch_padding(self, mesh):
        batch = {"x": jnp.arange(10.0)}
        mask = jnp.ones(10)
        padded, pmask = pad_batch_to_devices(batch, mask, 8)
        assert padded["x"].shape[0] == 16
        assert float(pmask.sum()) == 10.0


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__

        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        leaves = jax.tree.leaves(out)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
class TestGSPMD:
    def test_gspmd_step_matches_single_device(self, mesh, setup):
        """The annotation-sharded flavor (XLA inserts the collectives) gives
        the same updated params as a plain single-device step."""
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            masked_cross_entropy,
        )
        from multimodal_sentiment_aanalysis_tpu.parallel.dp import (
            gspmd_jit_step,
        )

        model, variables, batch, _ = setup
        bs = variables.get("batch_stats", {})
        tx = optax.sgd(1e-2)

        def step_fn(state, batch):
            params, opt_state = state

            def loss(p):
                outs = model.apply(
                    {"params": p, "batch_stats": bs},
                    batch["eeg"], batch["eye"], batch["pps"],
                    labels=(batch["arousal"], batch["valence"], batch["mask"]),
                    train=False,
                )
                return masked_cross_entropy(
                    outs[0], batch["arousal"], batch["mask"]
                )

            loss_val, grads = jax.value_and_grad(loss)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), {
                "loss": loss_val
            }

        opt_state = tx.init(variables["params"])
        state = (variables["params"], opt_state)
        dist_step = gspmd_jit_step(step_fn, mesh)
        (gspmd_params, _), gspmd_metrics = dist_step(state, batch)

        (ref_params, _), ref_metrics = jax.jit(step_fn)(state, batch)
        np.testing.assert_allclose(
            float(gspmd_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(gspmd_params), jax.tree.leaves(ref_params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestDPEval:
    def test_dp_eval_matches_single_device(self, mesh, setup):
        import jax.numpy as jnp

        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            masked_accuracy,
            masked_cross_entropy,
        )
        from multimodal_sentiment_aanalysis_tpu.parallel import shard_batch
        from multimodal_sentiment_aanalysis_tpu.parallel.dp import (
            make_dp_eval_step,
        )

        model, variables, batch, _ = setup

        def metrics_fn(params, batch_stats, batch):
            a, v = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["eeg"], batch["eye"], batch["pps"],
            )
            n = batch["mask"].sum()
            return {
                "a_acc": masked_accuracy(a, batch["arousal"], batch["mask"]) * n,
                "loss": masked_cross_entropy(a, batch["arousal"], batch["mask"]) * n,
                "n": n,
            }

        eval_step = make_dp_eval_step(metrics_fn, mesh)
        sharded = shard_batch(mesh, batch)
        dist = jax.device_get(
            eval_step(variables["params"], variables.get("batch_stats", {}), sharded)
        )
        local = jax.device_get(
            jax.tree.map(
                lambda x: x,
                metrics_fn(variables["params"], variables.get("batch_stats", {}), batch),
            )
        )
        assert float(dist["n"]) == float(local["n"])
        np.testing.assert_allclose(
            float(dist["a_acc"]), float(local["a_acc"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(dist["loss"]), float(local["loss"]), rtol=1e-4
        )


class TestMultiTaskBatchDP:
    """Phased engine batch-DP: mesh run == single-device run."""

    @pytest.mark.slow
    def test_phased_dp_matches_single_device(self, mesh):
        from multimodal_sentiment_aanalysis_tpu.data import DeviceDataset
        from multimodal_sentiment_aanalysis_tpu.models import (
            MultimodalTransformerModel,
        )
        from multimodal_sentiment_aanalysis_tpu.train import MultiTaskTrainer

        model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
        rng = np.random.default_rng(3)
        n = 48
        arrays = {
            "eeg": rng.normal(size=(n, 32, 64)).astype(np.float32),
            "eye": rng.normal(size=(n, 38)).astype(np.float32),
            "pps": rng.normal(size=(n, 230)).astype(np.float32),
            "arousal": rng.integers(0, 3, n).astype(np.int64),
            "valence": rng.integers(0, 3, n).astype(np.int64),
        }
        train = DeviceDataset({k: v[:40] for k, v in arrays.items()})
        test = DeviceDataset({k: v[40:] for k, v in arrays.items()})

        kw = dict(batch_size=16, seed=5, verbose=False)
        a = MultiTaskTrainer(model, train, test, **kw)
        b = MultiTaskTrainer(model, train, test, mesh=mesh, **kw)
        ra = a.train_epoch_phase("fusion_arousal")
        rb = b.train_epoch_phase("fusion_arousal")
        # same seed -> same plans/dropout keys; GSPMD only reorders float
        # accumulation (partitionable threefry keeps the masks identical)
        assert abs(ra["loss"] - rb["loss"]) < 1e-3, (ra, rb)
        deltas = jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a.params, b.params
        )
        assert max(jax.tree.leaves(deltas)) < 1e-4

        # the valence phase's grad-vs-update asymmetry survives DP too
        ra = a.train_epoch_phase("valence")
        rb = b.train_epoch_phase("valence")
        assert abs(ra["loss"] - rb["loss"]) < 1e-3
        deltas = jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a.params, b.params
        )
        assert max(jax.tree.leaves(deltas)) < 2e-4
