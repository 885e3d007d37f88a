"""Tensor-parallel (GSPMD) tests on the virtual 8-device CPU mesh.

A ``(data=2, model=4)`` mesh exercises DP and TP collectives together;
every test compares against the single-device program — sharding must
be layout-only (SURVEY.md §5 distributed row; net-new vs the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_sentiment_aanalysis_tpu.parallel.tp import (
    batch_sharding,
    make_mesh_2d,
    param_partition_specs,
    shard_by_specs,
)


@pytest.fixture(scope="module")
def mesh2d():
    assert len(jax.devices()) == 8, "conftest must force an 8-device CPU mesh"
    return make_mesh_2d(2, 4)


@pytest.fixture(scope="module")
def setup():
    from multimodal_sentiment_aanalysis_tpu.models import (
        MultimodalTransformerModel,
    )

    model = MultimodalTransformerModel(feat_dim=32, eeg_time=64)
    rng = np.random.default_rng(0)
    b = 16
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
    return model, variables, batch


class TestSpecs:
    def test_megatron_pairs(self, setup):
        """FFN/attention/LSTM/conv get the documented placements."""
        _, variables, _ = setup
        specs = param_partition_specs(variables["params"], tp=4)
        eye_l0 = specs["eye_net"]["transformer"]["layers_0"]
        assert eye_l0["linear1"]["kernel"] == P(None, "model")
        assert eye_l0["linear1"]["bias"] == P("model")
        assert eye_l0["linear2"]["kernel"] == P("model", None)
        assert eye_l0["linear2"]["bias"] == P()
        assert eye_l0["self_attn"]["in_proj_weight"] == P("model", None)
        assert eye_l0["self_attn"]["out_proj_weight"] == P(None, "model")
        assert eye_l0["norm1"]["scale"] == P()
        eeg = specs["eeg_net"]
        assert eeg["lstm0_w_ih_fwd"] == P("model", None)
        assert eeg["lstm0_b_hh_bwd"] == P("model")
        assert eeg["conv1_weight"] == P("model", None, None)
        assert eeg["conv1_bias"] == P("model")
        assert eeg["bn1"]["scale"] == P("model")

    def test_indivisible_dims_replicate(self, setup):
        """tp=7 divides nothing in the tiny model -> everything P()."""
        _, variables, _ = setup
        specs = param_partition_specs(variables["params"], tp=7)
        heads = [s for s in jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, P))]
        assert all(s == P() for s in heads)

    def test_tree_structure_matches_params(self, setup):
        _, variables, _ = setup
        specs = param_partition_specs(variables["params"], tp=4)
        jax.tree.map(lambda *_: None, dict(variables["params"]), specs,
                     is_leaf=lambda x: isinstance(x, P))


class TestTPForward:
    def test_tp_forward_matches_single_device(self, mesh2d, setup):
        model, variables, batch = setup
        specs = param_partition_specs(variables["params"], tp=4)
        sharded = shard_by_specs(mesh2d, dict(variables["params"]), specs)
        bs = variables.get("batch_stats", {})
        sbatch = batch_sharding(
            mesh2d, {k: batch[k] for k in ("eeg", "eye", "pps")}
        )

        def fwd(params, eeg, eye, pps):
            return model.apply(
                {"params": params, "batch_stats": bs}, eeg, eye, pps
            )

        ref_a, ref_v = jax.jit(fwd)(
            variables["params"], batch["eeg"], batch["eye"], batch["pps"]
        )
        tp_a, tp_v = jax.jit(fwd)(
            sharded, sbatch["eeg"], sbatch["eye"], sbatch["pps"]
        )
        np.testing.assert_allclose(
            np.asarray(tp_a), np.asarray(ref_a), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(tp_v), np.asarray(ref_v), atol=2e-5
        )


@pytest.mark.slow
class TestTPStep:
    def test_tp_step_matches_single_device(self, mesh2d, setup):
        """One SGD step on the deterministic CE objective: the (2, 4)-mesh
        GSPMD program updates every param exactly like single-device."""
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            masked_cross_entropy,
        )

        model, variables, batch = setup
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
            return (optax.apply_updates(params, updates), new_opt), loss_val

        # single-device reference
        opt0 = tx.init(variables["params"])
        (ref_params, _), ref_loss = jax.jit(step_fn)(
            (variables["params"], opt0), batch
        )

        # TP: params sharded by spec, optimizer state inited under jit so
        # GSPMD lays the moments out like the params
        specs = param_partition_specs(variables["params"], tp=4)
        sparams = shard_by_specs(mesh2d, dict(variables["params"]), specs)
        sopt = jax.jit(tx.init)(sparams)
        sbatch = batch_sharding(mesh2d, batch)
        (tp_params, _), tp_loss = jax.jit(step_fn)((sparams, sopt), sbatch)

        np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
        jax.tree_util.tree_map_with_path(
            lambda p, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=jax.tree_util.keystr(p),
            ),
            tp_params,
            dict(ref_params),
        )

    def test_tp_train_mode_full_objective(self, mesh2d, setup):
        """Train-mode step (dropout + batch-stat BN + the three InfoNCE
        terms) compiles and runs finite under the (2, 4) mesh."""
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            masked_cross_entropy,
        )

        model, variables, batch = setup
        tx = optax.adamw(1e-4)

        def step_fn(state, batch, key):
            params, bstats, opt_state = state

            def loss(p):
                outs, mut = model.apply(
                    {"params": p, "batch_stats": bstats},
                    batch["eeg"], batch["eye"], batch["pps"],
                    labels=(batch["arousal"], batch["valence"], batch["mask"]),
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": key},
                )
                a, v, c1, c2, c3 = outs
                l = (masked_cross_entropy(a, batch["arousal"], batch["mask"])
                     + masked_cross_entropy(v, batch["valence"], batch["mask"])
                     + c1 + c2 + c3)
                return l, mut["batch_stats"]

            (l, nbs), grads = jax.value_and_grad(loss, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), nbs, new_opt), l

        specs = param_partition_specs(variables["params"], tp=4)
        sparams = shard_by_specs(mesh2d, dict(variables["params"]), specs)
        sopt = jax.jit(tx.init)(sparams)
        sbatch = batch_sharding(mesh2d, batch)
        state = (sparams, variables.get("batch_stats", {}), sopt)
        (new_params, _, _), loss = jax.jit(step_fn)(
            state, sbatch, jax.random.key(1)
        )
        assert np.isfinite(float(loss))
        moved = max(
            float(jnp.abs(a - b).max())
            for a, b in zip(
                jax.tree.leaves(new_params), jax.tree.leaves(sparams)
            )
        )
        assert moved > 0
