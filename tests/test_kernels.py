"""A/B numerics tests: Pallas kernels vs their jnp reference implementations.

On the CPU test mesh the kernels run in Pallas interpret mode, which
exercises the exact kernel code path (SURVEY.md §4: unit tests per kernel,
Pallas vs jax.numpy reference).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sentiment_aanalysis_tpu.kernels import (
    flash_mha,
    fused_conv_bn_gelu_pool,
    fused_supervised_infonce,
)
from multimodal_sentiment_aanalysis_tpu.kernels.attention import mha_reference
from multimodal_sentiment_aanalysis_tpu.kernels.conv_stem import fold_bn
from multimodal_sentiment_aanalysis_tpu.ops.losses import supervised_infonce


class TestFusedInfoNCE:
    @pytest.mark.parametrize("batch", [16, 64, 60])  # 60 exercises padding
    def test_forward_parity(self, rng, batch):
        f = jnp.asarray(rng.normal(size=(batch, 32)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, batch))
        ref = supervised_infonce(f, f, labels, 0.07)
        ours = fused_supervised_infonce(f, f, labels, 0.07)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_forward_parity_masked(self, rng):
        f = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, 32))
        mask = jnp.asarray((rng.random(32) > 0.3).astype(np.float32))
        ref = supervised_infonce(f, f, labels, 0.1, mask)
        ours = fused_supervised_infonce(f, f, labels, 0.1, mask)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_gradient_parity(self, rng):
        f = jnp.asarray(rng.normal(size=(24, 16)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, 24))
        t = jnp.asarray(0.05)

        def ref_loss(f, t):
            return supervised_infonce(f, f, labels, t)

        def ours_loss(f, t):
            return fused_supervised_infonce(f, f, labels, t)

        gref_f, gref_t = jax.grad(ref_loss, argnums=(0, 1))(f, t)
        gours_f, gours_t = jax.grad(ours_loss, argnums=(0, 1))(f, t)
        np.testing.assert_allclose(
            np.asarray(gours_f), np.asarray(gref_f), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(float(gours_t), float(gref_t), rtol=1e-4)

    def test_gradient_parity_no_positive_rows(self, rng):
        """Rows whose label is unique in the batch have zero positive mass
        and route a REAL gradient through the forward's row-max
        subtraction (the r_i/onehot-argmax term in ``_core_bwd``) —
        dropping it deviated from autodiff by percent on such batches.
        (This coverage previously rode in the deleted multi-kernel parity
        test; pinned here directly.)"""
        f = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        # rows 0-3 have positives (two pairs); rows 4-15 are all unique
        labels = jnp.asarray(
            np.array([0, 0, 1, 1] + list(range(10, 22)), dtype=np.int32)
        )
        t = jnp.asarray(0.05)

        def ref_loss(f, t):
            return supervised_infonce(f, f, labels, t)

        def ours_loss(f, t):
            return fused_supervised_infonce(f, f, labels, t)

        gref_f, gref_t = jax.grad(ref_loss, argnums=(0, 1))(f, t)
        gours_f, gours_t = jax.grad(ours_loss, argnums=(0, 1))(f, t)
        np.testing.assert_allclose(
            np.asarray(gours_f), np.asarray(gref_f), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(float(gours_t), float(gref_t), rtol=1e-4)

    def test_jit_composes(self, rng):
        f = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 2, 16))
        fn = jax.jit(lambda f: fused_supervised_infonce(f, f, labels, 0.1))
        assert np.isfinite(float(fn(f)))

    def test_bf16_gradient(self, rng):
        """bf16 features (the mixed-precision training path): cotangents
        must come back in the primal dtype or the upstream l2-normalize
        backward fails with a lax dtype mismatch (regression: bench bf16
        config broke when the kernel was wired into supervised_infonce)."""
        f = jnp.asarray(rng.normal(size=(24, 16))).astype(jnp.bfloat16)
        labels = jnp.asarray(rng.integers(0, 3, 24))
        t = jnp.asarray(0.05, jnp.float32)

        def ours_loss(f):
            return fused_supervised_infonce(f, f, labels, t).astype(jnp.float32)

        def ref_loss(f):
            # on the CPU test backend supervised_infonce never dispatches
            # to the kernel, so this is the pure-jnp reference
            return supervised_infonce(f, f, labels, t)

        g = jax.grad(ours_loss)(f)
        assert g.dtype == jnp.bfloat16
        gref = jax.grad(lambda f: ref_loss(f).astype(jnp.float32))(f)
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(gref, np.float32),
            rtol=0.1, atol=0.02,  # bf16 cotangent rounding
        )

class TestFlashMHA:
    @pytest.mark.parametrize(
        "tq,tk", [(128, 128), (73, 73), (64, 256), (200, 100)]
    )
    def test_forward_parity(self, rng, tq, tk):
        q = jnp.asarray(rng.normal(size=(2, 4, tq, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 4, tk, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 4, tk, 32)).astype(np.float32))
        ref = mha_reference(q, k, v)
        ours = flash_mha(q, k, v, block_q=64, block_k=64, force=True)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_gradient_parity(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 2, 96, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, 80, 16)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, 80, 16)).astype(np.float32))

        def loss_ref(q, k, v):
            return (mha_reference(q, k, v) ** 2).sum()

        def loss_ours(q, k, v):
            return (flash_mha(q, k, v, block_q=32, block_k=32, force=True) ** 2).sum()

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        go = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(go, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )

    def test_tiny_seq_dispatches_to_reference(self, rng):
        q = jnp.asarray(rng.normal(size=(2, 4, 1, 64)).astype(np.float32))
        out = flash_mha(q, q, q)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(mha_reference(q, q, q)), rtol=1e-5
        )


class TestFusedConvStem:
    @pytest.mark.parametrize(
        "c,o,k,pad,pool,t", [(32, 64, 15, 7, 4, 585), (64, 128, 5, 2, 2, 146)]
    )
    def test_stage_parity(self, rng, c, o, k, pad, pool, t):
        import jax.lax as lax

        x = jnp.asarray(rng.normal(size=(6, t, c)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(o, c, k)).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(size=(o,)).astype(np.float32) * 0.1 + 1)
        beta = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(o,)).astype(np.float32) * 0.1)
        var = jnp.asarray(rng.random(o).astype(np.float32) + 0.5)

        # jnp reference: conv -> inference BN -> gelu -> pool
        conv = lax.conv_general_dilated(
            x, jnp.transpose(w, (2, 1, 0)), (1,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias
        bn = gamma * (conv - mean) / jnp.sqrt(var + 1e-5) + beta
        act = 0.5 * bn * (1.0 + jax.lax.erf(bn / math.sqrt(2.0)))
        t_out = t // pool
        ref = act[:, : t_out * pool].reshape(6, t_out, pool, o).max(axis=2)

        scale, shift = fold_bn(gamma, beta, mean, var, bias)
        ours = fused_conv_bn_gelu_pool(x, w, scale, shift, pad, pool)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


class TestFusedFusionHead:
    def test_parity_vs_memhacl_modules(self, rng):
        import flax.linen as nn

        from multimodal_sentiment_aanalysis_tpu.kernels import (
            fused_mha_fusion_head,
        )
        from multimodal_sentiment_aanalysis_tpu.models import (
            MEMHACLClassifier,
        )
        from multimodal_sentiment_aanalysis_tpu.models.layers import (
            MultiheadAttention,
        )

        f, heads, b = 64, 8, 37  # 37 exercises batch padding
        xe = jnp.asarray(rng.normal(size=(b, f)).astype(np.float32))
        xy = jnp.asarray(rng.normal(size=(b, f)).astype(np.float32))
        xp = jnp.asarray(rng.normal(size=(b, f)).astype(np.float32))

        mha = MultiheadAttention(f, heads)
        feats = jnp.stack([xe, xy, xp], axis=1)
        mha_vars = mha.init(jax.random.key(0), feats, feats, feats)
        clf = MEMHACLClassifier(in_dim=f, hidden_dim=32)
        h_ref = mha.apply(mha_vars, feats, feats, feats).mean(axis=1)
        clf_vars = clf.init(jax.random.key(1), h_ref)
        ref_a, ref_v = clf.apply(clf_vars, h_ref)

        out_a, out_v = fused_mha_fusion_head(
            xe, xy, xp, mha_vars["params"], clf_vars["params"],
            num_heads=heads, block_b=16,
        )
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                                   rtol=1e-4, atol=1e-5)


class TestFusedBiLSTM:
    """A/B parity: fused Pallas BiLSTM recurrence vs ops.rnn.bilstm_layer
    (interpret mode on CPU; hardware timings in kernels/lstm.py docstring)."""

    def _params(self, rng, i_dim, hidden):
        mk = lambda s: jnp.asarray((0.3 * rng.normal(size=s)).astype(np.float32))
        return tuple(
            mk(s) for s in
            [(4 * hidden, i_dim), (4 * hidden, hidden), (4 * hidden,), (4 * hidden,)]
        )

    @pytest.mark.parametrize("use_xproj", [False, True])
    def test_forward_parity(self, rng, use_xproj):
        from multimodal_sentiment_aanalysis_tpu.kernels.lstm import (
            fused_bilstm_layer,
        )
        from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_layer

        B, T, I, H = 8, 7, 12, 128
        fwd, bwd = self._params(rng, I, H), self._params(rng, I, H)
        x = jnp.asarray(rng.normal(size=(B, T, I)).astype(np.float32))
        ref = bilstm_layer(x, fwd, bwd)
        got = fused_bilstm_layer(x, fwd, bwd, interpret=True,
                                 use_xproj=use_xproj)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("use_xproj", [False, True])
    def test_gradient_parity(self, rng, use_xproj):
        from multimodal_sentiment_aanalysis_tpu.kernels.lstm import (
            fused_bilstm_layer,
        )
        from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_layer

        B, T, I, H = 8, 5, 12, 128
        fwd, bwd = self._params(rng, I, H), self._params(rng, I, H)
        x = jnp.asarray(rng.normal(size=(B, T, I)).astype(np.float32))

        def loss(f, x, fw, bw):
            return jnp.sum(jnp.sin(f(x, fw, bw)))

        gr = jax.grad(loss, argnums=(1, 2, 3))(bilstm_layer, x, fwd, bwd)
        gk = jax.grad(loss, argnums=(1, 2, 3))(
            lambda a, b, c: fused_bilstm_layer(
                a, b, c, interpret=True, use_xproj=use_xproj),
            x, fwd, bwd,
        )
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gk)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)

    @pytest.mark.parametrize("use_xproj", [False, True])
    def test_vmap_grad_parity_per_model_weights(self, rng, use_xproj):
        """The vectorized-LOSO pattern: vmap over models batches weights AND
        activations; the kernel's pallas batching must produce per-model
        grads equal to the scan path's."""
        from multimodal_sentiment_aanalysis_tpu.kernels.lstm import (
            fused_bilstm_layer,
        )
        from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_layer

        S, B, T, I, H = 3, 8, 5, 12, 128
        fwd, bwd = self._params(rng, I, H), self._params(rng, I, H)
        fwds = tuple(jnp.stack([p + 0.01 * k for k in range(S)]) for p in fwd)
        bwds = tuple(jnp.stack([p + 0.01 * k for k in range(S)]) for p in bwd)
        xs = jnp.asarray(rng.normal(size=(S, B, T, I)).astype(np.float32))

        def total(f, fw, bw):
            return jnp.sum(jax.vmap(lambda a, b, c: jnp.sum(jnp.sin(f(a, b, c))))(xs, fw, bw))

        gr = jax.grad(total, argnums=(1, 2))(bilstm_layer, fwds, bwds)
        gk = jax.grad(total, argnums=(1, 2))(
            lambda a, b, c: fused_bilstm_layer(
                a, b, c, interpret=True, use_xproj=use_xproj),
            fwds, bwds,
        )
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gk)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)

    def test_gradient_parity_bwd_split_variant(self, rng):
        """The v6 split backward (dxp + XLA reductions) must match the v7
        in-kernel-reductions default (kernels/lstm.py MSA_LSTM_BWDC)."""
        from multimodal_sentiment_aanalysis_tpu.kernels import lstm

        B, T, I, H = 8, 5, 12, 128
        fwd, bwd = self._params(rng, I, H), self._params(rng, I, H)
        x = jnp.asarray(rng.normal(size=(B, T, I)).astype(np.float32))

        def grads():
            def loss(x, fw, bw):
                return jnp.sum(jnp.sin(lstm.fused_bilstm_layer(
                    x, fw, bw, interpret=True, use_xproj=True)))
            return jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)

        g_c = grads()
        old = lstm.enable_bwdc(False)
        try:
            g_split = grads()
        finally:
            lstm.enable_bwdc(old)
        for a, b in zip(jax.tree.leaves(g_split), jax.tree.leaves(g_c)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5)

    def test_gradient_parity_batch_blocked_bwd(self, rng):
        """The v8 backward with the batch axis blocked in the grid (NB=2)
        must match the jnp path exactly like the single-block form — this
        is the path fp32 B=256 takes instead of the old VMEM cliff."""
        from multimodal_sentiment_aanalysis_tpu.kernels import lstm
        from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_layer

        B, T, I, H = 8, 5, 12, 128
        fwd, bwd = self._params(rng, I, H), self._params(rng, I, H)
        x = jnp.asarray(rng.normal(size=(B, T, I)).astype(np.float32))

        def loss(f, x, fw, bw):
            return jnp.sum(jnp.sin(f(x, fw, bw)))

        gr = jax.grad(loss, argnums=(1, 2, 3))(bilstm_layer, x, fwd, bwd)
        old = lstm._FORCE_BLOCK_B
        lstm._FORCE_BLOCK_B = 4  # B=8 -> two batch blocks
        try:
            gk = jax.grad(loss, argnums=(1, 2, 3))(
                lambda a, b, c: lstm.fused_bilstm_layer(
                    a, b, c, interpret=True, use_xproj=True),
                x, fwd, bwd,
            )
        finally:
            lstm._FORCE_BLOCK_B = old
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gk)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4)

    @pytest.mark.parametrize("t_len", [5, 8])  # partial and exact segments
    def test_gradient_parity_segbwd_variant(self, rng, t_len):
        """The v9 segmented merged backward (boundary-checkpointed c,
        K-row segments — the default) must match the v8 two-kernel
        backward bit-tightly; T=5 exercises the partial last segment of
        K=4, T=8 the exactly-divisible case (kernels/lstm.py
        MSA_LSTM_SEGBWD)."""
        from multimodal_sentiment_aanalysis_tpu.kernels import lstm

        B, I, H = 8, 12, 128
        fwd, bwd = self._params(rng, I, H), self._params(rng, I, H)
        x = jnp.asarray(rng.normal(size=(B, t_len, I)).astype(np.float32))

        def grads():
            def loss(x, fw, bw):
                return jnp.sum(jnp.sin(lstm.fused_bilstm_layer(
                    x, fw, bw, interpret=True, use_xproj=True)))
            return jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)

        g_v9 = grads()
        old = lstm.enable_segbwd(False)
        try:
            g_v8 = grads()
        finally:
            lstm.enable_segbwd(old)
        for a, b in zip(jax.tree.leaves(g_v8), jax.tree.leaves(g_v9)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5)

    @pytest.mark.parametrize("t_len", [5, 8, 9])  # partial/exact KC blocks
    def test_gradient_parity_cbndk_variant(self, rng, t_len):
        """The opt-in time-blocked boundary sweep (MSA_LSTM_CBNDK>0 — a
        measured e2e negative, kept for reference; kernels/lstm.py
        ``_CBND_K``) must produce identical gradients to the default
        per-step sweep. T=5/9 exercise partial last blocks of KC=4, T=8
        the exactly-divisible case."""
        from multimodal_sentiment_aanalysis_tpu.kernels import lstm

        B, I, H = 8, 12, 128
        fwd, bwd = self._params(rng, I, H), self._params(rng, I, H)
        x = jnp.asarray(rng.normal(size=(B, t_len, I)).astype(np.float32))

        def grads():
            def loss(x, fw, bw):
                return jnp.sum(jnp.sin(lstm.fused_bilstm_layer(
                    x, fw, bw, interpret=True, use_xproj=True)))
            return jax.grad(loss, argnums=(0, 1, 2))(x, fwd, bwd)

        g_ref = grads()
        old = lstm._CBND_K
        lstm._CBND_K = 4
        try:
            g_blk = grads()
        finally:
            lstm._CBND_K = old
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_blk)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5)

    def test_dispatch_gate(self):
        from multimodal_sentiment_aanalysis_tpu.kernels.lstm import (
            supported_shape,
        )

        assert supported_shape(64, 128)
        assert not supported_shape(63, 128)  # sublane misaligned
        assert not supported_shape(64, 96)   # lane misaligned


class TestFusedTrainStem:
    """Train-mode fused stem stage (kernels/conv_stem_train.py)."""

    def _setup(self):
        rng = np.random.default_rng(0)
        B, T, C = 16, 585, 64
        conv = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        gamma = jnp.asarray(
            (rng.normal(size=(C,)) * 0.3 + 1).astype(np.float32))
        beta = jnp.asarray((rng.normal(size=(C,)) * 0.1).astype(np.float32))
        return conv, gamma, beta

    @staticmethod
    def _jnp_ref(conv, gamma, beta, pool=4, eps=1e-5):
        mean = conv.mean((0, 1))
        var = (conv ** 2).mean((0, 1)) - mean ** 2
        y = (conv - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
        a = 0.5 * y * (1 + jax.lax.erf(y / np.sqrt(2.0)))
        b, t, c = conv.shape
        t_out = t // pool
        return a[:, : t_out * pool].reshape(b, t_out, pool, c).max(2)

    def test_fwd_bwd_parity_nodrop(self):
        """p=0 interpret-mode parity: values and all three gradients."""
        from multimodal_sentiment_aanalysis_tpu.kernels import (
            conv_stem_train as cst,
        )

        conv, gamma, beta = self._setup()
        seeds = jnp.zeros((8, 128), jnp.int32)

        def fused(conv, gamma, beta):
            mean = conv.mean((0, 1))
            var = (conv ** 2).mean((0, 1)) - mean ** 2
            return cst.fused_stage_train(
                conv, gamma, beta, jax.lax.stop_gradient(mean),
                jax.lax.stop_gradient(var), seeds, 0.0, 4, 1e-5, True,
            )

        o_ref = self._jnp_ref(conv, gamma, beta)
        o_fus = fused(conv, gamma, beta)
        np.testing.assert_allclose(o_fus, o_ref, atol=1e-5)

        g_ref = jax.grad(lambda *a: (self._jnp_ref(*a) ** 2).sum(),
                         argnums=(0, 1, 2))(conv, gamma, beta)
        g_fus = jax.grad(lambda *a: (fused(*a) ** 2).sum(),
                         argnums=(0, 1, 2))(conv, gamma, beta)
        for name, a, b in zip(("dconv", "dgamma", "dbeta"), g_ref, g_fus):
            rel = float(jnp.max(jnp.abs(a - b))
                        / (jnp.max(jnp.abs(a)) + 1e-9))
            assert rel < 2e-4, (name, rel)

    def test_bf16_fwd_bwd(self):
        """bf16 conv/params (mixed-precision training): the kernel body
        upcasts to fp32 internally — on real hardware a bf16 body hits an
        unlowerable packed-bf16 compare in the pool max (regression:
        bench bf16 config). Values track the fp32 reference to bf16
        resolution; cotangents come back in bf16."""
        from multimodal_sentiment_aanalysis_tpu.kernels import (
            conv_stem_train as cst,
        )

        conv, gamma, beta = self._setup()
        conv16 = conv.astype(jnp.bfloat16)
        g16, b16 = gamma.astype(jnp.bfloat16), beta.astype(jnp.bfloat16)
        seeds = jnp.zeros((8, 128), jnp.int32)

        def fused(conv, gamma, beta):
            mean = conv.astype(jnp.float32).mean((0, 1))
            var = (conv.astype(jnp.float32) ** 2).mean((0, 1)) - mean ** 2
            return cst.fused_stage_train(
                conv, gamma, beta, jax.lax.stop_gradient(mean),
                jax.lax.stop_gradient(var), seeds, 0.0, 4, 1e-5, True,
            )

        o16 = fused(conv16, g16, b16)
        o_ref = self._jnp_ref(conv, gamma, beta)
        assert o16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(o16, np.float32), np.asarray(o_ref), atol=0.05)

        g = jax.grad(lambda *a: (fused(*a).astype(jnp.float32) ** 2).sum(),
                     argnums=(0, 1, 2))(conv16, g16, b16)
        assert g[0].dtype == jnp.bfloat16
        assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)

    def test_model_stage_dispatches_and_matches(self):
        """EEGMultiScaleNet's fused stage == jnp stage with dropout off
        (interpret mode, forced dispatch)."""
        from unittest import mock

        from multimodal_sentiment_aanalysis_tpu.kernels import (
            conv_stem_train as cst,
        )
        from multimodal_sentiment_aanalysis_tpu.models.eeg import (
            EEGMultiScaleNet,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(16, 32, 64)).astype(np.float32))
        model = EEGMultiScaleNet(time_len=64, feat_dim=256, dropout=0.0)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x
        )

        def run(v):
            out, mut = model.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(2)},
            )
            return out, mut["batch_stats"]

        o_jnp, bs_jnp = run(variables)
        orig = cst.fused_stage_train

        def forced(*args):
            # force interpret mode + pretend we're on TPU
            return orig(*args[:6], args[6], args[7], 1e-5, True)

        from multimodal_sentiment_aanalysis_tpu.ops import rnn as _rnn

        old = _rnn.enable_fused_dispatch(False)  # backend mock would also
        try:                                     # flip the LSTM dispatch
            with mock.patch.object(cst, "fused_stage_train", forced), \
                    mock.patch.object(jax, "default_backend",
                                      lambda: "tpu"):
                o_fus, bs_fus = run(variables)
        finally:
            _rnn.enable_fused_dispatch(old)
        np.testing.assert_allclose(o_fus, o_jnp, atol=2e-5)
        for a, b in zip(jax.tree.leaves(bs_jnp), jax.tree.leaves(bs_fus)):
            np.testing.assert_allclose(a, b, atol=1e-6)
