"""EEG multi-scale encoder.

TPU-native rebuild of the reference EEG stem (``MultimodalModel.py:24-80``):

- temporal branch: Conv1d(32->64, k15, pad 7) + BN + GELU + Dropout(0.4) +
  MaxPool(4) -> Conv1d(64->256, k5, pad 2) + BN + GELU + Dropout + MaxPool(2)
- frequency branch: channel-mean -> Linear 585->128 -> GELU -> Linear 128->64
- 2-layer bidirectional LSTM (hidden 128/dir) over the pooled sequence,
  mean-pooled over time
- fusion: Linear(256+64 -> 256) + LayerNorm + GELU

Internals run in the TPU-natural NLC layout (batch, time, channel) so convs
hit the MXU as implicit matmuls; the public ``__call__`` accepts the
reference's (B, C, T) layout. LSTM input projections are hoisted into one
matmul over all timesteps (:mod:`..ops.rnn`), and both directions of each
BiLSTM layer share one ``lax.scan``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rnn import bilstm_layer
from .layers import gelu


def symmetric_uniform(scale: float):
    """U(-scale, scale) initializer (torch nn.LSTM default is U(±1/sqrt(H)))."""
    import jax

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def conv1d(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, padding: int):
    """Functional Conv1d, torch kernel layout (O, I, K), NLC activation."""
    import jax.lax as lax

    out = lax.conv_general_dilated(
        x,
        jnp.transpose(weight, (2, 1, 0)),  # (K, I, O)
        window_strides=(1,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + bias


def max_pool1d(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """torch MaxPool1d(window): stride = window, floor division of length."""
    b, t, c = x.shape
    t_out = t // window
    x = x[:, : t_out * window]
    return x.reshape(b, t_out, window, c).max(axis=2)


class _BNVars(nn.Module):
    """BatchNorm parameters/statistics with ``nn.BatchNorm``'s exact tree
    layout (params ``scale``/``bias``, batch_stats ``mean``/``var``), but
    normalization left to the caller — so the fused train-mode stem kernel
    (:mod:`..kernels.conv_stem_train`) can own the normalize+GELU+dropout+
    pool pass. Returns ``(scale, bias, mean, var)``; in train mode the
    returned stats are the batch stats (flax formula: ``E[x^2]-E[x]^2``)
    and the running stats are updated with the same ``momentum`` decay
    ``nn.BatchNorm`` uses."""

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda *_: jnp.zeros((c,)), None
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda *_: jnp.ones((c,)), None
        )
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            mean2 = jnp.mean(jnp.square(x), axis=axes)
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return scale, bias, mean, var


class EEGMultiScaleNet(nn.Module):
    """Multi-scale conv + frequency branch + BiLSTM EEG encoder.

    Feature parity with reference ``EEGMultiScaleNet`` (MultimodalModel.py:24-80).
    Input (B, 32, 585) -> output (B, 256).
    """

    in_channels: int = 32
    time_len: int = 585
    feat_dim: int = 256
    dropout: float = 0.4

    def _stage(self, h, weight, bias, padding, pool, bn_name, train):
        """conv -> BN -> GELU -> dropout -> pool; on TPU the post-conv
        tail runs as ONE fused Pallas pass
        (:func:`..kernels.conv_stem_train.fused_stage_train`) — in train
        mode with batch stats + in-kernel dropout PRNG, in eval mode with
        the running stats and p=0."""
        import jax

        from ..kernels import conv_stem_train as cst

        h = conv1d(h, weight, bias, padding=padding)
        scale, bn_bias, mean, var = _BNVars(name=bn_name)(h, train)
        p = self.dropout if train else 0.0
        # eval mode dispatches the same fused kernel with p=0 and the
        # running stats (measured: the jnp eval stem made fwd-eval SLOWER
        # than the fused train fwd — 18.8 vs 14.7 ms/step, profile_step
        # 2026-08-18); the serving path keeps its own folded-BN kernel
        use_fused = (
            not self.is_initializing()
            and cst.dispatch_enabled()
            and jax.default_backend() == "tpu"
            and cst.supported_shape(h.shape[0], h.shape[-1], pool)
            # bf16 dispatch flipped per kernel version: the v1 row-major
            # kernel LOST the bf16 A/B (35.5k vs 37.1k samples/s), the v2
            # full-lane kernel WINS it (39.8k vs 37.0k, 2026-08-17,
            # scripts/ab_bf16_fused.py) — see the "bf16 history" note in
            # kernels/conv_stem_train.py; bf16_dispatch_enabled() is the
            # kill switch.
            and (h.dtype == jnp.float32 or cst.bf16_dispatch_enabled())
        )
        if use_fused:
            if p > 0.0:
                seeds = cst.make_seeds(self.make_rng("dropout"), h.shape[0])
            else:
                seeds = jnp.zeros((8, 128), jnp.int32)
            return cst.fused_stage_train(
                h, scale, bn_bias,
                jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var),
                seeds, float(p), pool,
            )
        # jnp path: exactly nn.BatchNorm's normalize + the original tail
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bn_bias
        h = gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return max_pool1d(h, pool)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        b = x.shape[0]
        xt = jnp.transpose(x, (0, 2, 1))  # (B, T, C) — TPU-natural layout

        # --- temporal conv stack -------------------------------------
        w1 = self.param(
            "conv1_weight", nn.initializers.lecun_normal(), (64, self.in_channels, 15)
        )
        b1 = self.param("conv1_bias", nn.initializers.zeros, (64,))
        h = self._stage(xt, w1, b1, padding=7, pool=4, bn_name="bn1",
                        train=train)  # (B, 146, 64)

        w2 = self.param(
            "conv2_weight", nn.initializers.lecun_normal(), (self.feat_dim, 64, 5)
        )
        b2 = self.param("conv2_bias", nn.initializers.zeros, (self.feat_dim,))
        h = self._stage(h, w2, b2, padding=2, pool=2, bn_name="bn2",
                        train=train)  # (B, 73, 256)

        # --- frequency branch ----------------------------------------
        freq = x.mean(axis=1)  # (B, 585): mean over channels
        freq = nn.Dense(128, name="freq1")(freq)
        freq = gelu(freq)
        freq = nn.Dense(64, name="freq2")(freq)

        # --- 2-layer BiLSTM ------------------------------------------
        hidden = self.feat_dim // 2
        lstm_init = symmetric_uniform(1.0 / float(hidden) ** 0.5)
        layers = []
        for layer_idx, in_dim in enumerate([self.feat_dim, 2 * hidden]):
            p = {}
            for direction in ("fwd", "bwd"):
                p[f"w_ih_{direction}"] = self.param(
                    f"lstm{layer_idx}_w_ih_{direction}", lstm_init, (4 * hidden, in_dim)
                )
                p[f"w_hh_{direction}"] = self.param(
                    f"lstm{layer_idx}_w_hh_{direction}", lstm_init, (4 * hidden, hidden)
                )
                p[f"b_ih_{direction}"] = self.param(
                    f"lstm{layer_idx}_b_ih_{direction}", lstm_init, (4 * hidden,)
                )
                p[f"b_hh_{direction}"] = self.param(
                    f"lstm{layer_idx}_b_hh_{direction}", lstm_init, (4 * hidden,)
                )
            layers.append(p)
        for p in layers:
            h = bilstm_layer(
                h,
                (p["w_ih_fwd"], p["w_hh_fwd"], p["b_ih_fwd"], p["b_hh_fwd"]),
                (p["w_ih_bwd"], p["w_hh_bwd"], p["b_ih_bwd"], p["b_hh_bwd"]),
            )
        temp_feat = h.mean(axis=1)  # (B, 256): mean-pool over time

        # --- fusion ---------------------------------------------------
        fused = jnp.concatenate([temp_feat, freq], axis=1)  # (B, 320)
        fused = nn.Dense(self.feat_dim, name="fusion_dense")(fused)
        fused = nn.LayerNorm(epsilon=1e-5, name="fusion_ln")(fused)
        return gelu(fused)
