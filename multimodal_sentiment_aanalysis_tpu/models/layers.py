"""Shared neural layers with PyTorch-parity numerics.

These flax.linen modules reproduce the exact math of the torch layers the
reference composes (sin/cos positional encoding ``MultimodalModel.py:8-20``,
``nn.MultiheadAttention``, post-norm ``nn.TransformerEncoderLayer``), with
parameter layouts chosen so torch state_dicts map 1:1 for parity tests.

GELU is the exact erf form everywhere (torch default), not tanh-approximate.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf-GELU (torch nn.GELU default)."""
    return jax.nn.gelu(x, approximate=False)


def make_sincos_pe(d_model: int, max_len: int) -> jnp.ndarray:
    """Standard sin/cos positional table (reference MultimodalModel.py:8-17)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class PositionalEncoding(nn.Module):
    """Additive sin/cos PE buffer (reference MultimodalModel.py:8-20)."""

    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pe = make_sincos_pe(self.d_model, self.max_len)
        return x + pe[None, : x.shape[1]]


class MultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` numerics (batch_first).

    Packed QKV projection (rows [0:E] = W_q etc., matching
    ``in_proj_weight``) followed by an output projection. Scaled dot-product
    attention over heads; no attention dropout by default (torch default
    dropout=0 in the reference's usages).
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray
    ) -> jnp.ndarray:
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        in_proj_w = self.param(
            "in_proj_weight",
            nn.initializers.xavier_uniform(),
            (3 * e, e),
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        out_w = self.param(
            "out_proj_weight", nn.initializers.xavier_uniform(), (e, e)
        )
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (e,))

        q = query @ in_proj_w[:e].T + in_proj_b[:e]
        k = key @ in_proj_w[e : 2 * e].T + in_proj_b[e : 2 * e]
        v = value @ in_proj_w[2 * e :].T + in_proj_b[2 * e :]

        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, h, hd).transpose(0, 2, 1, 3)

        # blockwise flash attention on TPU for non-trivial sequence lengths;
        # jnp reference numerics otherwise (kernels/attention.py dispatch)
        from ..kernels.attention import flash_mha

        out = flash_mha(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, e)
        return out @ out_w.T + out_b


class TransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` numerics: post-norm, ReLU FF.

    Reference ``Subnetwork`` uses the torch defaults (norm_first=False,
    activation=relu) with dropout 0.3 (``MultimodalModel.py:89-95``).
    Structure: x -> MHA -> dropout -> +x -> LN1 -> FF(l1,relu,drop,l2) ->
    dropout -> +residual -> LN2.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        attn = MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
            x, x, x
        )
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (torch ``nn.TransformerEncoder``)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                name=f"layers_{i}",
            )(x, train=train)
        return x


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1, eps 1e-5).

    Thin wrapper pinning flax's momentum convention (flax momentum = 1 - torch
    momentum) so every use site reads like the reference.
    """

    use_running_average: bool
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=self.epsilon,
            name="bn",
        )(x)
