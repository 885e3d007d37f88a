"""Eye/PPS transformer subnetwork.

Feature parity with reference ``Subnetwork`` (``MultimodalModel.py:83-105``):
linear projection to feat_dim, unsqueeze to a length-1 sequence, sin/cos PE,
2-layer post-norm transformer encoder (4 heads, ff = 3*feat_dim, dropout 0.3),
final LayerNorm, squeeze back to (B, feat_dim).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import PositionalEncoding, TransformerEncoder


class Subnetwork(nn.Module):
    input_dim: int
    feat_dim: int = 256
    num_layers: int = 2
    nhead: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.feat_dim, name="proj")(x)[:, None, :]  # (B, 1, F)
        h = PositionalEncoding(self.feat_dim, max_len=100, name="pos")(h)
        h = TransformerEncoder(
            num_layers=self.num_layers,
            d_model=self.feat_dim,
            nhead=self.nhead,
            dim_feedforward=self.feat_dim * 3,
            dropout=self.dropout,
            name="transformer",
        )(h, train=train)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(h[:, 0])
