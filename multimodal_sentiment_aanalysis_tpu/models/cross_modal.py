"""Gated cross-modal attention block.

Feature parity with reference ``CrossModalTransformer``
(``MultimodalModel.py:108-149``): MHA(embed 256, 4 heads) over (B, 1, E)
query/key/value, then a sigmoid gate over ``[query ‖ attn_out]`` forming the
convex combination ``g*q + (1-g)*attn``, followed by LayerNorm.

Sequence length is 1, so the attention softmax is the identity and the block
reduces to ``out_proj(v_proj(value))`` — XLA fuses the whole thing into a few
matmuls; the Pallas fused variant (kernels/fusion_head.py) fuses the pair of
cross-attention blocks + gate + weighted fusion into one kernel for serving.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import MultiheadAttention


class CrossModalTransformer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 4

    @nn.compact
    def __call__(
        self, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray
    ) -> jnp.ndarray:
        # accept (B, E) like the reference; promote to length-1 sequences
        q = query[:, None, :] if query.ndim == 2 else query
        k = key[:, None, :] if key.ndim == 2 else key
        v = value[:, None, :] if value.ndim == 2 else value

        attn_out = MultiheadAttention(
            self.embed_dim, self.num_heads, name="attn"
        )(q, k, v)[:, 0]
        q2 = q[:, 0]

        gate = nn.Dense(self.embed_dim, name="gate")(
            jnp.concatenate([q2, attn_out], axis=1)
        )
        gate = nn.sigmoid(gate)
        out = gate * q2 + (1.0 - gate) * attn_out
        return nn.LayerNorm(epsilon=1e-5, name="norm")(out)
