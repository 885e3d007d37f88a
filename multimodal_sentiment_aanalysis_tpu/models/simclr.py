"""SimCLR-variant encoder suite.

Feature parity with reference ``MultimodalModel.py:325-451``:

- ``EyeMLPNet`` / ``PPSMLPNet``: Linear -> ReLU -> BN -> Linear -> ReLU -> BN
  MLP encoders (``:325-354``)
- ``MultiModalEncoder``: L2-normalize the three encoder outputs, stack them as
  a length-3 sequence, self-MHA with 8 heads, **max-pool** over the modality
  axis, then Linear -> ReLU -> BN fusion MLP (``:357-406``)
- ``ProjectionHead``: 256 -> 256 -> 128 -> 128 with ReLU/BN/Dropout(0.5)
  (``:409-429``)
- ``Classifier``: shared Linear -> ReLU -> Dropout(0.5) trunk + separate
  3-way arousal/valence linear heads (``:432-451``)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .eeg import EEGMultiScaleNet
from .layers import MultiheadAttention


def _l2norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


class _ReluBNMLP(nn.Module):
    """Linear -> ReLU -> BN blocks (torch order: BN after activation here)."""

    widths: tuple[int, ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, name=f"dense_{i}")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
            )(x)
        return x


class EyeMLPNet(nn.Module):
    input_dim: int = 38
    feat_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return _ReluBNMLP((128, self.feat_dim), name="net")(x, train=train)


class PPSMLPNet(nn.Module):
    input_dim: int = 230
    feat_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return _ReluBNMLP((128, self.feat_dim), name="net")(x, train=train)


class MultiModalEncoder(nn.Module):
    """Normalize-stack-attend-maxpool fusion encoder (reference :357-406)."""

    feat_dim: int = 256
    num_heads: int = 8
    eeg_channels: int = 32
    eeg_time: int = 585
    dropout: float = 0.4  # the EEG stem's rate (reference default)

    @nn.compact
    def __call__(
        self, eeg: jnp.ndarray, eye: jnp.ndarray, pps: jnp.ndarray,
        *, train: bool = False,
    ) -> jnp.ndarray:
        eeg_feat = _l2norm(EEGMultiScaleNet(
            in_channels=self.eeg_channels, time_len=self.eeg_time,
            feat_dim=self.feat_dim, dropout=self.dropout, name="eeg_net",
        )(eeg, train=train))
        eye_feat = _l2norm(EyeMLPNet(
            feat_dim=self.feat_dim, name="eye_net")(eye, train=train))
        pps_feat = _l2norm(PPSMLPNet(
            feat_dim=self.feat_dim, name="pps_net")(pps, train=train))

        feats = jnp.stack([eeg_feat, eye_feat, pps_feat], axis=1)  # (B, 3, F)
        attn_out = MultiheadAttention(
            self.feat_dim, self.num_heads, name="multihead_attn"
        )(feats, feats, feats)
        fused = attn_out.max(axis=1)  # max-pool over modalities

        fused = nn.Dense(self.feat_dim, name="fusion_dense")(fused)
        fused = nn.relu(fused)
        fused = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="fusion_bn",
        )(fused)
        return fused


class ProjectionHead(nn.Module):
    """SimCLR-style projection MLP (reference :409-429)."""

    in_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for i, w in enumerate((self.hidden_dim, self.out_dim)):
            x = nn.Dense(w, name=f"dense_{i}")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn_{i}",
            )(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, name="out")(x)


class Classifier(nn.Module):
    """Dual-head classifier for finetuning (reference :432-451)."""

    in_dim: int = 256
    hidden_dim: int = 128
    num_classes: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Dense(self.hidden_dim, name="shared")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out_a = nn.Dense(self.num_classes, name="fc_arousal")(h)
        out_v = nn.Dense(self.num_classes, name="fc_valence")(h)
        return out_a, out_v
