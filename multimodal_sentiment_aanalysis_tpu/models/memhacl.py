"""ME-MHACL model family.

Feature parity with the self-contained prototype in reference
``ME-MHACL/model.py:7-119``:

- conv EEG encoder: 2x (Conv1d k3 + BN + ReLU) -> global average pool ->
  Linear to feat_dim (``:15-23``)
- eye/physio encoders treat the feature vector as a 1-channel sequence:
  stacked Conv1d k3 + BN + ReLU -> GAP -> Linear (``:25-45``)
- MHA(8 heads) fusion over the modality axis, **mean** over modalities
  (``:47-74``; contrast with the max-pool of the SimCLR suite)
- binary (2-class) arousal/valence classifier (``:100-119``)

The ProjectionHead is identical to the SimCLR one and re-exported from there.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .eeg import conv1d
from .layers import MultiheadAttention
from .simclr import ProjectionHead  # noqa: F401  (same module in reference)


class _ConvStack(nn.Module):
    """Stack of Conv1d(k3, pad 1) + BN + ReLU over NLC input, then GAP+Linear."""

    channels: tuple[int, ...]
    feat_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # x: (B, T, C_in)
        for i, ch in enumerate(self.channels):
            w = self.param(
                f"conv{i}_weight",
                nn.initializers.lecun_normal(),
                (ch, x.shape[-1], 3),
            )
            b = self.param(f"conv{i}_bias", nn.initializers.zeros, (ch,))
            x = conv1d(x, w, b, padding=1)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        x = x.mean(axis=1)  # global average pool over time
        return nn.Dense(self.feat_dim, name="proj")(x)


class MEMHACLEncoder(nn.Module):
    """Conv encoders + MHA fusion with mean pooling (reference :7-74)."""

    feat_dim: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(
        self, eeg: jnp.ndarray, eye: jnp.ndarray, phy: jnp.ndarray,
        *, train: bool = False,
    ) -> jnp.ndarray:
        # eeg (B, 32, 585) -> NLC; eye (B, 38)/(B, 1, 38) -> (B, 38, 1)
        x_eeg = _ConvStack((64, 128), self.feat_dim, name="eeg_encoder")(
            jnp.transpose(eeg, (0, 2, 1)), train=train
        )
        if eye.ndim == 2:
            eye = eye[:, None, :]
        x_eye = _ConvStack((16, 32), self.feat_dim, name="eye_encoder")(
            jnp.transpose(eye, (0, 2, 1)), train=train
        )
        if phy.ndim == 2:
            phy = phy[:, None, :]
        x_phy = _ConvStack((16, 32, 64), self.feat_dim, name="phy_encoder")(
            jnp.transpose(phy, (0, 2, 1)), train=train
        )

        feats = jnp.stack([x_eeg, x_eye, x_phy], axis=1)  # (B, 3, F)
        attn_out = MultiheadAttention(
            self.feat_dim, self.num_heads, name="multihead_attn"
        )(feats, feats, feats)
        return attn_out.mean(axis=1)  # mean over modalities


class MEMHACLClassifier(nn.Module):
    """Binary arousal/valence heads (reference :100-119)."""

    in_dim: int = 256
    hidden_dim: int = 128
    num_classes: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Dense(self.hidden_dim, name="shared")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return (
            nn.Dense(self.num_classes, name="fc_arousal")(h),
            nn.Dense(self.num_classes, name="fc_valence")(h),
        )
