"""Flagship fusion model: MultimodalTransformerModel.

Feature parity with reference ``MultimodalModel.py:152-322``:

- per-modality encoders: EEG multi-scale net, eye/pps transformer subnetworks
- three in-model supervised InfoNCE losses on the encoder outputs using the
  *arousal* labels only (reference ``:271-284``), each scaled by a learnable
  ``contrastive_weight`` with a learnable ``temperature`` (``:228-230``)
- two gated cross-modal attention blocks, both EEG-queried (``:287-297``)
- softmax modality-weight MLP 768 -> 64 -> 3 (``:171-176``)
- weighted concat -> fusion MLP 768 -> 256 -> 128 with BatchNorm (``:179-189``)
- arousal head 128 -> 128 -> 3; deep valence head
  128 -> 256 -> 256 -> 128 -> 64 -> 3 (``:192-225``)

Returns ``(arousal, valence)`` when ``labels is None`` (eval path used by the
Tester) or ``(arousal, valence, c_eeg, c_eye, c_pps)`` in training.

TPU notes: the whole forward is one jit-traceable function; BatchNorm uses
flax ``batch_stats`` (torch momentum 0.1 -> flax 0.9); the contrastive
``labels`` flag is a *trace-time* Python condition, so the eval graph never
materializes the B x B similarity matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.losses import supervised_infonce_multi
from .cross_modal import CrossModalTransformer
from .eeg import EEGMultiScaleNet
from .layers import gelu
from .subnetwork import Subnetwork


class _BNTrunk(nn.Module):
    """Stack of Linear -> BN -> GELU -> Dropout blocks (no classifier)."""

    widths: tuple[int, ...]
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, name=f"dense_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
            )(x)
            x = gelu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class _BNHead(nn.Module):
    """_BNTrunk ending in a linear classifier."""

    widths: tuple[int, ...]
    num_classes: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = _BNTrunk(self.widths, self.dropout, name="trunk")(x, train=train)
        return nn.Dense(self.num_classes, name="out")(x)


class MultimodalTransformerModel(nn.Module):
    num_classes: int = 3
    temperature: float = 0.01
    eeg_channels: int = 32
    eeg_time: int = 585
    eye_dim: int = 38
    pps_dim: int = 230
    feat_dim: int = 256
    # None keeps the reference's per-module rates (EEG 0.4, rest 0.3);
    # a float overrides every site (0.0 = deterministic train forward,
    # used by the backward/optimizer torch-parity test)
    dropout: float | None = None

    def setup(self):
        d_eeg = 0.4 if self.dropout is None else self.dropout
        d = 0.3 if self.dropout is None else self.dropout
        self.eeg_net = EEGMultiScaleNet(
            in_channels=self.eeg_channels,
            time_len=self.eeg_time,
            feat_dim=self.feat_dim,
            dropout=d_eeg,
        )
        self.eye_net = Subnetwork(self.eye_dim, self.feat_dim, dropout=d)
        self.pps_net = Subnetwork(self.pps_dim, self.feat_dim, dropout=d)
        self.cross_attn_e2p = CrossModalTransformer(self.feat_dim)
        self.cross_attn_p2e = CrossModalTransformer(self.feat_dim)

        f = self.feat_dim
        self.attn_w1 = nn.Dense(64, name="attn_w1")
        self.attn_w2 = nn.Dense(3, name="attn_w2")
        self.fusion = _BNTrunk(widths=(f, 128), dropout=d, name="fusion_stack")
        self.arousal_head = _BNHead(
            (128,), self.num_classes, dropout=d, name="arousal_head"
        )
        self.valence_head = _BNHead(
            (256, 256, 128, 64), self.num_classes, dropout=d, name="valence_head"
        )
        self.contrastive_weight = self.param(
            "contrastive_weight", nn.initializers.ones, (1,)
        )
        self.temperature_param = self.param(
            "temperature",
            lambda key, shape: jnp.full(shape, self.temperature),
            (),
        )

    def encode(self, eeg, eye, pps, *, train: bool = False):
        """Per-modality embeddings (B, feat_dim) each."""
        return (
            self.eeg_net(eeg, train=train),
            self.eye_net(eye, train=train),
            self.pps_net(pps, train=train),
        )

    def __call__(self, eeg, eye, pps, labels=None, *, train: bool = False):
        eeg_feat, eye_feat, pps_feat = self.encode(eeg, eye, pps, train=train)

        outputs_contrastive = None
        if labels is not None:
            arousal_labels = labels[0]
            mask = labels[2] if len(labels) > 2 else None
            # the three per-modality losses share labels/mask/temperature:
            # one stacked call = ONE kernel launch for all losses x all
            # vmapped models (vs 3 launches serialized to S grid steps
            # each under the vectorized-LOSO vmap)
            feats = jnp.stack([eeg_feat, eye_feat, pps_feat])
            c = supervised_infonce_multi(
                feats, feats, arousal_labels, self.temperature_param, mask
            )
            cw = self.contrastive_weight[0]
            outputs_contrastive = (cw * c[0], cw * c[1], cw * c[2])

        eye_enhanced = self.cross_attn_e2p(eeg_feat, eye_feat, eye_feat)
        pps_enhanced = self.cross_attn_p2e(eeg_feat, pps_feat, pps_feat)

        concat = jnp.concatenate([eeg_feat, eye_feat, pps_feat], axis=1)
        weights = nn.softmax(self.attn_w2(gelu(self.attn_w1(concat))), axis=1)
        fused = jnp.concatenate(
            [
                eeg_feat * weights[:, 0:1],
                eye_enhanced * weights[:, 1:2],
                pps_enhanced * weights[:, 2:3],
            ],
            axis=1,
        )
        fused = self.fusion(fused, train=train)

        arousal = self.arousal_head(fused, train=train)
        valence = self.valence_head(fused, train=train)

        if outputs_contrastive is None:
            return arousal, valence
        return (arousal, valence) + outputs_contrastive
