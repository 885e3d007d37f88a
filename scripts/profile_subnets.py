"""Isolated profile of the POST-EEG-ENCODER graph (train mode, vmapped).

The step budget (CLAUDE.md) attributes the fp32 vmapped step as
stem 19.3 + LSTM 10.75 + optimizer 4.5 + InfoNCE ~2.0 of ~41.8 ms,
leaving ~5 ms for everything else. This measures that remainder
directly: the eye/pps transformer Subnetworks, both cross-modal
attention blocks, the modality-weight MLP + weighted fusion trunk, and
both classification heads (reference ``MultimodalModel.py:83-322``
minus the EEG encoder), fwd and fwd+bwd, at the real vmapped shape
(S=24 models, B=64), chained scan with host-transfer sync.

Variants:
- post fwd / post f+b : eye/pps Subnetworks + cross-modal + fusion + heads
- xmodal fwd / f+b    : cross-modal blocks + fusion + heads only
  (eeg/eye/pps features all precomputed) — the difference isolates the
  two seq-len-1 transformer Subnetworks.

RESULT (v5e, 2026-08-17, fp32, S=24 B=64):

    post   fwd : 1.584 ms   post   f+b : 3.313 ms
    xmodal fwd : 1.259 ms   xmodal f+b : 1.478 ms

So the whole post-EEG-encoder graph is ~3.3 ms f+b (the two seq-1
transformer Subnetworks ~1.8, cross-modal+fusion+heads ~1.5) — together
with stem 19.7 + LSTM 10.75 + optimizer 4.5 + InfoNCE ~2.0 this fully
attributes the ~41.8 ms fp32 step (remainder ~1.5 ms: batch gather,
global-norm clip, loss/metric tails). No kernel-worthy slice here.

Usage: python scripts/profile_subnets.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_sentiment_aanalysis_tpu.models.cross_modal import (
    CrossModalTransformer,
)
from multimodal_sentiment_aanalysis_tpu.models.fusion_model import (
    _BNHead, _BNTrunk,
)
from multimodal_sentiment_aanalysis_tpu.models.layers import gelu
from multimodal_sentiment_aanalysis_tpu.models.subnetwork import Subnetwork

S = int(os.environ.get("PROF_S", 24))
B = int(os.environ.get("PROF_B", 64))
N_CHAIN = 30
F = 256


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


def timed(fn, argf, reps=3):
    _sync(fn(*argf(0)))
    best = 1e9
    for i in range(1, reps + 1):
        a = argf(i)
        t0 = time.perf_counter()
        _sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN * 1e3


class PostEncoder(nn.Module):
    """Everything after ``encode`` in MultimodalTransformerModel, with
    optional in-module eye/pps Subnetworks (with_subnets)."""

    with_subnets: bool = True

    def setup(self):
        if self.with_subnets:
            self.eye_net = Subnetwork(38, F, dropout=0.3)
            self.pps_net = Subnetwork(230, F, dropout=0.3)
        self.cross_attn_e2p = CrossModalTransformer(F)
        self.cross_attn_p2e = CrossModalTransformer(F)
        self.attn_w1 = nn.Dense(64)
        self.attn_w2 = nn.Dense(3)
        self.fusion = _BNTrunk(widths=(F, 128), dropout=0.3)
        self.arousal_head = _BNHead((128,), 3, dropout=0.3)
        self.valence_head = _BNHead((256, 256, 128, 64), 3, dropout=0.3)

    def __call__(self, eeg_feat, eye_in, pps_in, *, train=True):
        if self.with_subnets:
            eye_feat = self.eye_net(eye_in, train=train)
            pps_feat = self.pps_net(pps_in, train=train)
        else:
            eye_feat, pps_feat = eye_in, pps_in
        eye_enh = self.cross_attn_e2p(eeg_feat, eye_feat, eye_feat)
        pps_enh = self.cross_attn_p2e(eeg_feat, pps_feat, pps_feat)
        concat = jnp.concatenate([eeg_feat, eye_feat, pps_feat], axis=1)
        w = nn.softmax(self.attn_w2(gelu(self.attn_w1(concat))), axis=1)
        fused = jnp.concatenate(
            [eeg_feat * w[:, 0:1], eye_enh * w[:, 1:2], pps_enh * w[:, 2:3]],
            axis=1)
        fused = self.fusion(fused, train=train)
        return self.arousal_head(fused, train=train), \
            self.valence_head(fused, train=train)


def build(with_subnets):
    mod = PostEncoder(with_subnets=with_subnets)
    eye_dim = 38 if with_subnets else F
    pps_dim = 230 if with_subnets else F
    r = np.random.default_rng(0)
    eegf = jnp.asarray(r.normal(size=(S, B, F)).astype(np.float32))
    eye = jnp.asarray(r.normal(size=(S, B, eye_dim)).astype(np.float32))
    pps = jnp.asarray(r.normal(size=(S, B, pps_dim)).astype(np.float32))

    def init_one(key):
        v = mod.init({"params": key, "dropout": key},
                     eegf[0, :2], eye[0, :2], pps[0, :2], train=True)
        return v["params"], v.get("batch_stats", {})

    params, bstats = jax.vmap(init_one)(
        jax.random.split(jax.random.key(0), S))

    def apply_one(p, bs, ef, ey, pp, key, train=True):
        out, mut = mod.apply(
            {"params": p, "batch_stats": bs}, ef, ey, pp, train=True,
            mutable=["batch_stats"], rngs={"dropout": key})
        a, v = out
        return (a.sum() + v.sum()), mut["batch_stats"]

    def fwd_chain(params, bstats, ef, ey, pp, k):
        def body(carry, _):
            tot, bs, kk = carry
            kk, dk = jax.random.split(kk)
            dks = jax.random.split(dk, S)
            loss, nbs = jax.vmap(apply_one, in_axes=(0, 0, 0, 0, 0, 0))(
                params, bs, ef + tot * 1e-6, ey, pp, dks)
            return (loss.sum(), nbs, kk), None

        (tot, _, _), _ = jax.lax.scan(
            body, (jnp.float32(0), bstats, k), None, length=N_CHAIN)
        return tot

    def fb_chain(params, bstats, ef, ey, pp, k):
        def body(carry, _):
            tot, bs, kk = carry
            kk, dk = jax.random.split(kk)
            dks = jax.random.split(dk, S)

            def loss_fn(p, b, e2):
                l, nbs = jax.vmap(apply_one, in_axes=(0, 0, 0, 0, 0, 0))(
                    p, b, e2, ey, pp, dks)
                return l.sum(), nbs

            (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs, ef + tot * 1e-6)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return (loss + 0.0 * gsum, nbs, kk), None

        (tot, _, _), _ = jax.lax.scan(
            body, (jnp.float32(0), bstats, k), None, length=N_CHAIN)
        return tot

    args = (params, bstats, eegf, eye, pps)
    return jax.jit(fwd_chain), jax.jit(fb_chain), args


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    for tag, with_sub in (("post", True), ("xmodal", False)):
        fwd, fb, args = build(with_sub)
        argf = lambda i: args + (jax.random.key(i),)
        print(f"{tag:6s} fwd : {timed(fwd, argf):7.3f} ms/step", flush=True)
        print(f"{tag:6s} f+b : {timed(fb, argf):7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
