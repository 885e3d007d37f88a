"""Tune the v9 segmented backward's (K, Bb) on hardware.

Chained 2-layer f+bwd at the flagship shape for each (K, Bb) candidate
whose VMEM estimate fits the 128M scoped limit, fp32 and bf16, v8 as
baseline. Results go into kernels/lstm.py's v9 notes.

Usage: python scripts/bench_segbwd_tune.py [fp32|bf16]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sentiment_aanalysis_tpu.kernels import lstm as kl
from multimodal_sentiment_aanalysis_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)
from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync

S, B, T, I, H = 24, 64, 73, 256, 128
N_CHAIN = 30

CANDIDATES = {
    "float32": [(4, 16), (4, 32), (2, 64), (8, 16)],
    "bfloat16": [(4, 32), (4, 64), (8, 32), (2, 64)],
}


def make_params(rng, dtype):
    def layer(i_dim):
        mk = lambda s: jnp.asarray(
            (0.05 * rng.normal(size=(S,) + s)).astype(np.float32)).astype(dtype)
        return tuple(
            mk(s) for s in [(4 * H, i_dim), (4 * H, H), (4 * H,), (4 * H,)])
    return (layer(I), layer(I), layer(2 * H), layer(2 * H))


def build(segbwd, seg_k=None, force_bb=None):
    def one_model(x, p1f, p1b, p2f, p2b):
        h = kl.fused_bilstm_layer(x, p1f, p1b)
        return kl.fused_bilstm_layer(h, p2f, p2b)

    def loss(x, *params):
        return jnp.sum(jnp.sin(
            jax.vmap(one_model)(x, *params).astype(jnp.float32)))

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def _run(x, p1f, p1b, p2f, p2b):
        def body(w0, _):
            l, gs = vg(x, (w0,) + p1f[1:], p1b, p2f, p2b)
            s = l + sum(jnp.sum(g[0, 0]).astype(jnp.float32)
                        for g in jax.tree.leaves(gs))
            return w0 + jnp.isnan(s).astype(w0.dtype), s

        _, ss = jax.lax.scan(body, p1f[0], None, length=N_CHAIN)
        return ss

    def wrapped(*args):
        old = kl.enable_segbwd(segbwd)
        old_k, old_bb = kl._SEG_K, kl._FORCE_BLOCK_B
        if seg_k is not None:
            kl._SEG_K = seg_k
        if force_bb is not None:
            kl._FORCE_BLOCK_B = force_bb
        try:
            return _run(*args)
        finally:
            kl.enable_segbwd(old)
            kl._SEG_K, kl._FORCE_BLOCK_B = old_k, old_bb
    return wrapped


def timed(fn, args, reps=3):
    _sync(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN * 1e3


def main():
    enable_compilation_cache()
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    rng = np.random.default_rng(0)
    x32 = jnp.asarray((0.5 * rng.normal(size=(S, B, T, I))).astype(np.float32))
    p32 = make_params(np.random.default_rng(1), jnp.float32)

    for dt_name in ("float32", "bfloat16"):
        if only and not dt_name.startswith(only.replace("fp", "float").replace(
                "bf", "bfloat")):
            continue
        dt = jnp.dtype(dt_name)
        x = x32.astype(dt)
        p = jax.tree.map(lambda a: a.astype(dt), p32)
        t8 = timed(build(False), (x,) + p)
        print(f"{dt_name:>9} v8 baseline: {t8:7.3f} ms", flush=True)
        for k, bb in CANDIDATES[dt_name]:
            est = kl._segbwd_vmem_est(S, bb, k, I, H, dt.itemsize) / 2**20
            if est > 130:
                print(f"{dt_name:>9} K={k} bb={bb}: skipped (est {est:.0f}M)",
                      flush=True)
                continue
            try:
                t9 = timed(build(True, k, bb), (x,) + p)
                print(f"{dt_name:>9} K={k} bb={bb}: {t9:7.3f} ms "
                      f"({t8 / t9:.2f}x vs v8, est {est:.0f}M)", flush=True)
            except Exception as e:
                print(f"{dt_name:>9} K={k} bb={bb}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
