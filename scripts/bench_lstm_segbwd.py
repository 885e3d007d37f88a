"""Hardware A/B (TPU): v8 (full-c_seq rebuild + per-step reverse sweep)
vs v9 (boundary-checkpointed c + K-segment merged reverse sweep) for the
fused BiLSTM backward — 2-layer stack, vmapped over S=24 per-model
weights, forward+backward, fp32 and bf16 (rebuilds
``MultimodalModel.py:49-55``'s recurrence gradients).

What v9 changes (kernels/lstm.py "v9" section): the backward's c rebuild
writes only ceil(T/K) boundary checkpoints instead of the full
(S,T,B,2H) float32 c_seq (~114 MB/layer written + ~2x streamed back),
and the reverse sweep processes K actual-time rows per grid step — c is
rebuilt in registers inside the segment and the gate/dx/dW dots batch
over K*Bb rows. The forward path is identical in both configs, so the
f+b delta is pure backward.

Chaining: first weight leaf salted per scan iteration by isnan(loss)
(defeats hoisting and the tunnel's memoization); every timing boundary
host-transfers a scalar (utils/timing.host_sync).

Usage: python scripts/bench_lstm_segbwd.py
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


def make_params(rng, dtype):
    def layer(i_dim):
        mk = lambda s: jnp.asarray(
            (0.05 * rng.normal(size=(S,) + s)).astype(np.float32)).astype(dtype)
        return tuple(
            mk(s) for s in [(4 * H, i_dim), (4 * H, H), (4 * H,), (4 * H,)])
    return (layer(I), layer(I), layer(2 * H), layer(2 * H))


def build(segbwd: bool):
    """Build the chained f+bwd runner with the given backward flavor.
    The flag is read when the VJP TRACES (first call of the jitted fn),
    so every entry point toggles it for the duration of the call."""

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

    def flagged(fn):
        def wrapped(*args):
            old = kl.enable_segbwd(segbwd)
            try:
                return fn(*args)
            finally:
                kl.enable_segbwd(old)
        return wrapped

    return flagged(_run), flagged(vg)


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
    print("device:", dev.platform, dev.device_kind,
          "K =", kl._SEG_K, flush=True)
    rng = np.random.default_rng(0)
    x32 = jnp.asarray((0.5 * rng.normal(size=(S, B, T, I))).astype(np.float32))
    p32 = make_params(np.random.default_rng(1), jnp.float32)

    run8, g8 = build(False)
    run9, g9 = build(True)

    # hardware grad parity v8-vs-v9 (fp32; fp32 c rebuild is bit-exact in
    # both, so only dot-order drift separates them)
    (l8, gs8) = g8(x32, *p32)
    (l9, gs9) = g9(x32, *p32)
    rel = max(
        float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(a))) + 1e-9)
        for a, b in zip(jax.tree.leaves(gs8), jax.tree.leaves(gs9)))
    print(f"grad v8-vs-v9 rel err (fp32): {rel:.2e}", flush=True)

    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        x = x32.astype(dt)
        p = jax.tree.map(lambda a: a.astype(dt), p32)
        t8 = timed(run8, (x,) + p)
        t9 = timed(run9, (x,) + p)
        print(f"{dt_name:>9} f+b: v8 {t8:7.3f} ms  v9 {t9:7.3f} ms  "
              f"({t8 / t9:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
