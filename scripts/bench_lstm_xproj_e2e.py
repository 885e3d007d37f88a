"""Hardware A/B (TPU): v5 (XLA proj + xp-streaming kernel) vs v6
(in-kernel input projection) for the FULL fused BiLSTM stack — 2 layers,
vmapped over S=24 per-model weights, forward AND forward+backward, fp32
and bf16.

The single-layer forward prototype (bench_lstm_inkernel_proj.py,
2026-08-17) measured 2.920 -> 1.745 ms (1.67x). This script measures the
production composition the dispatch actually serves: the 2-layer stack
under ``vmap`` with per-model weights, with gradients to weights and
input (as the train step consumes them).

Chaining: the first weight leaf is salted per scan iteration by
isnan(loss) (data-dependent, defeats hoisting and the tunnel's
memoization); every timing boundary host-transfers a scalar.

RESULT (v5e, 2026-08-17, ms per chained iteration, N=30, 2-layer stack
with grads to x and all weights):

==========  =========  ==========  =======
config      v5 (xp)    v6 (xproj)  speedup
==========  =========  ==========  =======
fp32 fwd      4.777       2.563     1.86x
fp32 f+b     15.741      13.585     1.16x
bf16 fwd      3.155       2.160     1.46x
bf16 f+b     12.576      11.688     1.08x
==========  =========  ==========  =======

parity v5-vs-v6 (fp32, T=73): fwd 4.9e-04, grads 2.1e-03 rel
(accumulation-order drift over the 73-step recurrence; both paths pin
to the jnp scan at 2e-5 in the interpret-mode tests at short T). The
f+b win is concentrated in the forward (the xp materialization is
gone); the backward's XLA dW/dx reductions are unchanged. Integrated:
v6 is the default dispatch at lane-aligned input widths
(MSA_LSTM_XPROJ=0 reverts).

Usage: python scripts/bench_lstm_xproj_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sentiment_aanalysis_tpu.kernels.lstm import fused_bilstm_layer

S, B, T, I, H = 24, 64, 73, 256, 128
N_CHAIN = 30


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


def make_params(rng, dtype):
    def layer(i_dim):
        mk = lambda s: jnp.asarray(
            (0.05 * rng.normal(size=(S,) + s)).astype(np.float32)).astype(dtype)
        return tuple(
            mk(s) for s in [(4 * H, i_dim), (4 * H, H), (4 * H,), (4 * H,)])
    # layer 1 consumes I, layer 2 consumes 2H
    return (layer(I), layer(I), layer(2 * H), layer(2 * H))


def stack_fn(use_xproj):
    def one_model(x, p1f, p1b, p2f, p2b):
        h = fused_bilstm_layer(x, p1f, p1b, use_xproj=use_xproj)
        return fused_bilstm_layer(h, p2f, p2b, use_xproj=use_xproj)

    def fwd(x, *params):
        return jax.vmap(one_model)(x, *params)

    return fwd


def chain(fn, grad=False):
    if grad:
        def loss(x, *params):
            return jnp.sum(jnp.sin(fn(x, *params).astype(jnp.float32)))

        vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))

        @jax.jit
        def run(x, p1f, p1b, p2f, p2b):
            def body(w0, _):
                l, gs = vg(x, (w0,) + p1f[1:], p1b, p2f, p2b)
                s = l + sum(jnp.sum(g[0, 0]).astype(jnp.float32)
                            for g in jax.tree.leaves(gs))
                return w0 + jnp.isnan(s).astype(w0.dtype), s

            _, ss = jax.lax.scan(body, p1f[0], None, length=N_CHAIN)
            return ss
    else:
        @jax.jit
        def run(x, p1f, p1b, p2f, p2b):
            def body(w0, _):
                out = fn(x, (w0,) + p1f[1:], p1b, p2f, p2b)
                s = out[:, 0, 0, :].astype(jnp.float32).sum()
                return w0 + jnp.isnan(s).astype(w0.dtype), s

            _, ss = jax.lax.scan(body, p1f[0], None, length=N_CHAIN)
            return ss
    return run


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)
    x32 = jnp.asarray((0.5 * rng.normal(size=(S, B, T, I))).astype(np.float32))

    # parity first (fp32, one uncached call each)
    p32 = make_params(np.random.default_rng(1), jnp.float32)
    f5, f6 = stack_fn(False), stack_fn(True)
    o5, o6 = f5(x32, *p32), f6(x32, *p32)
    scale = float(jnp.max(jnp.abs(o5))) + 1e-9
    print(f"fwd v5-vs-v6 rel err: "
          f"{float(jnp.max(jnp.abs(o5 - o6))) / scale:.2e}", flush=True)
    lo = lambda f: (lambda x, *p: jnp.sum(jnp.sin(f(x, *p))))
    g5 = jax.grad(lo(f5), argnums=(0, 1))(x32, *p32)
    g6 = jax.grad(lo(f6), argnums=(0, 1))(x32, *p32)
    rel = max(
        float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(a))) + 1e-9)
        for a, b in zip(jax.tree.leaves(g5), jax.tree.leaves(g6)))
    print(f"grad v5-vs-v6 rel err: {rel:.2e}", flush=True)

    only_dt = os.environ.get("MSA_BENCH_DTYPE", "")  # "fp32"/"bf16" filter
    for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        if only_dt and tag != only_dt:
            continue
        x = x32.astype(dtype)
        params = make_params(np.random.default_rng(1), dtype)
        for use_xproj, ktag in ((False, "v5 (xp)  "), (True, "v6 (xproj)")):
            fn = stack_fn(use_xproj)
            for grad, gtag in ((False, "fwd"), (True, "f+b")):
                ms = timed(chain(fn, grad),
                           lambda i: (x + jnp.asarray(i * 1e-6, dtype),
                                      *params))
                print(f"{tag} {gtag}  {ktag}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
