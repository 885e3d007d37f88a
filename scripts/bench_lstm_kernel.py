"""A/B hardware timing: fused Pallas BiLSTM recurrence vs the jnp path.

Real vmapped flagship shape (S=24 LOSO models, B=64, T=73, I=256, H=128,
2 layers), fp32 and bf16, fwd and fwd+bwd. Chained lax.scan timing (the
TPU tunnel memoizes identical executions; chaining makes each iteration's
input depend on the previous output). Results go into the
``kernels/lstm.py`` docstring table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S, B, T, I, H = 24, 64, 73, 256, 128
N_CHAIN = 30


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


def timed(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def chain(f, n=N_CHAIN):
    def g(x):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, x, None, length=n)[0]
    return jax.jit(g)


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)

    from multimodal_sentiment_aanalysis_tpu.kernels.lstm import (
        fused_bilstm_layer,
    )
    from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_layer

    rng = np.random.default_rng(0)

    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)

        def mk(shape):
            return jnp.asarray(
                (0.05 * rng.normal(size=shape)).astype(np.float32)
            ).astype(dt)

        def layer_params(i_dim):
            return {
                "fwd": tuple(mk(s) for s in
                             [(4 * H, i_dim), (4 * H, H), (4 * H,), (4 * H,)]),
                "bwd": tuple(mk(s) for s in
                             [(4 * H, i_dim), (4 * H, H), (4 * H,), (4 * H,)]),
            }

        l1 = layer_params(I)
        l2 = layer_params(2 * H)
        x = mk((S, B, T, I))

        scan_layer = lambda xb, f, b: bilstm_layer(xb, f, b, use_fused=False)
        for name, layer_fn in (("jnp", scan_layer),
                               ("fused", fused_bilstm_layer)):
            l1_f, l1_b = l1["fwd"], l1["bwd"]
            l2_f, l2_b = l2["fwd"], l2["bwd"]

            def stack(xx):
                def one(xb):
                    h = layer_fn(xb, l1_f, l1_b)
                    return layer_fn(h, l2_f, l2_b)
                return jax.vmap(one)(xx)

            t = timed(chain(stack), x)
            print(f"{dt_name} {name:5s} fwd:     {t / N_CHAIN * 1e3:7.3f} ms",
                  flush=True)

            def loss(xx):
                return jnp.sum(stack(xx).astype(jnp.float32) ** 2) * 1e-6

            def fwdbwd(xx):
                _, g = jax.value_and_grad(loss)(xx)
                return xx + jnp.asarray(1e-9, dt) * g.astype(dt)

            t = timed(chain(fwdbwd), x)
            print(f"{dt_name} {name:5s} fwd+bwd: {t / N_CHAIN * 1e3:7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
