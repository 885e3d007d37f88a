"""A/B conv1d formulations at the training stem shapes (TPU).

.. warning:: superseded by ``bench_conv_vmapped.py``. This script predates
   two hard-won timing lessons (CLAUDE.md): its chained state update
   ``c + 1e-12*sum`` UNDERFLOWS in fp32 (identical repeat executions get
   memoized by the tunnel) and ``jax.block_until_ready`` is not a reliable
   barrier here. It also times the folded-batch SHARED-weight case, while
   the production step vmaps over per-model weights (a different XLA
   lowering for conv). Use bench_conv_vmapped.py for decisions.

The step ablation puts the conv stem at ~12 ms fwd+bwd of the 60 ms fp32
vmapped step, with XLA's conv_general_dilated at ~22% of fp32 matmul
peak. Candidates:

- xla-conv    : current ops (lax.conv_general_dilated, NWC)
- tap-matmul  : K shifted (B*T, C) @ (C, O) matmuls accumulated (jnp;
                XLA sees pure dots)
Both timed fwd and fwd+bwd at conv1 (1536,585,32)x(64,32,15) and conv2
(1536,146,64)x(256,64,5) — the real vmapped-24-model shapes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
            return c + (jnp.sum(f(c)) * 1e-12).astype(c.dtype), None
        return jax.lax.scan(body, x, None, length=n)[0]
    return jax.jit(g)


def conv_xla(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)), (1,), [(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_taps(x, w, padding):
    # w (O, C, K) torch layout; out[:, t] = sum_k xpad[:, t+k] @ w[:, :, k].T
    b, t, c = x.shape
    o, _, k_taps = w.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    wt = jnp.transpose(w, (2, 1, 0))  # (K, C, O)
    acc = jnp.zeros((b, t, o), jnp.float32)
    for k in range(k_taps):
        acc = acc + jax.lax.dot_general(
            jax.lax.dynamic_slice_in_dim(xp, k, t, axis=1), wt[k],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc.astype(x.dtype)


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)

    shapes = [
        ("conv1", (1536, 585, 32), (64, 32, 15), 7),
        ("conv2", (1536, 146, 64), (256, 64, 5), 2),
    ]
    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        for name, xs, ws, pad in shapes:
            x = jnp.asarray(rng.normal(size=xs).astype(np.float32)).astype(dt)
            w = jnp.asarray(
                (0.05 * rng.normal(size=ws)).astype(np.float32)).astype(dt)
            for vname, fn in (("xla-conv", conv_xla), ("tap-matmul", conv_taps)):
                f = lambda xx, fn=fn: fn(xx, w, pad)
                t = timed(chain(f), x)
                print(f"{dt_name} {name} {vname:10s} fwd:  "
                      f"{t / N_CHAIN * 1e3:7.3f} ms", flush=True)

                def loss(xx):
                    return jnp.sum(f(xx).astype(jnp.float32) ** 2) * 1e-6

                def fwdbwd(xx):
                    _, g = jax.value_and_grad(loss)(xx)
                    return g.astype(dt)

                t = timed(chain(fwdbwd), x)
                print(f"{dt_name} {name} {vname:10s} f+bwd:"
                      f"{t / N_CHAIN * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
