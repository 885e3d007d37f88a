"""Decompose the fused train-stem BACKWARD cost on TPU.

bench_conv_vmapped.py (2026-08-17) put the XLA convs at only 6.7 ms
f+bwd (fp32, both stages, incl. the free stage-1 relayout) of the
19.3 ms fused stem f+bwd — so the Pallas recompute-backward kernels and
the XLA BN-combine own the remaining ~8-9 ms of the backward. This
times, per stage at the production shape (S=24, B=64):

- fwd-kernel   : the production fused fwd pass alone (no conv)
- f+b-kernel   : fwd + VJP through fused_stage_train (bwd kernel + the
                 XLA full-lane->row-major reshape + BN input-grad
                 combine), no conv
- bwd-kernel   : the raw _bwd_call alone (kernel only, no combine)

All chained-scan, fresh operands per rep, scalar-only outputs (host
transfers would swamp the measurement over the tunnel).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S = int(os.environ.get("PROF_S", 24))
B = int(os.environ.get("PROF_B", 64))
N_CHAIN = 20
P_DROP = 0.4


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


def main():
    from multimodal_sentiment_aanalysis_tpu.kernels import conv_stem_train as cst

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)

    stages = [
        ("stage1", 585, 64, 4),
        ("stage2", 146, 256, 2),
    ]
    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        for name, t, c, pool in stages:
            conv = jnp.asarray(
                rng.normal(size=(S, B, t, c)).astype(np.float32)).astype(dt)
            gamma = jnp.ones((S, c), jnp.float32)
            beta = jnp.zeros((S, c), jnp.float32)
            mean = jnp.asarray(rng.normal(size=(S, c)).astype(np.float32) * .1)
            var = jnp.asarray(
                1.0 + 0.1 * rng.random((S, c)).astype(np.float32))
            seeds = jax.vmap(
                lambda k: cst.make_seeds(k, B)
            )(jax.random.split(jax.random.key(0), S))

            vcall = jax.vmap(
                functools.partial(cst.fused_stage_train, p=P_DROP, pool=pool),
                in_axes=(0, 0, 0, 0, 0, 0),
            )

            @jax.jit
            def fwd_chain(conv, gamma, beta, mean, var, seeds):
                def body(cv, _):
                    out = vcall(cv, gamma, beta, mean, var, seeds)
                    bump = (out.astype(jnp.float32).sum() * 1e-6
                            ).astype(cv.dtype)
                    return cv + bump, None

                cf, _ = jax.lax.scan(body, conv, None, length=N_CHAIN)
                return cf.astype(jnp.float32).ravel()[0]

            def loss(cv, g, b):
                return (vcall(cv, g, b, mean, var, seeds)
                        .astype(jnp.float32) ** 2).sum() * 1e-6

            @jax.jit
            def fb_chain(conv, gamma, beta):
                def body(cv, _):
                    gx, gg, gb = jax.grad(loss, argnums=(0, 1, 2))(
                        cv, gamma, beta)
                    bump = (gx.astype(jnp.float32).sum() * 1e-3
                            ).astype(cv.dtype)
                    return cv + bump, None

                cf, _ = jax.lax.scan(body, conv, None, length=N_CHAIN)
                return cf.astype(jnp.float32).ravel()[0]

            # raw bwd kernel alone (no reshape-back / BN combine)
            inv = jax.lax.rsqrt(var + 1e-5)
            sc = gamma * inv
            sh = beta - mean * sc
            dpool = jnp.asarray(rng.normal(
                size=(S, B, t // pool, c)).astype(np.float32)).astype(dt)
            vm_fwd_raw = jax.vmap(cst._make_vm(P_DROP, pool, False)[0])
            vm_bwd = jax.vmap(cst._make_vm(P_DROP, pool, False)[1])

            @jax.jit
            def bwd_chain(conv, dpool):
                win = vm_fwd_raw(conv, sc, sh, seeds)[1]

                def body(cv, _):
                    dy, dgp, dbp = vm_bwd(cv, dpool.astype(jnp.float32),
                                          win, sc, sh, mean, inv)
                    bump = (dy.astype(jnp.float32).sum() * 1e-6
                            ).astype(cv.dtype)
                    return cv + bump, None

                cf, _ = jax.lax.scan(body, conv, None, length=N_CHAIN)
                return cf.astype(jnp.float32).ravel()[0]

            argf_f = lambda i: (conv + jnp.asarray(i * 1e-3, dt),
                                gamma, beta, mean, var, seeds)
            argf_fb = lambda i: (conv + jnp.asarray(i * 1e-3, dt),
                                 gamma, beta)
            argf_b = lambda i: (conv + jnp.asarray(i * 1e-3, dt), dpool)

            print(f"{dt_name} {name} fwd-kernel : "
                  f"{timed(fwd_chain, argf_f):7.3f} ms", flush=True)
            print(f"{dt_name} {name} f+b-kernel : "
                  f"{timed(fb_chain, argf_fb):7.3f} ms", flush=True)
            print(f"{dt_name} {name} bwd-kernel : "
                  f"{timed(bwd_chain, argf_b):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
