"""bf16 component timing on TPU: where does the bf16 train step's time go?

The fp32 ablation (profile_lstm.py) showed the BiLSTM at 35% of the step
and fp32 near the MXU's effective fp32 rate. The bf16 step is only 1.33x
faster overall — far from the matmul-rate gain — so bf16 is overhead-bound
somewhere. This times bilstm_stack and the conv stem in bf16 at the real
vmapped shape (S=24, B=64) to find the gap.
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

    from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_stack

    rng = np.random.default_rng(0)

    def layer_params(key, i_dim, dt):
        ks = jax.random.split(key, 8)
        mk = lambda k, shp: (0.05 * jax.random.normal(k, shp, jnp.float32)).astype(dt)
        return {
            "w_ih_fwd": mk(ks[0], (4 * H, i_dim)),
            "w_hh_fwd": mk(ks[1], (4 * H, H)),
            "b_ih_fwd": mk(ks[2], (4 * H,)),
            "b_hh_fwd": mk(ks[3], (4 * H,)),
            "w_ih_bwd": mk(ks[4], (4 * H, i_dim)),
            "w_hh_bwd": mk(ks[5], (4 * H, H)),
            "b_ih_bwd": mk(ks[6], (4 * H,)),
            "b_hh_bwd": mk(ks[7], (4 * H,)),
        }

    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        x = jnp.asarray(rng.normal(size=(S, B, T, I)).astype(np.float32)).astype(dt)
        keys = jax.random.split(jax.random.key(0), 2)
        layers = [layer_params(keys[0], I, dt), layer_params(keys[1], 2 * H, dt)]

        stack = lambda xx: jax.vmap(lambda xb: bilstm_stack(xb, layers))(xx)
        t = timed(chain(stack), x)
        print(f"bilstm_stack fwd {dt_name}: {t / N_CHAIN * 1e3:.3f} ms", flush=True)

        def loss(xx):
            return jnp.sum(stack(xx).astype(jnp.float32) ** 2) * 1e-6

        def fwdbwd(xx):
            v, g = jax.value_and_grad(loss)(xx)
            return xx + jnp.asarray(1e-9, dt) * g.astype(dt)

        t = timed(chain(fwdbwd), x)
        print(f"bilstm_stack fwd+bwd {dt_name}: {t / N_CHAIN * 1e3:.3f} ms", flush=True)

    # conv stem fwd+bwd per dtype (the other big FLOPs block)
    from multimodal_sentiment_aanalysis_tpu.models.eeg import conv1d, max_pool1d
    from multimodal_sentiment_aanalysis_tpu.models.layers import gelu

    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        xe = jnp.asarray(rng.normal(size=(S * B, 585, 32)).astype(np.float32)).astype(dt)
        w1 = jnp.asarray(0.05 * rng.normal(size=(64, 32, 15)).astype(np.float32)).astype(dt)
        b1 = jnp.zeros((64,), dt)
        w2 = jnp.asarray(0.05 * rng.normal(size=(256, 64, 5)).astype(np.float32)).astype(dt)
        b2 = jnp.zeros((256,), dt)

        def stem(xx):
            h = max_pool1d(gelu(conv1d(xx, w1, b1, padding=7)), 4)
            h = max_pool1d(gelu(conv1d(h, w2, b2, padding=2)), 2)
            return h

        def loss(xx):
            return jnp.sum(stem(xx).astype(jnp.float32) ** 2) * 1e-6

        def fwdbwd(xx):
            v, g = jax.value_and_grad(loss)(xx)
            return xx + jnp.asarray(1e-9, dt) * g.astype(dt)

        def stem_chained(xx):
            # scalar feedback keeps the carry shape while forcing each
            # iteration to depend on the previous stem output
            return xx + (jnp.sum(stem(xx)).astype(dt) * jnp.asarray(1e-12, dt))

        t = timed(chain(stem_chained), xe)
        print(f"conv stem fwd {dt_name}: {t / N_CHAIN * 1e3:.3f} ms", flush=True)
        t = timed(chain(fwdbwd), xe)
        print(f"conv stem fwd+bwd {dt_name}: {t / N_CHAIN * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
