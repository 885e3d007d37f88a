"""A/B conv1d formulations under the REAL trainer composition: vmap over
S=24 per-model weights (the vectorized-LOSO axis).

bench_conv_formulations.py timed the folded-batch case (one shared weight,
B*S rows) — but the production step vmaps over per-model weights, and
lax.conv's batching rule for a batched rhs lowers to a grouped conv
(feature_group_count=S) with (S,B,T,C)->(B,T,S*C) relayouts on both sides.
A batched dot_general has no such shuffle. This measures, at the real
shapes (S=24, B=64), fwd and fwd+bwd, fp32 and bf16:

- xla-conv   : vmap(lax.conv_general_dilated) — production today
- tap-matmul : K shifted (S, B*T, C) @ (S, C, O) batched dots
- tap-fl     : stage-1 only — taps emitting the FULL-LANE (B, t_out,
               pool*C) layout directly (stride-`pool` output rows as lane
               groups), replacing conv + the host relayout pass the fused
               stem kernel pays when C=64 (see kernels/conv_stem_train.py)

For tap-fl the comparison includes the relayout on the conv side (that is
what the fused-stem call actually consumes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S = 24
B = 64
N_CHAIN = 20


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


def chain(step):
    @jax.jit
    def run(x, w):
        def body(c, _):
            x, w = c
            out = step(x, w)
            bump = (jax.tree.leaves(out)[0].astype(jnp.float32).sum()
                    * 1e-6).astype(x.dtype)
            return (x + bump, w), None

        (xf, _), _ = jax.lax.scan(body, (x, w), None, length=N_CHAIN)
        return xf.astype(jnp.float32).ravel()[0]  # scalar output only

    return run


def conv_xla(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)), (1,), [(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_taps(x, w, padding):
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


def conv_taps_fl(x, w, padding, pool):
    """Taps formulation emitting (B, t_out, pool*O) full-lane directly:
    out[:, t, j*O:(j+1)*O] = conv(x)[:, pool*t + j, :]."""
    b, t, c = x.shape
    o, _, k_taps = w.shape
    t_out = t // pool
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    wt = jnp.transpose(w, (2, 1, 0))  # (K, C, O)
    groups = []
    for j in range(pool):
        acc = jnp.zeros((b, t_out, o), jnp.float32)
        for k in range(k_taps):
            sl = jax.lax.dynamic_slice_in_dim(
                xp, j + k, (t_out - 1) * pool + 1, axis=1)
            sl = sl[:, ::pool]
            acc = acc + jax.lax.dot_general(
                sl, wt[k], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        groups.append(acc)
    return jnp.concatenate(groups, axis=-1).astype(x.dtype)


def host_fl(conv, pool):
    S_, b, t, c = conv.shape
    t_out = t // pool
    return conv[:, :, : t_out * pool, :].reshape(S_, b, t_out, pool * c)


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)

    shapes = [
        ("conv1", (S, B, 585, 32), (S, 64, 32, 15), 7, 4),
        ("conv2", (S, B, 146, 64), (S, 256, 64, 5), 2, 2),
    ]
    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        for name, xs, ws, pad, pool in shapes:
            xh = rng.normal(size=xs).astype(np.float32)
            wh = (0.05 * rng.normal(size=ws)).astype(np.float32)
            x = jnp.asarray(xh).astype(dt)
            w = jnp.asarray(wh).astype(dt)

            variants = [
                ("xla-conv", jax.vmap(lambda xx, ww: conv_xla(xx, ww, pad))),
                ("tap-matmul", jax.vmap(lambda xx, ww: conv_taps(xx, ww, pad))),
            ]
            # full-lane emitters (what the fused stem actually consumes):
            # conv followed by the host relayout vs direct taps-fl
            variants.append(
                ("xla-conv+fl",
                 lambda xx, ww: host_fl(
                     jax.vmap(lambda a, b_: conv_xla(a, b_, pad))(xx, ww),
                     pool)))
            variants.append(
                ("tap-fl",
                 jax.vmap(lambda xx, ww: conv_taps_fl(xx, ww, pad, pool))))

            for vname, fn in variants:
                argf = lambda i: (x + jnp.asarray(i * 1e-3, dt), w)
                t = timed(chain(fn), argf)
                print(f"{dt_name} {name} {vname:12s} fwd:  "
                      f"{t:7.3f} ms", flush=True)

                def loss(xx, ww, fn=fn):
                    return (fn(xx, ww).astype(jnp.float32) ** 2).sum() * 1e-6

                def fwdbwd(xx, ww, loss=loss):
                    gx, gw = jax.grad(loss, argnums=(0, 1))(xx, ww)
                    return gx.astype(dt), gw.astype(dt)

                @jax.jit
                def run_fb(xx, ww, fwdbwd=fwdbwd):
                    def body(c, _):
                        xx, ww = c
                        gx, gw = fwdbwd(xx, ww)
                        bump = (gx.astype(jnp.float32).sum() * 1e-6
                                ).astype(xx.dtype)
                        return (xx + bump, ww), None

                    (xf, _), _ = jax.lax.scan(body, (xx, ww), None,
                                              length=N_CHAIN)
                    return xf.astype(jnp.float32).ravel()[0]

                t = timed(run_fb, argf)
                print(f"{dt_name} {name} {vname:12s} f+bwd:"
                      f"{t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
