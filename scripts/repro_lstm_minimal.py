"""Minimal repro hunt for the fused-BiLSTM device fault.

The full-model repro (``profile_step.py --only=no-update``) faults when the
forward kernel's c_seq residual is consumed by the backward while the
gradients are consumed WITHOUT a global join point (clip/optimizer).
This strips the composition to just the BiLSTM stack inside a chained
scan to find the smallest faulting program.

Variants (run each in a fresh process):
  leaf   : grads consumed per-leaf (p + 1e-12*g)        — mirrors no-update
  sync   : grads consumed via one global scalar          — mirrors the
           join point clip_by_global_norm introduces
  fwd    : forward only (control)

Flags: --layers N (default 2), --novmap (drop the S axis).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sentiment_aanalysis_tpu.ops.rnn import bilstm_layer

S, B, T, I, H = 24, 64, 73, 256, 128
N_CHAIN = 30


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "leaf"
    layers = 2
    for a in sys.argv:
        if a.startswith("--layers="):
            layers = int(a.split("=")[1])
    vmapped = "--novmap" not in sys.argv
    print(f"mode={mode} layers={layers} vmapped={vmapped}", flush=True)

    rng = np.random.default_rng(0)
    mk = lambda *sh: jnp.asarray(rng.normal(size=sh).astype(np.float32) * 0.05)

    def layer_params(in_dim):
        return {
            "fwd": (mk(4 * H, in_dim), mk(4 * H, H), mk(4 * H), mk(4 * H)),
            "bwd": (mk(4 * H, in_dim), mk(4 * H, H), mk(4 * H), mk(4 * H)),
        }

    def stack_params():
        return [layer_params(I if k == 0 else 2 * H) for k in range(layers)]

    params = ([jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape),
                            stack_params())][0]
              if vmapped else stack_params())
    x = mk(*((S, B, T, I) if vmapped else (B, T, I)))

    def fwd_stack(params, x):
        out = x
        for p in params:
            out = bilstm_layer(out, p["fwd"], p["bwd"])
        return (out.astype(jnp.float32) ** 2).sum()

    def one(params, x):
        if mode == "fwd":
            loss = fwd_stack(params, x)
            return jax.tree.map(lambda p: p + 1e-12 * loss, params)
        loss, grads = jax.value_and_grad(fwd_stack)(params, x)
        if mode == "sync":
            s = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
            return jax.tree.map(lambda p: p + 1e-12 * s, params)
        return jax.tree.map(lambda p, g: p + 1e-12 * g, params, grads)

    step = jax.vmap(one) if vmapped else one

    @jax.jit
    def chained(params, x):
        def body(params, _):
            return step(params, x), None

        return jax.lax.scan(body, params, None, length=N_CHAIN)[0]

    t0 = time.perf_counter()
    out = chained(params, x)
    jax.block_until_ready(out)
    print(f"compile+run1: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = chained(out, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_CHAIN * 1e3
    print(f"RAN CLEAN: {dt:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
