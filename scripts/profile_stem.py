"""Isolated profile of the EEG conv stem (train mode) at the vmapped shape.

The step ablations (profile_step.py) leave ~19 ms of the 51 ms fp32 step
attributed only as "train-mode BN + subnets + backward". This measures the
pieces directly, each as a chained scan at the real shape (S=24 models,
B=64), fwd and fwd+bwd:

- stem      : both conv stages exactly as EEGMultiScaleNet runs them in
              train mode (conv + BN batch-stats + GELU + dropout + pool)
- stem-nodrop : same without dropout (isolates mask generation+apply)
- stem-nobn : BN replaced by a per-channel affine (isolates batch-stat
              reductions)
- subnets   : eye/pps MLPs + cross-modal attention + weighted fusion +
              both heads (everything after the encoders) fwd+bwd
- infonce   : the three supervised-InfoNCE losses fwd+bwd

Usage: python scripts/profile_stem.py [--only=name[,name]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S = int(os.environ.get("PROF_S", 24))
B = int(os.environ.get("PROF_B", 64))
N_CHAIN = int(os.environ.get("PROF_CHAIN", 30))


from multimodal_sentiment_aanalysis_tpu.utils.timing import host_sync as _sync


def timed(fn, argf, reps=3):
    """argf(i) -> args for rep i. Each rep MUST get different input
    values (the tunnel memoizes byte-identical executions, and the
    1e-12-scaled grad consumption underflows in fp32, so a carried-state
    chain alone does NOT vary the inputs between reps), and completion is
    forced with a host transfer (see _sync)."""
    _sync(fn(*argf(0)))
    best = 1e9
    for i in range(1, reps + 1):
        a = argf(i)
        t0 = time.perf_counter()
        _sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN * 1e3


def chain(step):
    """Chained scan over N_CHAIN applications (state feeds forward so the
    tunnel cannot memoize)."""

    @jax.jit
    def run(params, x):
        def body(p, _):
            return step(p, x), None

        return jax.lax.scan(body, params, None, length=N_CHAIN)[0]

    return run


def main():
    import flax.linen as nn

    from multimodal_sentiment_aanalysis_tpu.models.eeg import (
        conv1d,
        max_pool1d,
    )
    from multimodal_sentiment_aanalysis_tpu.models.layers import gelu

    only = []
    for a in sys.argv:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)
    mk = lambda *sh: jnp.asarray(rng.normal(size=sh).astype(np.float32) * 0.1)

    # ---- stem variants ----------------------------------------------------
    class Stem(nn.Module):
        use_bn: bool = True
        use_dropout: bool = True

        @nn.compact
        def __call__(self, xt, *, train=True):
            w1 = self.param("w1", nn.initializers.lecun_normal(), (64, 32, 15))
            b1 = self.param("b1", nn.initializers.zeros, (64,))
            h = conv1d(xt, w1, b1, padding=7)
            if self.use_bn:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn1")(h)
            else:
                h = h * self.param("g1", nn.initializers.ones, (64,)) + \
                    self.param("s1", nn.initializers.zeros, (64,))
            h = gelu(h)
            if self.use_dropout:
                h = nn.Dropout(0.4, deterministic=not train)(h)
            h = max_pool1d(h, 4)
            w2 = self.param("w2", nn.initializers.lecun_normal(), (256, 64, 5))
            b2 = self.param("b2", nn.initializers.zeros, (256,))
            h = conv1d(h, w2, b2, padding=2)
            if self.use_bn:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="bn2")(h)
            else:
                h = h * self.param("g2", nn.initializers.ones, (256,)) + \
                    self.param("s2", nn.initializers.zeros, (256,))
            h = gelu(h)
            if self.use_dropout:
                h = nn.Dropout(0.4, deterministic=not train)(h)
            return max_pool1d(h, 2)

    x_stem = mk(S, B, 585, 32)

    def stem_variant(name, use_bn, use_dropout, backward):
        model = Stem(use_bn=use_bn, use_dropout=use_dropout)

        def init_one(k):
            v = model.init({"params": k, "dropout": k}, x_stem[0, :2])
            return v["params"], v.get("batch_stats", {})

        params, bstats = jax.vmap(init_one)(
            jax.random.split(jax.random.key(0), S))
        keys = jax.random.split(jax.random.key(1, impl="rbg"), S)

        def one(carry, x):
            params, bstats, key = carry
            key, dk = jax.random.split(key)

            def fwd(p, bs):
                kw = dict(train=True, mutable=["batch_stats"],
                          rngs={"dropout": dk})
                if not use_bn:
                    kw = dict(train=True, rngs={"dropout": dk})
                    out = model.apply({"params": p}, x, **kw)
                    return (out.astype(jnp.float32) ** 2).sum(), bs
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x, **kw)
                return (out.astype(jnp.float32) ** 2).sum(), \
                    mut["batch_stats"]

            if backward:
                (loss, nbs), g = jax.value_and_grad(
                    fwd, has_aux=True)(params, bstats)
                params = jax.tree.map(lambda p, gg: p + 1e-12 * gg, params, g)
            else:
                loss, nbs = fwd(params, bstats)
                params = jax.tree.map(lambda p: p + 1e-12 * loss, params)
            return (params, nbs, key), None

        step = jax.vmap(lambda c, x: one(c, x)[0])
        run = chain(lambda c, x: step(c, x))
        ms = timed(run, lambda i: ((params, bstats, keys),
                                   x_stem + i * 1e-6))
        print(f"{name:14s}: {ms:7.3f} ms/step", flush=True)

    # ---- infonce ----------------------------------------------------------
    def infonce(backward, fused=False):
        from multimodal_sentiment_aanalysis_tpu.kernels import (
            fused_supervised_infonce,
        )
        from multimodal_sentiment_aanalysis_tpu.ops.losses import (
            supervised_infonce,
        )

        loss = fused_supervised_infonce if fused else supervised_infonce
        feats = mk(S, B, 256)
        labels = jnp.asarray(rng.integers(0, 3, (S, B)).astype(np.int64))
        ones = jnp.ones((S, B), jnp.float32)

        def one(f, lab, m):
            t = jnp.asarray(0.01, jnp.float32)
            return (loss(f, f, lab, t, m)
                    + loss(f * 2, f * 2, lab, t, m)
                    + loss(f * 3, f * 3, lab, t, m))

        def step(f, lab, m):
            if backward:
                g = jax.grad(lambda ff: jax.vmap(one)(ff, lab, m).sum())(f)
                return f + 1e-12 * g
            return f + 1e-12 * jax.vmap(one)(f, lab, m).sum()

        @jax.jit
        def run(f, lab, m):
            def body(ff, _):
                return step(ff, lab, m), None

            return jax.lax.scan(body, f, None, length=N_CHAIN)[0]

        ms = timed(run, lambda i: (feats + i * 1e-6, labels, ones))
        tag = ("infonce-K" if fused else "infonce") + \
            (" f+b" if backward else " fwd")
        print(f"{tag:14s}: {ms:7.3f} ms/step", flush=True)

    # ---- conv-only / conv+stats: attribute the fused-stem forward ---------
    def conv_parts(backward, with_stats):
        """Both conv stages alone (pooling replaced by a strided slice so
        stage-2 sees the right length; a slice is ~free next to the convs)
        and optionally the BN batch-stat reductions — isolates how much of
        the fused-stem time is XLA's convs vs stats vs the Pallas pass."""
        params = {
            "w1": mk(64, 32, 15), "b1": mk(64),
            "w2": mk(256, 64, 5), "b2": mk(256),
        }
        params = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (S,) + v.shape), params)

        def net(pr, x):
            h = conv1d(x, pr["w1"], pr["b1"], padding=7)
            if with_stats:
                m1 = h.mean((0, 1))
                v1 = (h * h).mean((0, 1)) - m1 ** 2
            h = h[:, ::4]
            h = conv1d(h, pr["w2"], pr["b2"], padding=2)
            if with_stats:
                m2 = h.mean((0, 1))
                v2 = (h * h).mean((0, 1)) - m2 ** 2
            h = h[:, ::2]
            out = (h.astype(jnp.float32) ** 2).sum()
            if with_stats:
                out = out + (m1.sum() + v1.sum() + m2.sum() + v2.sum())
            return out

        def one(pr, x):
            if backward:
                g = jax.grad(net)(pr, x)
                return jax.tree.map(lambda a, b: a + 1e-12 * b, pr, g)
            return jax.tree.map(lambda a: a + 1e-12 * net(pr, x), pr)

        step = jax.vmap(one)
        run = chain(step)
        ms = timed(run, lambda i: (params, x_stem + i * 1e-6))
        tag = ("conv+stats" if with_stats else "conv-only") + \
            (" f+b" if backward else " fwd")
        print(f"{tag:14s}: {ms:7.3f} ms/step", flush=True)

    # ---- fused stem (the production fused composition) --------------------
    def stem_fused(backward, p=0.4, check_parity=False):
        from multimodal_sentiment_aanalysis_tpu.kernels import (
            conv_stem_train as cst,
        )

        interp = jax.default_backend() != "tpu"
        params = {
            "w1": mk(64, 32, 15), "b1": mk(64),
            "g1": jnp.ones((64,)), "be1": jnp.zeros((64,)),
            "w2": mk(256, 64, 5), "b2": mk(256),
            "g2": jnp.ones((256,)), "be2": jnp.zeros((256,)),
        }
        params = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (S,) + v.shape), params)
        keys = jax.random.split(jax.random.key(9, impl="rbg"), S)
        sg = jax.lax.stop_gradient

        def stage(h, w, b, g, be, pad, pool, seeds, use_fused):
            h = conv1d(h, w, b, padding=pad)
            mean = h.mean((0, 1))
            var = (h * h).mean((0, 1)) - mean ** 2
            if use_fused:
                return cst.fused_stage_train(
                    h, g, be, sg(mean), sg(var), seeds, p, pool,
                    1e-5, interp)
            # jnp reference (parity check only runs it at p=0)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * g + be
            h = gelu(h)
            return max_pool1d(h, pool)

        def run_stem(pr, x, key, use_fused):
            k1, k2 = jax.random.split(key)
            s1 = cst.make_seeds(k1, x.shape[0])
            s2 = cst.make_seeds(k2, x.shape[0])
            h = stage(x, pr["w1"], pr["b1"], pr["g1"], pr["be1"],
                      7, 4, s1, use_fused)
            h = stage(h, pr["w2"], pr["b2"], pr["g2"], pr["be2"],
                      2, 2, s2, use_fused)
            return (h.astype(jnp.float32) ** 2).sum()

        if check_parity:  # on-device fused-vs-jnp check at p=0
            v1 = jax.jit(jax.vmap(
                lambda pr, x, k: run_stem(pr, x, k, True)))(
                    params, x_stem, keys)
            v2 = jax.jit(jax.vmap(
                lambda pr, x, k: run_stem(pr, x, k, False)))(
                    params, x_stem, keys)
            err = float(jnp.max(jnp.abs(v1 - v2) / (jnp.abs(v2) + 1e-9)))
            print(f"on-device fused-vs-jnp rel err (p={p}): {err:.2e}",
                  flush=True)
            return

        def one(carry, x):
            pr, key = carry
            key, dk = jax.random.split(key)
            if backward:
                g = jax.grad(run_stem)(pr, x, dk, True)
                pr = jax.tree.map(lambda a, b: a + 1e-12 * b, pr, g)
            else:
                loss = run_stem(pr, x, dk, True)
                pr = jax.tree.map(lambda a: a + 1e-12 * loss, pr)
            return (pr, key)

        step = jax.vmap(one)
        run = chain(step)
        ms = timed(run, lambda i: ((params, keys), x_stem + i * 1e-6))
        tag = "stem-FUSED f+b" if backward else "stem-FUSED fwd"
        print(f"{tag:14s}: {ms:7.3f} ms/step", flush=True)

    variants = [
        ("stem fwd", lambda: stem_variant("stem fwd", True, True, False)),
        ("stem f+b", lambda: stem_variant("stem f+b", True, True, True)),
        ("stem-nodrop f+b",
         lambda: stem_variant("stem-nodrop", True, False, True)),
        ("stem-nobn f+b",
         lambda: stem_variant("stem-nobn", False, True, True)),
        ("conv-only fwd", lambda: conv_parts(False, False)),
        ("conv-only f+b", lambda: conv_parts(True, False)),
        ("conv+stats fwd", lambda: conv_parts(False, True)),
        ("conv+stats f+b", lambda: conv_parts(True, True)),
        ("fused fwd", lambda: stem_fused(False)),
        ("fused f+b", lambda: stem_fused(True)),
        ("fused-parity", lambda: stem_fused(False, p=0.0, check_parity=True)),
        ("infonce fwd", lambda: infonce(False)),
        ("infonce f+b", lambda: infonce(True)),
        ("infonce-K fwd", lambda: infonce(False, fused=True)),
        ("infonce-K f+b", lambda: infonce(True, fused=True)),
    ]
    for name, fn in variants:
        if only and not any(o in name for o in only):
            continue
        fn()


if __name__ == "__main__":
    main()
