"""Microbench the fused train-stem FORWARD kernel's internals (TPU).

profile_stem.py put the Pallas tail pass at ~5.8 ms fwd for both stages
(9.0 fused-stem fwd - 3.2 conv-only) against a ~0.5 ms HBM roofline:
the kernel, not XLA's convs, is the stem's remaining cost. Suspects:

- stage-1 lane waste: C=64 = half the 128-lane vreg width, so every
  VPU op on the (B,585,64) stage runs at half throughput;
- the in-kernel dropout PRNG;
- the exact-erf GELU chain (div + exp per element);
- the (bt, t_out, pool, c) reshape + max (sublane-strided selects).

Per-stage timing of the production fwd kernel plus ablated variants
(each knob off), and a full-lane stage-1 candidate that views the
(584, 64) rows as (146, 256) so pooling becomes 3 lane-slice maxes.

Usage: python scripts/bench_stem_variants.py
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_sentiment_aanalysis_tpu.kernels.conv_stem_train import (
    _fwd_call, _gelu, _keep_mask, make_seeds,
)

S, B = 24, 64
N_CHAIN = 30
STAGES = {
    "stage1": (585, 64, 4),   # (T, C, pool)
    "stage2": (146, 256, 2),
}


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


def chain(call):
    """Chain N_CHAIN kernel invocations through the SEEDS operand: each
    iteration perturbs seeds by a value XLA cannot constant-fold
    (isnan of the previous output's corner sum), which defeats both CSE
    across iterations and loop-invariant hoisting without any extra
    full-tensor pass (the earlier ``x.at[...].add`` consume lowered to a
    ~300 ms TPU scatter and swamped the kernel)."""

    @jax.jit
    def run(x, sc, sh, seeds):
        def body(seeds, _):
            o = call(x, sc, sh, seeds)
            s = o[:, 0, 0, :].sum()
            return seeds + jnp.isnan(s).astype(jnp.int32), s

        seeds, ss = jax.lax.scan(body, seeds, None, length=N_CHAIN)
        return seeds, ss

    return run


# ---------------------------------------------------------------------------
# ablation kernel: knobs for gelu / dropout / pool
# ---------------------------------------------------------------------------

def _abl_kernel(seed_ref, conv_ref, sc_ref, sh_ref, o_ref, *,
                pool, t_out, p, use_gelu, use_pool):
    t_cov = t_out * pool
    _, bt, _, c = conv_ref.shape
    y = conv_ref[0, :, :t_cov, :] * sc_ref[0, 0][None, None, :] + \
        sh_ref[0, 0][None, None, :]
    a = _gelu(y) if use_gelu else y
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0, 0] + pl.program_id(1))
        keep = _keep_mask((bt, t_cov, c), p)
        a = jnp.where(keep, a * (1.0 / (1.0 - p)), 0.0)
    if use_pool:
        o_ref[0] = a.reshape(bt, t_out, pool, c).max(axis=2)
    else:
        # same output shape, no windowed max; static index (Mosaic has no
        # strided-slice/3-D-gather lowering)
        o_ref[0] = a.reshape(bt, t_out, pool, c)[:, :, 0, :]


def _abl_call(conv, sc, sh, seeds, *, pool, p, use_gelu, use_pool,
              block_b=8):
    Sx, b, t, c = conv.shape
    t_out = t // pool
    nb = b // block_b
    return pl.pallas_call(
        functools.partial(_abl_kernel, pool=pool, t_out=t_out, p=p,
                          use_gelu=use_gelu, use_pool=use_pool),
        grid=(Sx, nb),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, t, c), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, t_out, c),
                               lambda s, i: (s, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sx, b, t_out, c), conv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("parallel", "parallel"),
        ),
    )(seeds, conv, sc.reshape(Sx, 1, c), sh.reshape(Sx, 1, c))


# ---------------------------------------------------------------------------
# full-lane with IN-KERNEL reshape: operand stays (S, B, T, C); the
# (t_cov, c) -> (t_out, pool*c) relayout happens in VMEM inside the kernel
# (if Mosaic lowers it cheaply this avoids the ~0.6 ms/stage XLA reshape)
# ---------------------------------------------------------------------------

def _flik_kernel(seed_ref, conv_ref, sc_ref, sh_ref, o_ref, *,
                 pool, t_out, c, p):
    t_cov = t_out * pool
    _, bt, _, _ = conv_ref.shape
    xv = conv_ref[0, :, :t_cov, :].reshape(bt, t_out, pool * c)
    y = xv * sc_ref[0, 0][None, None, :] + sh_ref[0, 0][None, None, :]
    a = _gelu(y)
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0, 0] + pl.program_id(1))
        keep = _keep_mask((bt, t_out, pool * c), p)
        a = jnp.where(keep, a * (1.0 / (1.0 - p)), 0.0)
    m = a[:, :, :c]
    for j in range(1, pool):
        m = jnp.maximum(m, a[:, :, j * c:(j + 1) * c])
    o_ref[0] = m


def _flik_call(conv, sc_t, sh_t, seeds, *, pool, c, p, block_b=8):
    Sx, b, t, _ = conv.shape
    t_out = t // pool
    nb = b // block_b
    return pl.pallas_call(
        functools.partial(_flik_kernel, pool=pool, t_out=t_out, c=c, p=p),
        grid=(Sx, nb),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, t, c), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pool * c), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pool * c), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, t_out, c),
                               lambda s, i: (s, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sx, b, t_out, c), conv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("parallel", "parallel"),
        ),
    )(seeds, conv, sc_t.reshape(Sx, 1, pool * c),
      sh_t.reshape(Sx, 1, pool * c))


# ---------------------------------------------------------------------------
# full-lane stage-1 candidate: rows viewed as (t_out, pool*c), pooling by
# lane slices
# ---------------------------------------------------------------------------

def _fl_kernel(seed_ref, conv_ref, sc_ref, sh_ref, o_ref, *,
               pool, c, p):
    _, bt, t_out, pc = conv_ref.shape
    y = conv_ref[0] * sc_ref[0, 0][None, None, :] + sh_ref[0, 0][None, None, :]
    a = _gelu(y)
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0, 0] + pl.program_id(1))
        keep = _keep_mask((bt, t_out, pc), p)
        a = jnp.where(keep, a * (1.0 / (1.0 - p)), 0.0)
    m = a[:, :, :c]
    for j in range(1, pool):
        m = jnp.maximum(m, a[:, :, j * c:(j + 1) * c])
    o_ref[0] = m


def _fl_call(conv4, sc_t, sh_t, seeds, *, pool, c, p, block_b=8):
    """conv4: (S, B, t_out, pool*c) — the (B, t_cov, c) rows reshaped
    contiguously; sc_t/sh_t: (S, pool*c) scale/shift tiled ``pool`` x."""
    Sx, b, t_out, pc = conv4.shape
    nb = b // block_b
    return pl.pallas_call(
        functools.partial(_fl_kernel, pool=pool, c=c, p=p),
        grid=(Sx, nb),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, t_out, pc), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pc), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pc), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_b, t_out, c),
                               lambda s, i: (s, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sx, b, t_out, c), conv4.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
            dimension_semantics=("parallel", "parallel"),
        ),
    )(seeds, conv4, sc_t.reshape(Sx, 1, pc), sh_t.reshape(Sx, 1, pc))


def main():
    only_new = "--only-new" in sys.argv
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)

    for name, (t, c, pool) in STAGES.items():
        x = jnp.asarray(rng.normal(size=(S, B, t, c)).astype(np.float32))
        sc = jnp.asarray(rng.normal(size=(S, c)).astype(np.float32))
        sh = jnp.asarray(rng.normal(size=(S, c)).astype(np.float32))
        seeds = jax.vmap(lambda k: make_seeds(k, B))(
            jax.random.split(jax.random.key(0, impl="rbg"), S))

        def prod(xx, sc, sh, seeds):
            return _fwd_call(xx, sc, sh, seeds, pool=pool, p=0.4, block_b=8,
                             interpret=False)

        if not only_new:
            ms = timed(chain(prod), lambda i: (x + i * 1e-6, sc, sh, seeds))
            print(f"{name} production p=0.4      : {ms:7.3f} ms", flush=True)

        # in-kernel-reshape full-lane (operand in production layout)
        sc_t = jnp.tile(sc, (1, pool))
        sh_t = jnp.tile(sh, (1, pool))

        for bb in (8, 16):
            def flik(xx, sc_t, sh_t, seeds, bb=bb):
                return _flik_call(xx, sc_t, sh_t, seeds, pool=pool, c=c,
                                  p=0.4, block_b=bb)

            try:
                ms = timed(chain(flik),
                           lambda i: (x + i * 1e-6, sc_t, sh_t, seeds))
                print(f"{name} FL-INKERNEL b{bb} p=0.4 : {ms:7.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"{name} FL-INKERNEL b{bb}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

        if only_new:
            continue

        for tag, kw in [
            ("no-dropout (p=0)     ", dict(p=0.0, use_gelu=True, use_pool=True)),
            ("no-gelu              ", dict(p=0.4, use_gelu=False, use_pool=True)),
            ("no-pool (stride sel) ", dict(p=0.4, use_gelu=True, use_pool=False)),
            ("affine only          ", dict(p=0.0, use_gelu=False, use_pool=False)),
        ]:
            def abl(xx, sc, sh, seeds, kw=kw):
                return _abl_call(xx, sc, sh, seeds, pool=pool, **kw)

            ms = timed(chain(abl), lambda i: (x + i * 1e-6, sc, sh, seeds))
            print(f"{name} {tag}: {ms:7.3f} ms", flush=True)

        # full-lane candidate (viewing rows as (t_out, pool*c))
        t_out = t // pool
        x4 = x[:, :, : t_out * pool, :].reshape(S, B, t_out, pool * c)
        sc_t = jnp.tile(sc, (1, pool))
        sh_t = jnp.tile(sh, (1, pool))

        def fl(xx, sc_t, sh_t, seeds):
            return _fl_call(xx, sc_t, sh_t, seeds, pool=pool, c=c, p=0.4)

        ms = timed(chain(fl), lambda i: (x4 + i * 1e-6, sc_t, sh_t, seeds))
        print(f"{name} FULL-LANE p=0.4      : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
