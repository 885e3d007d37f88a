"""Historical BiLSTM-kernel variant experiments (all superseded).

Outcomes, measured on v5e at the flagship shape (the adopted kernel and
its final numbers live in ``kernels/lstm.py``):

- v4 "both directions per grid step" (grid (T,), 48 dots/step): SLOWER —
  5.45 vs 4.04 ms fwd recurrence; per-step work, not grid overhead,
  dominates.
- "dots-only" (gate transcendentals removed): 4.08 vs 4.04 ms — the VPU
  gate math is free; the serial dot chain is the cost.
- "batched dot" (one S-batched dot_general per step): same runtime as
  the 24-dot unrolled loop but ~120x faster Mosaic compile — ADOPTED.

The variants here are self-contained pallas_calls using the pre-packing
(2, T, B, 4H) layouts, kept runnable for re-measurement. The adopted
kernel has since moved to packed (T, B, 8H)/(T, B, 2H) layouts (2.34x
fp32 f+bwd vs XLA).

Usage: --parity (CPU interpret-mode check of the v4 variant), --dotsonly,
--batched; default times v4 against the old-layout grid.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, B, T, I, H = 24, 64, 73, 256, 128
N_CHAIN = 30


def _fwd_kernel_v4(xp0_ref, xp1_ref, whh_ref, h0_ref, h1_ref, c0_ref, c1_ref,
                   h_scr, c_scr, gates_scr):
    """Grid (T,). xp0 at actual time t, xp1 at T-1-t. Scratch (2,S,B,H)."""
    t = pl.program_id(0)
    S_ = h_scr.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    for d in range(2):
        for s in range(S_):
            gates_scr[d, s] = jax.lax.dot_general(
                h_scr[d, s], whh_ref[s, d],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    xp = jnp.stack([xp0_ref[:, 0, 0], xp1_ref[:, 0, 0]]).astype(jnp.float32)
    gates = gates_scr[...] + xp  # (2,S,B,4H)
    hidden = h_scr.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:])
    c = f * c_scr[...] + i * g
    h = o * jnp.tanh(c)
    h_scr[...] = h
    c_scr[...] = c
    h0_ref[:, 0] = h[0].astype(h0_ref.dtype)
    h1_ref[:, 0] = h[1].astype(h1_ref.dtype)
    c0_ref[:, 0] = c[0]
    c1_ref[:, 0] = c[1]


def fwd_call_v4(xp, w_hh, interpret=False):
    """xp (S,2,T,B,4H) actual-time; returns h_seq, c_seq (S,2,T,B,H)."""
    S_, _, T_, B_, G = xp.shape
    H_ = G // 4
    a0 = lambda t: (0, 0, t, 0, 0)
    a1 = lambda t: (0, 1, T_ - 1 - t, 0, 0)
    o0 = lambda t: (0, t, 0, 0)
    o1 = lambda t: (0, T_ - 1 - t, 0, 0)

    h0, h1, c0, c1 = pl.pallas_call(
        _fwd_kernel_v4,
        grid=(T_,),
        in_specs=[
            pl.BlockSpec((S_, 1, 1, B_, G), lambda t: a0(t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, 1, B_, G), lambda t: a1(t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 2, H_, G), lambda t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S_, 1, B_, H_), lambda t: o0(t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, B_, H_), lambda t: o1(t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, B_, H_), lambda t: o0(t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, B_, H_), lambda t: o1(t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_, T_, B_, H_), xp.dtype),
            jax.ShapeDtypeStruct((S_, T_, B_, H_), xp.dtype),
            jax.ShapeDtypeStruct((S_, T_, B_, H_), jnp.float32),
            jax.ShapeDtypeStruct((S_, T_, B_, H_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, S_, B_, H_), jnp.float32),
            pltpu.VMEM((2, S_, B_, H_), jnp.float32),
            pltpu.VMEM((2, S_, B_, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(xp, xp, w_hh)

    # kernel expects whh indexed [s, d]; w_hh comes in as (S,2,H,G) already
    h_seq = jnp.stack([h0, h1], axis=1)
    c_seq = jnp.stack([c0, c1], axis=1)
    return h_seq, c_seq


def _fwd_kernel_dotsonly(xp_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr,
                         gates_scr):
    """v3 kernel with the gate transcendentals replaced by a linear update:
    isolates MXU-dot time from VPU gate-math time."""
    t = pl.program_id(1)
    S_ = h_scr.shape[0]

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    for s in range(S_):
        gates_scr[s] = jax.lax.dot_general(
            h_scr[s], whh_ref[s, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    gates = gates_scr[...] + xp_ref[:, 0, 0].astype(jnp.float32)
    hidden = h_scr.shape[-1]
    c = 0.9 * c_scr[...] + 0.01 * gates[..., :hidden]
    h = 0.01 * gates[..., hidden:2 * hidden] + 0.5 * c
    h_scr[...] = h
    c_scr[...] = c
    hs_ref[:, 0, 0] = h.astype(hs_ref.dtype)
    cs_ref[:, 0, 0] = c.astype(cs_ref.dtype)


def fwd_call_dotsonly(xp, w_hh, interpret=False):
    S_, _, T_, B_, G = xp.shape
    H_ = G // 4
    amap = lambda d, t: (0, d, jnp.where(d == 0, t, T_ - 1 - t), 0, 0)
    return pl.pallas_call(
        _fwd_kernel_dotsonly,
        grid=(2, T_),
        in_specs=[
            pl.BlockSpec((S_, 1, 1, B_, G), amap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, H_, G), lambda d, t: (0, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S_, 1, 1, B_, H_), amap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, 1, B_, H_), amap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_, 2, T_, B_, H_), xp.dtype),
            jax.ShapeDtypeStruct((S_, 2, T_, B_, H_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S_, B_, H_), jnp.float32),
            pltpu.VMEM((S_, B_, H_), jnp.float32),
            pltpu.VMEM((S_, B_, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xp, w_hh)


def _fwd_kernel_batched(xp_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr):
    """v3 with the per-model dot loop replaced by ONE batched dot_general
    (S as a batch dimension) — tests whether Mosaic lowers/pipelines it."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    rec = jax.lax.dot_general(
        h_scr[...], whh_ref[:, 0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    gates = rec + xp_ref[:, 0, 0].astype(jnp.float32)
    hidden = h_scr.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:])
    c = f * c_scr[...] + i * g
    h = o * jnp.tanh(c)
    h_scr[...] = h
    c_scr[...] = c
    hs_ref[:, 0, 0] = h.astype(hs_ref.dtype)
    cs_ref[:, 0, 0] = c.astype(cs_ref.dtype)


def fwd_call_batched(xp, w_hh, interpret=False):
    S_, _, T_, B_, G = xp.shape
    H_ = G // 4
    amap = lambda d, t: (0, d, jnp.where(d == 0, t, T_ - 1 - t), 0, 0)
    return pl.pallas_call(
        _fwd_kernel_batched,
        grid=(2, T_),
        in_specs=[
            pl.BlockSpec((S_, 1, 1, B_, G), amap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, H_, G), lambda d, t: (0, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S_, 1, 1, B_, H_), amap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1, 1, B_, H_), amap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_, 2, T_, B_, H_), xp.dtype),
            jax.ShapeDtypeStruct((S_, 2, T_, B_, H_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S_, B_, H_), jnp.float32),
            pltpu.VMEM((S_, B_, H_), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xp, w_hh)


from multimodal_sentiment_aanalysis_tpu.utils.timing import timed


def chain(f, n=N_CHAIN):
    def g(x):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, x, None, length=n)[0]
    return jax.jit(g)


def main():
    parity = "--parity" in sys.argv
    if parity:
        jax.config.update("jax_platforms", "cpu")

    from multimodal_sentiment_aanalysis_tpu.kernels.lstm import _fwd_call

    rng = np.random.default_rng(0)
    s_, t_ = (3, 9) if parity else (S, T)
    xp = jnp.asarray(0.3 * rng.normal(size=(s_, 2, t_, B, 4 * H)).astype(np.float32))
    w_hh = jnp.asarray(0.3 * rng.normal(size=(s_, 2, H, 4 * H)).astype(np.float32))
    # the adopted kernel's packed layout: (S, T, B, [dir0 4H | dir1 4H])
    xp_packed = jnp.moveaxis(xp, 1, 3).reshape(s_, t_, B, 8 * H)

    def unpack(h):  # (S, T, B, 2H) packed -> (S, 2, T, B, H)
        return jnp.moveaxis(h.reshape(s_, t_, B, 2, H), 3, 1)

    if parity:
        h3 = unpack(_fwd_call(xp_packed, w_hh, True)[0])
        h4, c4 = fwd_call_v4(xp, w_hh, True)
        np.testing.assert_allclose(np.asarray(h4), np.asarray(h3), atol=2e-5)
        print("parity OK")
        return

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    variants = [("v4 (T,)", lambda a: fwd_call_v4(a, w_hh, False)[0]),
                ("v3 dots-only", lambda a: fwd_call_dotsonly(a, w_hh, False)[0])]
    if "--dotsonly" in sys.argv:
        variants = variants[1:]
    if "--batched" in sys.argv:
        variants = [("v3 batched-dot",
                     lambda a: fwd_call_batched(a, w_hh, False)[0])]
    for name, call in variants:
        def step(a, c=call):
            h = c(a)  # (S,2,T,B,H)
            return jnp.concatenate([h, h, h, h], axis=-1) * 1e-3 + a

        t = timed(chain(step), xp)
        print(f"{name} fwd recurrence: {t / N_CHAIN * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
