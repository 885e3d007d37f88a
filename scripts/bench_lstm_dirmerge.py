"""Prototype A/B (TPU): direction-merged LSTM forward kernel.

The production fused BiLSTM kernel (kernels/lstm.py) runs grid (2, T):
146 SEQUENTIAL grid steps, each one batch-S dot of (64,128)@(128,512) —
~32 us/step against a ~4 us compute roofline, i.e. latency-bound on the
per-step chain, not FLOPs. The two directions are data-independent, so
a grid (T,) kernel that advances BOTH directions per step (one batch-2S
dot) halves the sequential chain at identical FLOPs and identical
per-operand HBM traffic (xp is passed twice with lane-blocked index
maps — fwd half at t, bwd half at T-1-t — so no flipped or sliced
copies are materialized; outputs land in 4 per-direction arrays).

Chaining: whh is salted per scan iteration by isnan(corner of h) (whh
is 12.6 MB — a ~0.03 ms chain tax vs ~1.1 ms if xp were salted), which
defeats the tunnel's memoization and XLA hoisting.

RESULT (v5e, 2026-08-17): NEGATIVE — do not integrate. Production
grid-(2,T) fwd 2.070 ms vs dir-merged grid-(T,) 2.028 ms (parity
exact): halving the sequential grid-step count buys ~2%, so the
per-step chain latency is NOT the forward kernel's bottleneck — it is
already near its xp-streaming bound (~0.85 ms pure HBM for one layer's
xp+h+c traffic). Cutting that traffic (e.g. computing the input
projection in-kernel from the 4x-smaller x) is the only remaining
lever, at much higher complexity. Note this run also re-measured the
single-layer recurrence under HOST-SYNC timing at 2.07 ms — the
docstring table's 4.73 ms "fwd" (2-layer stack) predates the
host-transfer-sync lesson and its absolute values are suspect; the
in-situ ablation figure (10.75 ms f+b) is the trusted one.

Usage: python scripts/bench_lstm_dirmerge.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_sentiment_aanalysis_tpu.kernels.lstm import _fwd_call

S, B, T, H = 24, 64, 73, 128
G = 4 * H
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


def _sig(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# direction-merged forward: grid (T,), both directions per step
# ---------------------------------------------------------------------------

def _fwd2_kernel(xpf_ref, xpb_ref, whh_ref, hf_ref, hb_ref,
                 cf_ref, cb_ref, h_scr, c_scr):
    """State/weights carry BOTH directions direction-major along the
    leading batch axis (2S: rows [0, S) = fwd, [S, 2S) = bwd) — Mosaic's
    tpu.matmul supports at most ONE batch dim, and direction-major makes
    each direction's half a contiguous static slice."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    # both directions' recurrent matmuls as ONE batch-2S dot
    rec = jax.lax.dot_general(
        h_scr[...], whh_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (2S, B, 4H)

    hidden = h_scr.shape[-1]
    ns = h_scr.shape[0] // 2
    for d, (xr, ho, co) in enumerate(
            ((xpf_ref, hf_ref, cf_ref), (xpb_ref, hb_ref, cb_ref))):
        sl = slice(d * ns, (d + 1) * ns)
        g = rec[sl] + xr[:, 0].astype(jnp.float32)
        i = _sig(g[..., :hidden])
        f = _sig(g[..., hidden:2 * hidden])
        gg = jnp.tanh(g[..., 2 * hidden:3 * hidden])
        o = _sig(g[..., 3 * hidden:])
        c = f * c_scr[sl] + i * gg
        h = o * jnp.tanh(c)
        h_scr[sl] = h
        c_scr[sl] = c
        ho[:, 0] = h.astype(ho.dtype)
        co[:, 0] = c


def fwd2_call(xp, w_hh, interpret=False):
    """xp (S, T, B, 8H) packed [fwd|bwd], actual time; w_hh (S, 2, H, 4H).
    Returns (h_f, h_b, c_f, c_b), each (S, T, B, H) actual time."""
    Sx, Tx, Bx, G2 = xp.shape
    Gx = G2 // 2
    Hx = Gx // 4
    # direction-major (2S, H, 4H): rows [0,S) fwd, [S,2S) bwd
    whh2 = jnp.swapaxes(w_hh, 0, 1).reshape(2 * Sx, Hx, Gx)
    fmap = lambda t: (0, t, 0, 0)
    bmap = lambda t: (0, Tx - 1 - t, 0, 1)
    obmap = lambda t: (0, Tx - 1 - t, 0, 0)
    return pl.pallas_call(
        _fwd2_kernel,
        grid=(Tx,),
        in_specs=[
            pl.BlockSpec((Sx, 1, Bx, Gx), fmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sx, 1, Bx, Gx), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Sx, Hx, Gx), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Sx, 1, Bx, Hx), fmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sx, 1, Bx, Hx), obmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sx, 1, Bx, Hx), fmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((Sx, 1, Bx, Hx), obmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sx, Tx, Bx, Hx), xp.dtype),
            jax.ShapeDtypeStruct((Sx, Tx, Bx, Hx), xp.dtype),
            jax.ShapeDtypeStruct((Sx, Tx, Bx, Hx), jnp.float32),
            jax.ShapeDtypeStruct((Sx, Tx, Bx, Hx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * Sx, Bx, Hx), jnp.float32),
            pltpu.VMEM((2 * Sx, Bx, Hx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp, xp, whh2)


def chain(call, leaf):
    """Salt whh per iteration by isnan(corner of the output leaf)."""

    @jax.jit
    def run(xp, whh):
        def body(w, _):
            out = call(xp, w)
            s = leaf(out)[:, 0, 0, :].sum()
            return w + jnp.isnan(s).astype(w.dtype), s

        _, ss = jax.lax.scan(body, whh, None, length=N_CHAIN)
        return ss

    return run


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)
    rng = np.random.default_rng(0)
    xp = jnp.asarray(
        (0.05 * rng.normal(size=(S, T, B, 2 * G))).astype(np.float32))
    whh = jnp.asarray(
        (0.05 * rng.normal(size=(S, 2, H, G))).astype(np.float32))

    # parity check (tiny, interpret on CPU is too slow at full shape —
    # compare on-device against the production kernel)
    hp, _ = _fwd_call(xp, whh, False)
    hf, hb, _, _ = fwd2_call(xp, whh)
    hm = jnp.concatenate([hf, hb], axis=-1)
    rel = float(jnp.max(jnp.abs(hm - hp)) / (jnp.max(jnp.abs(hp)) + 1e-9))
    print(f"merged-vs-production rel err: {rel:.2e}", flush=True)

    ms = timed(chain(lambda x, w: _fwd_call(x, w, False)[0],
                     lambda o: o),
               lambda i: (xp + i * 1e-6, whh))
    print(f"production fwd (grid 2,T): {ms:7.3f} ms", flush=True)

    ms = timed(chain(lambda x, w: fwd2_call(x, w)[0], lambda o: o),
               lambda i: (xp + i * 1e-6, whh))
    print(f"dir-merged fwd (grid T,) : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
