"""Fault isolation for the packed BiLSTM kernel's known device fault.

Repro: ``scripts/profile_step.py --only=no-update`` (chained train step,
grads consumed without clip/optimizer) faults at runtime on the TPU tunnel
("UNAVAILABLE: TPU device error ... kernel fault") while every production
program runs clean (kernels/lstm.py "Known issue").

This script swaps the recurrence implementation under the EXACT faulting
composition to bisect which kernel is at fault:

- ``kernel``  : production path (fwd + bwd Pallas kernels) — expect fault
- ``fwdonly`` : Pallas forward kernel, pure-jnp backward — isolates the fwd
- ``bwdonly`` : pure-jnp forward (same packed layouts/residuals), Pallas
                backward kernel — isolates the bwd
- ``jnp``     : both directions pure-jnp over the packed layout (control;
                distinct from the production scan path, same residual flow)

Each variant must run in a FRESH process (a device fault can poison the
client). Usage: ``python scripts/debug_lstm_fault.py <variant>``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

from multimodal_sentiment_aanalysis_tpu.kernels import lstm as lstm_mod


# ---------------------------------------------------------------------------
# pure-jnp twins of the packed-layout kernels (same signatures/residuals)
# ---------------------------------------------------------------------------

def _jnp_fwd_packed(xp, w_hh):
    """xp (T,B,8H) packed [fwd|bwd] actual-time; w_hh (2,H,4H).
    Returns h_seq AND c_seq (T,B,2H) packed actual-time (c f32)."""
    T, B, G2 = xp.shape
    G = G2 // 2
    H = G // 4
    # recurrence-time layout: dir 1 runs over flipped time
    xp_rec = jnp.stack([xp[..., :G], jnp.flip(xp[..., G:], 0)], 0)
    xp_rec = jnp.swapaxes(xp_rec, 0, 1).astype(jnp.float32)  # (T,2,B,4H)

    def step(carry, xpt):
        h, c = carry  # (2,B,H)
        gates = xpt + jnp.einsum("dbh,dhg->dbg", h, w_hh.astype(jnp.float32))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), (h, c)

    z = jnp.zeros((2, B, H), jnp.float32)
    _, (hs, cs) = jax.lax.scan(step, (z, z), xp_rec)  # (T,2,B,H) each
    h_seq = jnp.concatenate(
        [hs[:, 0], jnp.flip(hs[:, 1], 0)], axis=-1
    ).astype(xp.dtype)
    c_seq = jnp.concatenate([cs[:, 0], jnp.flip(cs[:, 1], 0)], axis=-1)
    return h_seq, c_seq


def _jnp_bwd_packed(dh_seq, xp, h_seq, c_seq, w_hh):
    """Reverse walk in recurrence time; returns dxp (T,B,8H) f32
    actual-time packed. Same math as the Pallas backward kernel."""
    T, B, G2 = xp.shape
    G = G2 // 2
    H = G // 4
    w = w_hh.astype(jnp.float32)  # (2,H,4H)

    def to_rec(a0, a1):  # actual-time halves -> (T,2,...) recurrence time
        return jnp.stack([a0, jnp.flip(a1, 0)], 1)

    xp_rec = to_rec(xp[..., :G], xp[..., G:]).astype(jnp.float32)
    dh_rec = to_rec(dh_seq[..., :H], dh_seq[..., H:]).astype(jnp.float32)
    h_rec = to_rec(h_seq[..., :H], h_seq[..., H:]).astype(jnp.float32)
    c_rec = to_rec(c_seq[..., :H], c_seq[..., H:]).astype(jnp.float32)
    z1 = jnp.zeros((1, 2, B, H), jnp.float32)
    h_prev = jnp.concatenate([z1, h_rec[:-1]], 0)
    c_prev = jnp.concatenate([z1, c_rec[:-1]], 0)

    def step(carry, xs):
        dh_acc, dc_acc = carry  # (2,B,H)
        xpt, dht, ct, cpt, hpt = xs
        gates = xpt + jnp.einsum("dbh,dhg->dbg", hpt, w)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = (jax.nn.sigmoid(v) for v in (i, f, o))
        g = jnp.tanh(g)
        dh = dht + dh_acc
        tc = jnp.tanh(ct)
        do = dh * tc
        dc = dc_acc + dh * o * (1.0 - tc * tc)
        di, dg, df = dc * g, dc * i, dc * cpt
        dgates = jnp.concatenate(
            [di * i * (1 - i), df * f * (1 - f),
             dg * (1 - g * g), do * o * (1 - o)], axis=-1)
        dh_next = jnp.einsum("dbg,dhg->dbh", dgates, w)
        return (dh_next, dc * f), dgates

    z = jnp.zeros((2, B, H), jnp.float32)
    _, dgates = jax.lax.scan(
        step, (z, z), (xp_rec, dh_rec, c_rec, c_prev, h_prev), reverse=True
    )  # (T,2,B,4H)
    return jnp.concatenate([dgates[:, 0], jnp.flip(dgates[:, 1], 0)], -1)


# ---------------------------------------------------------------------------
# recurrence variants (drop-ins for kernels.lstm.lstm_recurrence)
# ---------------------------------------------------------------------------

def make_variant(fwd_impl: str, bwd_impl: str,
                 barrier: bool = False, c_from_jnp: bool = False):
    """barrier: optimization_barrier between the fwd kernel's outputs and
    all consumers (tests for an XLA-scheduling race). c_from_jnp: run the
    fwd kernel but take the c_seq residual from a jnp recompute, leaving
    the kernel's c output unconsumed (isolates produce-vs-consume)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def rec(xp, w_hh, interpret=False):
        if fwd_impl == "kernel":
            h, _ = lstm_mod._make_vm(interpret)[0](xp, w_hh)
        else:
            h, _ = _jnp_fwd_packed(xp, w_hh)
        return h

    def rec_fwd(xp, w_hh, interpret):
        if fwd_impl == "kernel":
            h, c = lstm_mod._make_vm(interpret)[0](xp, w_hh)
            if c_from_jnp:
                _, c = _jnp_fwd_packed(xp, w_hh)
            if barrier:
                h, c = jax.lax.optimization_barrier((h, c))
        else:
            h, c = _jnp_fwd_packed(xp, w_hh)
        return h, (xp, w_hh, h, c)

    def rec_bwd(interpret, res, dh):
        xp, w_hh, h, c = res
        if bwd_impl == "kernel":
            dxp = lstm_mod._make_vm(interpret)[1](dh, xp, h, c, w_hh)
        else:
            dxp = _jnp_bwd_packed(dh, xp, h, c, w_hh)
        dw_hh = lstm_mod.dw_hh_packed(h, dxp)
        return dxp.astype(xp.dtype), dw_hh.astype(w_hh.dtype)

    rec.defvjp(rec_fwd, rec_bwd)
    return rec


VARIANTS = {
    "kernel": dict(fwd_impl="kernel", bwd_impl="kernel"),
    "fwdonly": dict(fwd_impl="kernel", bwd_impl="jnp"),
    "bwdonly": dict(fwd_impl="jnp", bwd_impl="kernel"),
    "jnp": dict(fwd_impl="jnp", bwd_impl="jnp"),
    # finer splits of the faulting fwd-kernel case:
    "fwdbar": dict(fwd_impl="kernel", bwd_impl="jnp", barrier=True),
    "fwdnoc": dict(fwd_impl="kernel", bwd_impl="jnp", c_from_jnp=True),
    "kernelbar": dict(fwd_impl="kernel", bwd_impl="kernel", barrier=True),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    kw = VARIANTS[name]
    print(f"variant={name} ({kw})", flush=True)

    variant = make_variant(**kw)
    # fused_bilstm_layer resolves lstm_recurrence from its module globals
    lstm_mod.lstm_recurrence = variant

    # run the exact faulting composition
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import profile_step as ps

    sys.argv = ["profile_step.py", "--only=no-update"]
    ps.main()
    print(f"variant={name}: RAN CLEAN", flush=True)


if __name__ == "__main__":
    main()
