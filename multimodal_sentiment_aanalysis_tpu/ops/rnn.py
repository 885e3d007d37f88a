"""LSTM primitives with PyTorch-parity numerics, TPU-optimized.

The reference EEG stem ends in a 2-layer bidirectional LSTM
(``MultimodalModel.py:49-55``). On TPU the recurrence is the one genuinely
sequential piece of the model (SURVEY.md §7 "hard parts"), so it is built to
minimize per-step work:

- the input projection ``x_t @ W_ih^T + b`` for *all* timesteps is hoisted out
  of the scan into one large (B*T, I) x (I, 4H) matmul that XLA tiles onto the
  MXU (jnp path; the fused TPU kernel computes the projection IN-kernel
  instead — see ``kernels/lstm.py`` v6);
- the ``lax.scan`` body only carries the (B, H) recurrent matmul + gate
  elementwise ops;
- both directions of a bidirectional layer share one scan via stacking, so a
  BiLSTM costs one recurrence, not two.

Gate layout matches torch (i, f, g, o) so parameters map 1:1 to
``nn.LSTM.weight_ih_l{k}(_reverse)`` for the parity tests.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Global default for the TPU fused-kernel dispatch in :func:`bilstm_layer`.
# bench.py turns it off around its FLOP-counting lowering: XLA's cost
# analysis cannot see inside a Pallas custom call, so the analytic-MFU
# lowering must take the pure-XLA scan path (same math, same FLOPs).
#
# KILL SWITCH: set ``MSA_FUSED_LSTM=0`` in the environment to disable the
# fused Pallas kernel process-wide without touching code. Rationale: one
# artificial gradient-consumption composition is known to fault the kernel
# at runtime on TPU (kernels/lstm.py "Known issue" — repro
# ``scripts/profile_step.py --only=no-update``); every production program
# runs clean, but if a NEW composition ever hits "TPU device error ...
# kernel fault", this env var is the immediate mitigation.
_FUSED_DISPATCH_ENABLED = os.environ.get("MSA_FUSED_LSTM", "1") != "0"

# When set, :func:`bilstm_layer`'s scan path fully unrolls regardless of
# backend. Used ONLY by FLOP-counting lowerings (bench.py): on CPU the
# scan lowers to a while loop whose body XLA cost analysis counts ONCE,
# undercounting the recurrence; a full unroll makes every step visible.
_FORCE_FULL_UNROLL = False


def enable_fused_dispatch(on: bool) -> bool:
    """Set the global fused-kernel dispatch default; returns the old value."""
    global _FUSED_DISPATCH_ENABLED
    old = _FUSED_DISPATCH_ENABLED
    _FUSED_DISPATCH_ENABLED = bool(on)
    return old


def wrap_with_dispatch(fn, on: bool):
    """Wrap ``fn`` so the fused-dispatch flag equals ``on`` while it runs.

    The flag is read at TRACE time inside :func:`bilstm_layer`, so
    wrapping a function BEFORE ``jax.jit`` pins the dispatch choice into
    that program without touching the process-wide default. Used by the
    vectorized trainers to route configs that exceed the fused kernel's
    VMEM envelope (:func:`..kernels.lstm.fused_bwd_vmem_fits`) onto the
    XLA recurrence.
    """

    def wrapped(*args):
        old = enable_fused_dispatch(on)
        try:
            return fn(*args)
        finally:
            enable_fused_dispatch(old)

    return wrapped


def _lstm_scan(
    x_proj: jnp.ndarray,  # (T, B, 4H) precomputed input projections (+biases)
    w_hh: jnp.ndarray,  # (4H, H) torch layout
    h0: jnp.ndarray,  # (B, H)
    c0: jnp.ndarray,  # (B, H)
) -> jnp.ndarray:
    hidden = w_hh.shape[1]

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (_, _), hs = jax.lax.scan(step, (h0, c0), x_proj)
    return hs  # (T, B, H)


def lstm(
    x: jnp.ndarray,  # (B, T, I)
    w_ih: jnp.ndarray,  # (4H, I)
    w_hh: jnp.ndarray,  # (4H, H)
    b_ih: jnp.ndarray,  # (4H,)
    b_hh: jnp.ndarray,  # (4H,)
    reverse: bool = False,
) -> jnp.ndarray:
    """Single-direction LSTM layer; returns the full hidden sequence (B, T, H)."""
    if reverse:
        x = jnp.flip(x, axis=1)
    b, t, _ = x.shape
    hidden = w_hh.shape[1]
    x_proj = x @ w_ih.T + (b_ih + b_hh)  # hoisted MXU matmul over all steps
    x_proj = jnp.transpose(x_proj, (1, 0, 2))  # (T, B, 4H)
    h0 = jnp.zeros((b, hidden), x.dtype)
    hs = _lstm_scan(x_proj, w_hh, h0, h0)
    hs = jnp.transpose(hs, (1, 0, 2))
    if reverse:
        hs = jnp.flip(hs, axis=1)
    return hs


def bilstm_layer(
    x: jnp.ndarray,
    fwd: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    bwd: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    unroll: int | None = None,
    use_fused: bool | None = None,
) -> jnp.ndarray:
    """Bidirectional layer: both directions fused into ONE lax.scan.

    The reverse direction is expressed as the forward recurrence over the
    flipped sequence; stacking the two directions along a leading axis lets a
    single scan carry a (2, B, H) state, halving scan overhead vs two scans.
    Output is (B, T, 2H) with torch's [forward, backward] concat order.

    On TPU at Mosaic-aligned shapes this dispatches to the fused Pallas
    recurrence (:mod:`..kernels.lstm` — h/c carried in VMEM across the
    whole sweep, custom VJP; A/B table in that module's docstring). Off-TPU
    and at unaligned shapes the scan path below runs; the kernel's parity
    test pins the two together. ``use_fused`` forces the choice (the A/B
    benchmark uses ``False`` for an honest XLA baseline).
    """
    b, t, _ = x.shape
    hidden_ = fwd[1].shape[1]
    if use_fused is None:
        from ..kernels.lstm import supported_shape

        # _FUSED_DISPATCH_ENABLED honors the MSA_FUSED_LSTM=0 env kill
        # switch — the mitigation for the kernel's known device-fault
        # composition (kernels/lstm.py "Known issue")
        use_fused = (_FUSED_DISPATCH_ENABLED
                     and jax.default_backend() == "tpu"
                     and supported_shape(b, hidden_))
    if use_fused:
        from ..kernels.lstm import fused_bilstm_layer

        return fused_bilstm_layer(x, fwd, bwd)
    (wif, whf, bif, bhf) = fwd
    (wib, whb, bib, bhb) = bwd

    xf = x @ wif.T + (bif + bhf)  # (B, T, 4H)
    xb = jnp.flip(x, axis=1) @ wib.T + (bib + bhb)
    return bilstm_recurrence(xf, xb, whf, whb, unroll=unroll)


def bilstm_recurrence(
    xf: jnp.ndarray,
    xb: jnp.ndarray,
    whf: jnp.ndarray,
    whb: jnp.ndarray,
    unroll: int | None = None,
) -> jnp.ndarray:
    """The BiLSTM recurrence given *pre-projected* inputs.

    ``xf``/``xb`` are ``x @ W_ih^T + b`` for the forward direction and the
    time-flipped reverse direction, each (B, T, 4H). Split out from
    :func:`bilstm_layer` so callers that compute the input projection
    differently (e.g. the int8-quantized serving path,
    :mod:`..eval.quantization`) reuse the exact same recurrence.
    Returns (B, T, 2H) with torch's [forward, backward] concat order.
    """
    b, t, _ = xf.shape
    hidden = whf.shape[1]
    # stack directions: (T, 2, B, 4H)
    xp = jnp.stack(
        [jnp.transpose(xf, (1, 0, 2)), jnp.transpose(xb, (1, 0, 2))], axis=1
    )
    w_hh = jnp.stack([whf, whb])  # (2, 4H, H)

    def step(carry, xpt):
        h, c = carry  # (2, B, H)
        gates = xpt + jnp.einsum("dbh,dgh->dbg", h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((2, b, hidden), xf.dtype)
    # unrolling amortizes per-iteration scan overhead on TPU; the recurrence
    # is the fusion-resistant piece of the EEG stem (SURVEY.md §7 hard
    # parts). Short sequences unroll fully (measured 7.0 ms vs 8.3 ms/step
    # at T=73); long ones cap the unroll to bound compile time.
    if unroll is None:
        # full unroll only on TPU (measured 7.0 vs 8.3 ms/step at T=73);
        # on CPU it balloons compile times by minutes for zero benefit
        on_tpu = jax.default_backend() == "tpu"
        unroll = (t if t <= 128 else 8) if on_tpu else 8
        if _FORCE_FULL_UNROLL:
            unroll = t  # FLOP-counting lowering: see module-level note
    (_, _), hs = jax.lax.scan(step, (h0, h0), xp, unroll=unroll)  # (T, 2, B, H)
    h_fwd = jnp.transpose(hs[:, 0], (1, 0, 2))
    h_bwd = jnp.flip(jnp.transpose(hs[:, 1], (1, 0, 2)), axis=1)
    return jnp.concatenate([h_fwd, h_bwd], axis=-1)


def bilstm_stack(
    x: jnp.ndarray, layers: list[dict[str, jnp.ndarray]]
) -> jnp.ndarray:
    """Multi-layer BiLSTM (torch ``nn.LSTM(num_layers=n, bidirectional=True)``).

    ``layers[k]`` holds keys ``w_ih_fwd, w_hh_fwd, b_ih_fwd, b_hh_fwd`` and the
    ``_bwd`` counterparts, in torch shapes. Layer k>0 consumes the (B, T, 2H)
    concat of layer k-1 (torch semantics, dropout=0 default).
    """
    out = x
    for p in layers:
        out = bilstm_layer(
            out,
            (p["w_ih_fwd"], p["w_hh_fwd"], p["b_ih_fwd"], p["b_hh_fwd"]),
            (p["w_ih_bwd"], p["w_hh_bwd"], p["b_ih_bwd"], p["b_hh_bwd"]),
        )
    return out
