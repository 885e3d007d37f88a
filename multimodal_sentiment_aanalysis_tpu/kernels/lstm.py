"""Fused bidirectional-LSTM recurrence Pallas kernel (training hot path).

The EEG stem's 2-layer BiLSTM (reference ``MultimodalModel.py:49-55``) is
the profiled bottleneck of the train step: 25.2 ms fwd+bwd of a ~65 ms fp32
step at the real vmapped shape (S=24 LOSO models, B=64, T=73, H=128 —
``scripts/profile_lstm.py``). The recurrence is 73 sequential steps of
SMALL per-model matmuls ((64,128)@(128,512)): XLA runs them as a scan whose
hidden state round-trips HBM every step, and under the vectorized-LOSO
``vmap`` the batched matmuls serialize.

This kernel runs the whole recurrence (both directions, ALL vmapped models)
as ONE Pallas program: grid ``(2, T)`` with time innermost, every model's
``h``/``c`` carried in float32 VMEM scratch across grid steps (never
touching HBM), the precomputed input projections ``xp`` streamed in per
step and the hidden sequence streamed out. Two structural tricks:

- Direction 1's time reversal is free — it lives in the BlockSpec index
  maps, so no flipped copies of ``xp``/``h_seq`` are ever materialized.
- The model axis S lives INSIDE the block (one S-batched ``dot_general``
  per time step), not in the grid: a ``jax.custom_batching.custom_vmap``
  rule turns the trainer's ``vmap`` (which batches weights AND
  activations) into the S-aware kernel instead of Pallas's default
  sequential grid axis. The time chain is 73 links total instead of
  S*2*73. ``custom_vjp`` sits OUTSIDE the ``custom_vmap`` wrappers, so
  reverse-mode AD never differentiates through ``custom_vmap`` (it sees
  only the custom VJP pair, whose fwd/bwd bodies get batch-traced).
  The batched dot runs at the same speed as an unrolled per-model dot
  loop (the MXU dependency chain is identical) but Mosaic compiles it
  ~120x faster (3.7 s vs 451 s cold at the flagship shape).

Scope (v6+v7+v8): the recurrence, the input projection, AND the gradient
reductions are all in-kernel. Forward (v6): the kernel streams the raw
(T, B, I) input and each grid step adds one batched ``x_t @ W_ih`` dot
to the recurrent dot, so the (T, B, 8H) projection tensor (4x the input
at the flagship I=2H) never exists. Backward (v7): the reverse sweep
recomputes the gates from ``x_t + h_prev``, accumulates
``dW_cat = sum_t [x_t | h_prev | 1]^T dgates`` directly in its output
block (db falls out of the ones-rows), and streams ``dx`` out as
per-direction lane halves — so the packed gate-grad tensor dxp
(459 MB/layer fp32) never exists either; the only XLA epilogue is
summing the two dx halves (fused into the consumer). v8 (2026-08-19):
the forward emits ONLY ``h_seq`` — c lives in scratch and never crosses
the program boundary; the backward first rebuilds ``c_seq`` with a
forward-order sweep kernel (``_cseq_kernel``: gates from stored x +
h_seq, elementwise c carry — no matmul recurrence, bit-exact in fp32)
and the reverse-sweep grid blocks the BATCH axis (``pick_block_b``) so
its VMEM windows scale with the block, not B — fp32 B=256 runs fused as
two Bb=128 blocks instead of falling off the 128 MB cliff. v9
(2026-08-19, default; ``MSA_LSTM_SEGBWD=0`` reverts to v8): the c
rebuild writes only ceil(T/K) per-segment boundary checkpoints
(``_cbnd_call`` — the full (S,T,B,2H) float32 c_seq, ~114 MB/layer
written + ~2x streamed back, never exists) and the reverse sweep
(``_segbwd_call``) processes K actual-time rows per grid step: c is
rebuilt in registers inside the segment from its boundary value and the
gate/dx/dW dots batch over the segment's K*Bb rows; only the
dgates @ Whh^T carry dot stays per-step (serial dependence). Measured
(v5e 2026-08-19): standalone 2-layer f+bwd 10.33 -> 9.12 ms fp32 /
9.38 -> 8.35 bf16 (``scripts/bench_segbwd_tune.py``, K/Bb sweep in its
log + ``_SEG_K`` note); in situ same-session full-step 39.15 -> 38.00 ms
fp32 with fwd-only identical (forward untouched), every
``profile_step --only=*`` ablation clean (the v8 fault closure holds —
no c-derived tensor crosses the FORWARD boundary in any revision >= v8),
and hardware grad parity v8-vs-v9 at 4e-07. Inputs whose
width is not lane-aligned (I % 128 != 0) take the v5 two-pass form (one
hoisted XLA projection matmul + an xp-streaming kernel), as does
``MSA_LSTM_XPROJ=0``; ``MSA_LSTM_BWDC=0`` reverts just the backward to
the v6 split (kernel emits dxp, XLA reduces) — both legacy paths still
carry a forward c output and exist for debugging only.

Numerics: matmuls take ``preferred_element_type=float32``; ``h``/``c``
accumulate in float32 even in bf16 compute mode (tighter than the jnp bf16
path, which carries bf16 state). A/B parity vs :func:`..ops.rnn.
bilstm_layer` is asserted in ``tests/test_kernels.py`` (interpret mode on
CPU); dispatch (``ops/rnn.py``) sends non-TPU backends and unaligned
shapes to the jnp path.

A/B hardware timing, TPU v5e, real vmapped shape (S=24, B=64, T=73, I=256,
H=128, 2 layers, chained-scan timing, ``scripts/bench_lstm_kernel.py``;
v5-era numbers — the fused column is the xp-streaming form):

===========  ==========  ============  =======
config       jnp (XLA)   fused kernel  speedup
===========  ==========  ============  =======
fp32 fwd        9.96 ms     4.73 ms      2.11x
fp32 f+bwd     25.17 ms    10.75 ms      2.34x
bf16 fwd        7.09 ms     3.06 ms      2.32x
bf16 f+bwd     15.46 ms     7.77 ms      1.99x
===========  ==========  ============  =======

v5-vs-v6/v7 at the same shape (``scripts/bench_lstm_xproj_e2e.py``,
host-sync chained timing, grads to x and all weights; the v6 f+bwd
column is the SPLIT backward, the v7 column the in-kernel-reductions
backward, 2026-08-17/18):

===========  ==========  ===========  ===========  =======
config       v5 (xp)     v6 (split)   v7 (bwdc)    v5->v7
===========  ==========  ===========  ===========  =======
fp32 fwd       4.78 ms      2.56 ms      (same)     1.86x
fp32 f+bwd    15.74 ms     13.59 ms      9.37 ms    1.68x
bf16 fwd       3.16 ms      2.16 ms      (same)     1.46x
bf16 f+bwd    12.58 ms     11.69 ms      8.55 ms    1.47x
===========  ==========  ===========  ===========  =======

In situ: v6 alone compressed to ~0.5 ms/step (paired
``profile_step --only=full`` 42.42 vs 42.87 ms), but v7's dxp
elimination holds up end-to-end — full fp32 step 42.42 -> 37.97 ms,
bench.py headline 33.0k -> 37.3k samples/s fp32 (MFU 11.1%),
40.2k -> 44.4k bf16 (MFU 13.2%), vectorized-phased 31.7k -> 34.8k
(2026-08-18), sanity accuracy unchanged.

Revision history of the fused path (each step A/B'd on hardware):
v2 kept S in the Pallas grid — 3504 sequential grid steps, 18.4 ms fp32
f+bwd. v3 moved S into the block via custom_vmap (15.98 ms) and then
batched the per-model dots into one dot_general (same runtime, ~120x
faster Mosaic compile). v4 packed the direction axis into the LAST dim
of xp/h_seq so the direction select became BlockSpec lane blocking —
eliminating the (2,T,B,4H) stack/transpose passes over the layer's
biggest tensors (the projections are transposed as (T,B,I) BEFORE the
matmul, 4-8x less transpose traffic) — 10.75 ms fp32 f+bwd. v5 packed
c_seq into the same 4-D lane-blocked layout as h_seq (dropping the 5-D
(S,2,T,B,H) spec — one layout family for both outputs; part of the
fault bisection below) at identical runtime (10.76 ms fp32 f+bwd,
re-measured). A direction-merged grid-(T,) variant (one batch-2S dot
per step, halving the sequential chain) measured a ~2% wash
(``scripts/bench_lstm_dirmerge.py``) — the forward was at its
xp-STREAMING bound, not chain-latency-bound — which motivated v6:
the input projection moved IN-KERNEL (stream raw x, 4x smaller than
xp; one extra batched dot per step; projection tensor never
materialized), 1.86x the v5 forward / 1.16x f+bwd fp32 (tables
below). Remaining gap to roofline is the serial per-step dot chain
(146 dots at half-tile M occupancy) and the backward's unchanged
XLA reductions.

Device-fault class, RESOLVED BY DESIGN in v8 (history below): through
round 3, one XLA-schedule-dependent composition at a time faulted at
runtime on the tunnel ("UNAVAILABLE: TPU device error ... kernel
fault"), and round-3 bisection proved the trigger was the FORWARD
kernel's c_seq output being consumed downstream (``fwdnoc`` — its c
output unused — was clean; layout- and barrier-independent). v8 removes
that trigger structurally: the forward kernel HAS no c output, so the
bisected faulting configuration can no longer be constructed. The
backward rebuilds c via ``_cseq_kernel``. Validation 2026-08-19 (v8 on
hardware): every ``profile_step --only=*`` ablation — including
``no-update`` and ``ce-only``, the two compositions that faulted under
v5/v6/v7 — runs clean with fused dispatch ON, as do bench.py's configs
and the CLI drivers. The ``MSA_FUSED_LSTM=0`` kill switch and the
``utils/preflight.py`` canary ladder remain as belt-and-suspenders for
new compositions, no longer load-bearing.

History of the fault class (pre-v8), kept for the record: the faulting
composition was the full-model chained train step whose gradients are
consumed WITHOUT the clip+optimizer
(``scripts/profile_step.py --only=no-update``). Round-3 bisection
(``scripts/debug_lstm_fault.py`` — jnp twins of both kernels swapped in
under the exact faulting composition, each in a fresh process):

==========  ===========================================  ========
variant     composition                                  result
==========  ===========================================  ========
kernel      fwd + bwd Pallas kernels (production)        FAULT
fwdonly     Pallas fwd, pure-jnp bwd                     FAULT
bwdonly     pure-jnp fwd, Pallas bwd                     clean
jnp         both jnp (control)                           clean
fwdnoc      Pallas fwd, its c output UNUSED (jnp c)      clean
fwdbar      fwdonly + optimization_barrier on (h, c)     FAULT
kernelbar   production + optimization_barrier            FAULT
==========  ===========================================  ========

So: the FORWARD kernel faults iff its c_seq output is consumed
downstream, independent of c's layout (the original 5-D (S,2,T,B,H)
and the v5 packed 4-D (S,T,B,2H) both fault), not fixed by a barrier,
not the duplicated operand (forced copy faults). A minimal kernel-only
chained repro (``scripts/repro_lstm_minimal.py`` — the 2-layer stack
under the same per-leaf grad consumption, leaf/sync/fwd variants) runs
CLEAN, so the trigger additionally requires the full model's
surrounding XLA schedule. Every production program — the vloso fused
trainer (fp32 + bf16, 20-epoch invocations), the phased fused/loop and
vectorized-phased paths, serving, and the CLI drivers — runs repeatedly
clean (re-validated with v5: ``profile_step --only=full`` 51.7 ms), as
do the interpret-mode parity tests. v6 status (2026-08-18): the same
artificial ``--only=no-update`` composition still faulted with the v6
xproj kernels (split backward emitting dxp), while ``--only=full``,
bench.py (all four configs), and the CLI drivers ran clean. v7 status
(2026-08-18): the faulting ablation MOVED — ``--only=no-update`` runs
CLEAN with the in-kernel-reductions backward (34.2 ms/step,
repeatedly), but ``--only=ce-only`` (contrastive losses dropped from
the objective, another profiling-only composition) now crashes the TPU
worker; with the day's full graph (v7 + eval-stem dispatch + InfoNCE
VJP fix) ce-only faults under BOTH the v7 default and the
``MSA_LSTM_XPROJ=0`` (v5) revert, and is clean under
``MSA_LSTM_BWDC=0`` (42.5 ms/step) — i.e. fault membership shifts with
ANY graph change, not specifically the LSTM revision. Separately,
wiring the stacked multi-InfoNCE kernel into the model made
``--only=full`` itself fault (reverted to opt-in; see
``kernels/contrastive.py``). Every production composition
(``--only=full`` with the default graph, bench.py's four configs, the
CLI drivers) is validated clean per revision. Conclusion unchanged and
reinforced: an XLA-schedule-dependent runtime interaction outside the
kernels' own code. Mitigations if a NEW composition hits it:
``MSA_FUSED_LSTM=0`` (all-jnp), ``MSA_LSTM_BWDC=0`` (v6 split
backward), or ``MSA_LSTM_XPROJ=0`` (v5). Conclusion: an XLA-schedule-
dependent runtime interaction (likely in the tunnel/Mosaic runtime)
outside the kernel's own code. Mitigations if a NEW composition hits
it: the ``MSA_FUSED_LSTM=0`` env kill switch, or
``ops.rnn.enable_fused_dispatch(False)``. To validate a new composition
BEFORE committing to a long run (a device fault poisons the client
process), use the subprocess canary harness
``utils/preflight.py::ensure_safe_dispatch`` / the CLI ``--preflight``
flag — it walks the mitigation ladder above in disposable subprocesses
and applies the first clean rung.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v6 (in-kernel input projection) kill switch: MSA_LSTM_XPROJ=0 reverts
# fused_bilstm_layer to the v5 two-pass form (XLA projection + xp-streaming
# kernel) without touching code.
_XPROJ_ENABLED = os.environ.get("MSA_LSTM_XPROJ", "1") != "0"

# v7 (in-kernel backward reductions) kill switch: MSA_LSTM_BWDC=0 reverts
# the xproj backward to the v6 split (kernel emits packed gate grads dxp,
# XLA reduces dW_ih/dW_hh/dx/db from it).
_BWDC_ENABLED = os.environ.get("MSA_LSTM_BWDC", "1") != "0"

# v9 (segmented merged backward): the reverse sweep processes K-step
# time segments per grid step — c is rebuilt in-kernel from per-segment
# boundary checkpoints (the full c_seq tensor never exists) and the
# gate/dx/dW dots are batched over the segment. MSA_LSTM_SEGBWD=0
# reverts to the v8 two-kernel backward (full c_seq rebuild + per-step
# reverse sweep). MSA_LSTM_SEGK overrides the segment length.
_SEGBWD_ENABLED = os.environ.get("MSA_LSTM_SEGBWD", "1") != "0"
# Segment length: the flagship (K, Bb) sweep (scripts/bench_segbwd_tune.py,
# v5e 2026-08-19, 2-layer f+bwd chained) measured K=2/Bb=64 best in BOTH
# dtypes — fp32 10.327 (v8) -> 9.122 ms (1.13x), bf16 9.377 -> 8.349
# (1.12x); K=4/Bb=32 close behind (1.11x/1.10x); K=4/Bb=16 a 0.91x LOSS
# (half-empty serial dots + 4 batch-block sweeps) and K=8 a wash. Batch
# block beats segment length: the win is the c-traffic elimination plus
# fewer grid steps, not bigger gate dots.
_SEG_K = int(os.environ.get("MSA_LSTM_SEGK", "2"))
# Boundary-sweep time block (v9.1): the sweep's gate dots have no
# recurrent dependence, so they CAN batch over MSA_LSTM_CBNDK rows per
# grid step (rounded up to a multiple of _SEG_K); 0 selects the per-step
# form. MEASURED NEGATIVE (default off, 2026-08-19): full step 38.04 ms
# with KC=4 vs 37.87 ms per-step; in-situ B=128 bench 48.3k vs 49.1k
# samples/s; and at fp32 B=256 the KC-wide x/h/out windows exceed the
# 128M scoped-VMEM budget (the sweep has no batch blocking) — compile
# fails. The sweep moves no HBM traffic, so its fewer-grid-steps win is
# pure overhead that the step's schedule already hides (see CLAUDE.md
# "standalone wins compress in situ").
_CBND_K = int(os.environ.get("MSA_LSTM_CBNDK", "0"))

# MEASURED NEGATIVE (default off): casting the float32 state/grad
# operands (h, dgates, h_prev) to bfloat16 at the DOT INPUTS — hoping
# the MXU would run bf16-rate instead of mixed-precision rate — is a
# wash on hardware (v5e 2026-08-18, bench_lstm_xproj_e2e bf16 rows:
# f+b 8.71 ms cast vs 8.69 ms full-precision; fwd 2.16 vs 2.22). The
# per-step dots are latency/streaming-bound at these shapes, not
# operand-rate-bound, so the kernels keep full-precision operands (and
# the tighter numerics). MSA_LSTM_BF16_DOTS=1 re-enables the cast.
_BF16_DOTS_ENABLED = os.environ.get("MSA_LSTM_BF16_DOTS", "0") == "1"


def _dot_op(v, out_dtype):
    """Cast a float32 dot operand to bf16 when the layer computes in bf16
    (and the toggle is on); identity otherwise."""
    if _BF16_DOTS_ENABLED and out_dtype == jnp.bfloat16:
        return v.astype(jnp.bfloat16)
    return v


def enable_bwdc(on: bool) -> bool:
    """Toggle the v7 in-kernel backward reductions; returns the old value."""
    global _BWDC_ENABLED
    old = _BWDC_ENABLED
    _BWDC_ENABLED = bool(on)
    return old


def enable_segbwd(on: bool) -> bool:
    """Toggle the v9 segmented merged backward; returns the old value."""
    global _SEGBWD_ENABLED
    old = _SEGBWD_ENABLED
    _SEGBWD_ENABLED = bool(on)
    return old


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _time_map(d, t, T):
    """Actual-time index for direction d at recurrence step t (direction 1
    runs over reversed time; the flip lives here, not in a copied array)."""
    return jnp.where(d == 0, t, T - 1 - t)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(xp_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr):
    """Grid (2, T), time innermost; the whole model axis S is in the block.

    Blocks: xp (S,1,B,4H) — the direction's 4H half of the packed
    (T,B,8H) projection at its actual-time index (the direction select is
    LANE blocking in the BlockSpec, so no (2,T,B,4H) copy ever exists);
    whh (S,1,H,4H); h_seq AND c_seq out (S,1,B,H) into packed (T,B,2H)
    layouts (both outputs share the same lane-blocked spec). h/c live in
    (S,B,H) float32 scratch across the T sweep and reset when a direction
    starts."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    # all models' recurrent matmuls as ONE batched dot (S batch dim).
    # Runtime matches a per-model unrolled loop (the MXU chain is the
    # same) but Mosaic compiles this form ~120x faster (3.7 s vs 451 s
    # for the 24-dot unrolled body at the flagship shape).
    rec = jax.lax.dot_general(
        h_scr[...], whh_ref[:, 0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    # vectorized gate math over all models at once (VPU)
    gates = rec + xp_ref[:, 0].astype(jnp.float32)
    hidden = h_scr.shape[-1]
    i = _sigmoid(gates[..., :hidden])
    f = _sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = _sigmoid(gates[..., 3 * hidden:])
    c = f * c_scr[...] + i * g
    h = o * jnp.tanh(c)
    h_scr[...] = h
    c_scr[...] = c
    hs_ref[:, 0] = h.astype(hs_ref.dtype)
    cs_ref[:, 0] = c.astype(cs_ref.dtype)


def _fwd_call(xp: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool):
    """xp (S, T, B, 8H) packed [fwd|bwd] projections, actual-time order;
    w_hh (S, 2, H, 4H). Returns h_seq AND c_seq as packed (S, T, B, 2H)
    [fwd|bwd] actual-time layouts (c_seq float32). v5: c_seq shares h's
    4-D lane-blocked layout — the earlier 5-D (S,2,T,B,H) c output was
    implicated in a runtime device fault under one gradient-consumption
    composition (see module "Known issue"), and one layout family for
    both outputs is simpler anyway."""
    S, T, B, G2 = xp.shape
    G = G2 // 2
    H = G // 4

    # direction d reads/writes the d-th lane block of the packed last dim
    xmap = lambda d, t: (0, _time_map(d, t, T), 0, d)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(2, T),
        in_specs=[
            pl.BlockSpec((S, 1, B, G), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, H, G), lambda d, t: (0, d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, 1, B, H), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, B, H), xmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, B, 2 * H), xp.dtype),
            jax.ShapeDtypeStruct((S, T, B, 2 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, B, H), jnp.float32),
            pltpu.VMEM((S, B, H), jnp.float32),
        ],
        # all S models' blocks + scratch exceed the 16 MB default scoped-
        # VMEM budget at the flagship shape (~22.5 MB incl. double
        # buffering); v5e has 128 MB of VMEM — raise the cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w_hh)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(dh_ref, xp_ref, hprev_ref, ccur_ref, cprev_ref,
                whh_ref, whht_ref, dxp_ref, dh_scr, dc_scr,
                *, T: int):
    """Grid (2, T): step tau walks the recurrence in reverse. Recomputes
    the gates from xp + h_prev instead of storing them. Boundary (first
    recurrence step) zeroes h_prev/c_prev."""
    tau = pl.program_id(1)

    @pl.when(tau == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    first = tau == T - 1  # recurrence step 0: no previous state
    h_prev = jnp.where(first, 0.0, hprev_ref[:, 0].astype(jnp.float32))
    c_prev = jnp.where(first, 0.0, cprev_ref[:, 0])

    rec = jax.lax.dot_general(  # batched over S — see forward kernel note
        h_prev, whh_ref[:, 0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    gates = rec + xp_ref[:, 0].astype(jnp.float32)
    hidden = dh_scr.shape[-1]
    i = _sigmoid(gates[..., :hidden])
    f = _sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = _sigmoid(gates[..., 3 * hidden:])

    dh = dh_ref[:, 0].astype(jnp.float32) + dh_scr[...]
    tc = jnp.tanh(ccur_ref[:, 0])
    do = dh * tc
    dc = dc_scr[...] + dh * o * (1.0 - tc * tc)
    di = dc * g
    dg = dc * i
    df = dc * c_prev
    dc_scr[...] = dc * f

    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )

    dh_scr[...] = jax.lax.dot_general(
        dgates, whht_ref[:, 0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dxp_ref[:, 0] = dgates.astype(dxp_ref.dtype)


def _bwd_call(dh_seq, xp, h_seq, c_seq, w_hh, interpret: bool):
    """Reverse sweep. dh_seq/h_seq/c_seq are packed (S, T, B, 2H), xp is
    packed (S, T, B, 8H). Returns dxp packed (S, T, B, 8H) float32,
    actual-time order."""
    S, T, B, G2 = xp.shape
    G = G2 // 2
    H = G // 4

    # actual time of reverse step tau, per direction
    a = lambda d, tau: _time_map(d, T - 1 - tau, T)
    # actual time of the PREVIOUS recurrence step (clamped; the kernel
    # zeroes it at the boundary)
    prev = lambda d, tau: jnp.clip(
        jnp.where(d == 0, a(d, tau) - 1, a(d, tau) + 1), 0, T - 1
    )

    amap = lambda d, tau: (0, a(d, tau), 0, d)       # packed-lane layouts
    pmap = lambda d, tau: (0, prev(d, tau), 0, d)
    wmap = lambda d, tau: (0, d, 0, 0)

    return pl.pallas_call(
        functools.partial(_bwd_kernel, T=T),
        grid=(2, T),
        in_specs=[
            pl.BlockSpec((S, 1, B, H), amap, memory_space=pltpu.VMEM),   # dh
            pl.BlockSpec((S, 1, B, G), amap, memory_space=pltpu.VMEM),   # xp
            pl.BlockSpec((S, 1, B, H), pmap, memory_space=pltpu.VMEM),   # h_prev
            pl.BlockSpec((S, 1, B, H), amap, memory_space=pltpu.VMEM),   # c_cur
            pl.BlockSpec((S, 1, B, H), pmap, memory_space=pltpu.VMEM),   # c_prev
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),   # whh
            pl.BlockSpec((S, 1, G, H), wmap, memory_space=pltpu.VMEM),   # whh^T
        ],
        out_specs=pl.BlockSpec((S, 1, B, G), amap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, T, B, G2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, B, H), jnp.float32),
            pltpu.VMEM((S, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(dh_seq, xp, h_seq, c_seq, c_seq, w_hh, jnp.swapaxes(w_hh, 2, 3))


# ---------------------------------------------------------------------------
# v6: in-kernel input projection — stream the RAW input x instead of the
# precomputed projections
# ---------------------------------------------------------------------------
#
# The v5 form streams the packed projection xp (S,T,B,8H): 4x the raw
# input x (S,T,B,I at the flagship I=256=2H). bench_lstm_dirmerge.py
# showed the forward kernel sits at its xp-streaming bound, so v6 moves
# the projection INSIDE the kernel: each grid step adds one batched
# x_t @ W_ih dot to the recurrent dot and the (B,T,8H) projection tensor
# is never materialized at all — the XLA projection pass (read x, write
# xp) and the kernel's xp streaming both disappear. Hardware A/B
# (scripts/bench_lstm_inkernel_proj.py, v5e 2026-08-17, single layer fwd
# chained + host-sync): production (XLA proj + v5 kernel) 2.920 ms,
# in-kernel two-dot form 1.745 ms — 1.67x. The backward recomputes the
# gates from x the same way (streams x, 4x smaller than xp) and still
# emits packed per-step gate gradients; the big dW_ih/dW_hh/dx/db
# reductions stay in XLA where they run at MXU rate on (T*B)-wide
# operands. Requires the input width I to be lane-aligned (%128); the
# flagship hits this in both layers (layer 1 I=256, layer 2 I=2H=256) —
# unaligned widths fall back to the v5 path.


def _fwd_xproj_kernel(x_ref, wih_ref, whh_ref, b_ref, hs_ref,
                      h_scr, c_scr):
    """Grid (2, T), time innermost, model axis S in the block. Blocks:
    x (S,1,B,I) at the direction's actual-time index; wih (S,1,I,4H);
    whh (S,1,H,4H); b (S,1,1,4H); h_seq out (S,1,B,H) into a packed
    (T,B,2H) lane-blocked layout. v8: h_seq is the ONLY output — c is
    carried in scratch and never leaves the kernel (the backward
    recomputes it; see `_cseq_kernel`)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    dn = (((2,), (1,)), ((0,), (0,)))
    # two batched dots (the lane-concatenated single-dot form measured 7%
    # slower and needs a materialized [W_ih; W_hh] concat); x stays in its
    # native dtype so bf16 inputs hit the MXU at bf16 rate, accumulating
    # fp32 via preferred_element_type; in bf16 mode the fp32 h carry is
    # cast at the dot input too (_dot_op) so the chain dot runs bf16-rate.
    gates = jax.lax.dot_general(
        x_ref[:, 0], wih_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        _dot_op(h_scr[...], hs_ref.dtype), whh_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + b_ref[:, 0].astype(jnp.float32)

    hidden = h_scr.shape[-1]
    i = _sigmoid(gates[..., :hidden])
    f = _sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = _sigmoid(gates[..., 3 * hidden:])
    c = f * c_scr[...] + i * g
    h = o * jnp.tanh(c)
    h_scr[...] = h
    c_scr[...] = c
    hs_ref[:, 0] = h.astype(hs_ref.dtype)


def _fwd_xproj_call(x, w_ih, w_hh, b, interpret: bool):
    """x (S,T,B,I) actual-time; w_ih (S,2,I,4H); w_hh (S,2,H,4H);
    b (S,2,1,4H) per-direction summed biases. Returns packed h_seq
    (S,T,B,2H) in x.dtype — the kernel's only output (v8)."""
    S, T, B, I = x.shape
    G = w_hh.shape[-1]
    H = G // 4

    xmap = lambda d, t: (0, _time_map(d, t, T), 0, 0)
    omap = lambda d, t: (0, _time_map(d, t, T), 0, d)
    wmap = lambda d, t: (0, d, 0, 0)
    return pl.pallas_call(
        _fwd_xproj_kernel,
        grid=(2, T),
        in_specs=[
            pl.BlockSpec((S, 1, B, I), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, I, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, 1, G), wmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, 1, B, H), omap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, T, B, 2 * H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((S, B, H), jnp.float32),
            pltpu.VMEM((S, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_ih, w_hh, b)


# ---------------------------------------------------------------------------
# v8: c-recompute sweep — the backward rebuilds c_seq from (x, h_seq,
# weights), so the forward kernel never emits c at all
# ---------------------------------------------------------------------------
#
# Round-3 bisection (module "Known issue", scripts/debug_lstm_fault.py)
# proved the XLA-schedule-dependent device fault triggers iff the FORWARD
# kernel's c_seq output is consumed downstream (`fwdnoc` clean, layout- and
# barrier-independent). v8 closes that class by construction: the forward
# emits ONLY h_seq, and the VJP backward first runs this forward-order
# sweep to rebuild c. The gates at step t depend only on STORED tensors
# (x_t and h_{t-1} from h_seq) — there is no matmul recurrence here, just
# the elementwise c carry — so in fp32 the recomputed c is bit-identical
# to what the forward computed (same dots, same op order). Side benefits:
# the forward saves the c_seq HBM write, and c_seq is no longer a VJP
# residual XLA must keep live across the whole model (peak-HBM win).
# In bf16 compute mode the recomputed c differs from the forward's
# internal fp32 carry by the h_seq storage rounding — the same rounding
# the v7 backward's gate recompute already accepted.


def _cseq_kernel(x_ref, hprev_ref, wih_ref, whh_ref, b_ref, cs_ref, c_scr):
    """Grid (2, T), FORWARD time order. Recomputes c_t = f_t*c_{t-1} +
    i_t*g_t with gates from x_t + h_{t-1} (h streamed from the stored
    h_seq — no recurrent dependency through the dots)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_scr[...] = jnp.zeros_like(c_scr)

    h_prev = jnp.where(t == 0, 0.0, hprev_ref[:, 0].astype(jnp.float32))

    dn = (((2,), (1,)), ((0,), (0,)))
    cdt = x_ref.dtype
    gates = jax.lax.dot_general(
        x_ref[:, 0], wih_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        _dot_op(h_prev, cdt), whh_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + b_ref[:, 0].astype(jnp.float32)

    hidden = c_scr.shape[-1]
    i = _sigmoid(gates[..., :hidden])
    f = _sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    c = f * c_scr[...] + i * g
    c_scr[...] = c
    cs_ref[:, 0] = c


def _cseq_call(x, h_seq, w_ih, w_hh, b, interpret: bool):
    """Rebuild packed c_seq (S,T,B,2H) float32 from the stored x/h_seq
    (both packed actual-time layouts) and the layer weights."""
    S, T, B, I = x.shape
    G = w_hh.shape[-1]
    H = G // 4

    xmap = lambda d, t: (0, _time_map(d, t, T), 0, 0)
    omap = lambda d, t: (0, _time_map(d, t, T), 0, d)
    # actual time of the PREVIOUS recurrence step (clamped; the kernel
    # zeroes h_prev at t == 0)
    hpmap = lambda d, t: (
        0, jnp.clip(_time_map(d, t - 1, T), 0, T - 1), 0, d)
    wmap = lambda d, t: (0, d, 0, 0)
    return pl.pallas_call(
        _cseq_kernel,
        grid=(2, T),
        in_specs=[
            pl.BlockSpec((S, 1, B, I), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, B, H), hpmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, I, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, 1, G), wmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, 1, B, H), omap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, T, B, 2 * H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, h_seq, w_ih, w_hh, b)


def _bwd_xproj_kernel(dh_ref, x_ref, hprev_ref, ccur_ref, cprev_ref,
                      wih_ref, whh_ref, whht_ref, b_ref, dxp_ref,
                      dh_scr, dc_scr, *, T: int):
    """Reverse sweep, gates recomputed from the raw input (one extra
    batched x dot replaces streaming the 4x-bigger xp)."""
    tau = pl.program_id(1)

    @pl.when(tau == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    first = tau == T - 1
    h_prev = jnp.where(first, 0.0, hprev_ref[:, 0].astype(jnp.float32))
    c_prev = jnp.where(first, 0.0, cprev_ref[:, 0])

    dn = (((2,), (1,)), ((0,), (0,)))
    cdt = x_ref.dtype  # compute dtype: _dot_op casts fp32 operands in bf16 mode
    gates = jax.lax.dot_general(
        x_ref[:, 0], wih_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        _dot_op(h_prev, cdt), whh_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + b_ref[:, 0].astype(jnp.float32)

    hidden = dh_scr.shape[-1]
    i = _sigmoid(gates[..., :hidden])
    f = _sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = _sigmoid(gates[..., 3 * hidden:])

    dh = dh_ref[:, 0].astype(jnp.float32) + dh_scr[...]
    tc = jnp.tanh(ccur_ref[:, 0])
    do = dh * tc
    dc = dc_scr[...] + dh * o * (1.0 - tc * tc)
    di = dc * g
    dg = dc * i
    df = dc * c_prev
    dc_scr[...] = dc * f

    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )

    dh_scr[...] = jax.lax.dot_general(
        _dot_op(dgates, cdt), whht_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    dxp_ref[:, 0] = dgates.astype(dxp_ref.dtype)


def _bwd_xproj_call(dh_seq, x, h_seq, c_seq, w_ih, w_hh, b,
                    interpret: bool):
    """Reverse sweep over packed layouts; streams x instead of xp.
    Returns dxp packed (S,T,B,8H) float32 (per-step gate gradients in
    actual-time order — the same contract as v5's `_bwd_call`)."""
    S, T, B, I = x.shape
    G = w_hh.shape[-1]
    H = G // 4

    a = lambda d, tau: _time_map(d, T - 1 - tau, T)
    prev = lambda d, tau: jnp.clip(
        jnp.where(d == 0, a(d, tau) - 1, a(d, tau) + 1), 0, T - 1
    )

    amap = lambda d, tau: (0, a(d, tau), 0, d)     # packed-lane layouts
    xamap = lambda d, tau: (0, a(d, tau), 0, 0)    # raw input (unpacked)
    pmap = lambda d, tau: (0, prev(d, tau), 0, d)
    wmap = lambda d, tau: (0, d, 0, 0)

    return pl.pallas_call(
        functools.partial(_bwd_xproj_kernel, T=T),
        grid=(2, T),
        in_specs=[
            pl.BlockSpec((S, 1, B, H), amap, memory_space=pltpu.VMEM),   # dh
            pl.BlockSpec((S, 1, B, I), xamap, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((S, 1, B, H), pmap, memory_space=pltpu.VMEM),   # h_prev
            pl.BlockSpec((S, 1, B, H), amap, memory_space=pltpu.VMEM),   # c_cur
            pl.BlockSpec((S, 1, B, H), pmap, memory_space=pltpu.VMEM),   # c_prev
            pl.BlockSpec((S, 1, I, G), wmap, memory_space=pltpu.VMEM),   # wih
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),   # whh
            pl.BlockSpec((S, 1, G, H), wmap, memory_space=pltpu.VMEM),   # whh^T
            pl.BlockSpec((S, 1, 1, G), wmap, memory_space=pltpu.VMEM),   # b
        ],
        out_specs=pl.BlockSpec((S, 1, B, G), amap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, T, B, 2 * G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, B, H), jnp.float32),
            pltpu.VMEM((S, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(dh_seq, x, h_seq, c_seq, c_seq, w_ih, w_hh,
      jnp.swapaxes(w_hh, 2, 3), b)


# ---------------------------------------------------------------------------
# v7: in-kernel backward reductions — dW/db accumulate in the output block,
# dx streams out directly; the packed gate-grad tensor dxp never exists
# ---------------------------------------------------------------------------
#
# v6's backward emits dxp (S,T,B,8H fp32 = 459 MB/layer) which XLA must
# write once and read for every reduction (dW_ih, dW_hh, dx, db). v7 keeps
# all of it in the reverse sweep (hardware A/B
# ``scripts/bench_lstm_bwd_inkernel.py``, v5e 2026-08-18, single layer,
# chained + host-sync: v6 7.70 ms -> v7 5.67 ms f+b, 1.36x):
#
# - dx_t = dgates contracted with W_ih over the gate dim (A @ B^T form —
#   no transposed weight copies in VMEM; the naive wih^T/whh^T inputs blew
#   the 128 MB vmem cap), streamed out packed per-direction as (S,T,B,2I)
#   lane blocks (both directions touch every actual time index, so they
#   cannot share one write; XLA sums the halves, fused into the consumer);
# - dW_cat[d] = sum_t [x_t | h_prev | 1]^T dgates — accumulated in the
#   output block itself (constant block index per direction, so it lives
#   in VMEM across the whole T sweep); the ones-rows make db fall out of
#   the same dot. Rows [:I]=dW_ih, [I:I+H]=dW_hh, [I+H]=db.


def _bwd_bwdc_kernel(dh_ref, x_ref, hprev_ref, ccur_ref, cprev_ref,
                     wih_ref, whh_ref, b_ref, dx_ref, dw_ref,
                     dh_scr, dc_scr, *, T: int):
    nb = pl.program_id(1)  # batch block (v8: windows scale with Bb, not B)
    tau = pl.program_id(2)

    @pl.when(tau == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    first = tau == T - 1
    h_prev = jnp.where(first, 0.0, hprev_ref[:, 0].astype(jnp.float32))
    c_prev = jnp.where(first, 0.0, cprev_ref[:, 0])

    dn = (((2,), (1,)), ((0,), (0,)))
    cdt = x_ref.dtype  # compute dtype: _dot_op casts fp32 operands in bf16 mode
    x = x_ref[:, 0]
    gates = jax.lax.dot_general(
        x, wih_ref[:, 0], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        _dot_op(h_prev, cdt), whh_ref[:, 0], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + b_ref[:, 0].astype(jnp.float32)

    hidden = dh_scr.shape[-1]
    i = _sigmoid(gates[..., :hidden])
    f = _sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = _sigmoid(gates[..., 3 * hidden:])

    dh = dh_ref[:, 0].astype(jnp.float32) + dh_scr[...]
    tc = jnp.tanh(ccur_ref[:, 0])
    do = dh * tc
    dc = dc_scr[...] + dh * o * (1.0 - tc * tc)
    di = dc * g
    dg = dc * i
    df = dc * c_prev
    dc_scr[...] = dc * f

    dgates = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f),
         dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)

    dnt = (((2,), (2,)), ((0,), (0,)))  # contract gate dims: A @ B^T
    dg_op = _dot_op(dgates, cdt)
    dh_scr[...] = jax.lax.dot_general(
        dg_op, whh_ref[:, 0], dimension_numbers=dnt,
        preferred_element_type=jnp.float32,
    )
    dx_ref[:, 0] = jax.lax.dot_general(
        dg_op, wih_ref[:, 0], dimension_numbers=dnt,
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)  # this direction's lane block of packed dx

    # dW rows = [x | h_prev | 1]^T dgates, contracted over B (sublanes);
    # 8 ones-rows keep the sublane count aligned — row I+H is db, the
    # rest are discarded by the caller's slice
    acc_t = dg_op.dtype
    ones = jnp.ones(x.shape[:-1] + (8,), acc_t)
    lhs = jnp.concatenate(
        [x.astype(acc_t), _dot_op(h_prev, cdt).astype(acc_t), ones],
        axis=-1)
    contrib = jax.lax.dot_general(
        lhs, dg_op,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    # the dW block's index map is constant per direction, so it stays
    # resident across the whole (nb, tau) sweep; first visit sets, the
    # rest accumulate (batch blocks sum into dW by definition)
    first_dw = jnp.logical_and(nb == 0, tau == 0)

    @pl.when(first_dw)
    def _():
        dw_ref[:, 0] = contrib

    @pl.when(jnp.logical_not(first_dw))
    def _():
        dw_ref[:, 0] += contrib


# Test hook: force the backward's batch block size (None = pick by VMEM).
_FORCE_BLOCK_B: int | None = None


def _bwdc_vmem_est(s: int, bb: int, i_dim: int, h: int, it: int) -> int:
    """Scoped-VMEM estimate (bytes) for the v8 backward at batch block
    ``bb``. Shape-accurate per-window sum x2 for Mosaic double buffering;
    c windows/accumulators are always float32. The x1.10 calibration for
    spill slots / rounding reproduces the measured 146.43M compiler dump
    at (24, 256, 256, 128, fp32) within 0.1%."""
    G = 4 * h
    est = 2 * (
        s * bb * h * it          # dh window
        + s * bb * i_dim * it    # x window
        + s * bb * h * it        # h_prev window
        + 2 * s * bb * h * 4     # c_cur + c_prev windows (f32)
        + s * bb * i_dim * it    # dx output window
        + s * i_dim * G * it     # w_ih window
        + s * h * G * it         # w_hh window
        + s * G * it             # bias window
        + s * (i_dim + h + 8) * G * 4  # dW output window (f32)
    ) + 2 * s * bb * h * 4       # dh/dc carry scratch (f32)
    return int(est * 1.10)


def pick_block_b(s: int, b: int, i_dim: int, h: int, it: int,
                 budget_bytes: int = 120 << 20) -> int:
    """Largest batch block (divisor of ``b``, multiple of 8) whose v8
    backward fits the scoped-VMEM budget. Halves until it fits; a config
    too big even at block 8 returns 8 and lets the compiler complain."""
    bb = b
    while bb > 8 and bb % 2 == 0 and _bwdc_vmem_est(
            s, bb, i_dim, h, it) > budget_bytes:
        bb //= 2
    return bb


def _bwd_bwdc_call(dh_seq, x, h_seq, c_seq, w_ih, w_hh, b,
                   interpret: bool):
    """Reverse sweep with in-kernel reductions. Returns (dx_pk
    (S,T,B,2I) x.dtype — per-direction lane blocks, sum the halves for
    dx; dw_cat (S,2,I+H+8,4H) float32 — rows [:I]=dW_ih, [I:I+H]=dW_hh,
    [I+H]=db).

    v8: the grid is (2, NB, T) — the batch axis is blocked so every
    double-buffered window scales with the block batch Bb instead of B.
    Each batch block runs its full reverse sweep independently (the
    dh/dc carries are per-sample), and the dW output block accumulates
    across blocks. Bb is the largest divisor of B that fits the scoped-
    VMEM budget (:func:`pick_block_b`), which keeps B<=128 fp32 at one
    block (identical schedule to v7) and runs fp32 B=256 as two blocks
    instead of falling off the VMEM cliff onto the XLA recurrence."""
    S, T, B, I = x.shape
    G = w_hh.shape[-1]
    H = G // 4
    R = I + H + 8
    bb = _FORCE_BLOCK_B or pick_block_b(S, B, I, H, x.dtype.itemsize)
    nb = max(B // bb, 1)
    bb = B // nb

    a = lambda d, n, tau: _time_map(d, T - 1 - tau, T)
    prev = lambda d, n, tau: jnp.clip(
        jnp.where(d == 0, a(d, n, tau) - 1, a(d, n, tau) + 1), 0, T - 1)
    amap = lambda d, n, tau: (0, a(d, n, tau), n, d)
    xamap = lambda d, n, tau: (0, a(d, n, tau), n, 0)
    pmap = lambda d, n, tau: (0, prev(d, n, tau), n, d)
    wmap = lambda d, n, tau: (0, d, 0, 0)

    return pl.pallas_call(
        functools.partial(_bwd_bwdc_kernel, T=T),
        grid=(2, nb, T),
        in_specs=[
            pl.BlockSpec((S, 1, bb, H), amap, memory_space=pltpu.VMEM),   # dh
            pl.BlockSpec((S, 1, bb, I), xamap, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((S, 1, bb, H), pmap, memory_space=pltpu.VMEM),   # h_prev
            pl.BlockSpec((S, 1, bb, H), amap, memory_space=pltpu.VMEM),   # c_cur
            pl.BlockSpec((S, 1, bb, H), pmap, memory_space=pltpu.VMEM),   # c_prev
            pl.BlockSpec((S, 1, I, G), wmap, memory_space=pltpu.VMEM),    # wih
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),    # whh
            pl.BlockSpec((S, 1, 1, G), wmap, memory_space=pltpu.VMEM),    # b
        ],
        out_specs=[
            pl.BlockSpec((S, 1, bb, I), amap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, R, G), wmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, B, 2 * I), x.dtype),
            jax.ShapeDtypeStruct((S, 2, R, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, bb, H), jnp.float32),
            pltpu.VMEM((S, bb, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(dh_seq, x, h_seq, c_seq, c_seq, w_ih, w_hh, b)


# ---------------------------------------------------------------------------
# v9: segmented merged backward — boundary-checkpointed c + K-step segments
# ---------------------------------------------------------------------------
#
# v8's backward materializes the FULL rebuilt c_seq (S,T,B,2H) float32 —
# ~114 MB written by `_cseq_call` and ~2x that streamed back as the
# reverse sweep's c_cur/c_prev windows, per layer per step. v9 keeps the
# v8 structural fix (no c output from the forward) but checkpoints c only
# at K-step segment boundaries (`_cbnd_call`, T/K of the traffic) and the
# reverse sweep (`_segbwd_call`) processes one K-row ACTUAL-TIME block per
# grid step: it rebuilds c inside the segment in registers from the
# boundary value, and the gate / dx / dW dots are batched over the
# segment's K*Bb rows (fewer, bigger MXU ops; only the dgates->Whh^T
# carry dot stays per-step — it is serially dependent). Block alignment:
# segments are actual-time K-blocks, so direction 1 (reversed time)
# traverses rows within a block in reverse — handled by static dual
# slices + `where` selects, never a traced row index. K does not divide
# T=73: the last actual block is partial; its out-of-range rows are
# zeroed at load (so no undefined edge value can reach a real row through
# a contraction) and skipped in the carries via `where` pass-throughs.


def _cbnd_kernel(x_ref, hprev_ref, wih_ref, whh_ref, b_ref, cb_ref, c_scr,
                 *, T: int, K: int):
    """Forward-order c sweep (same math as `_cseq_kernel`) that WRITES only
    segment-boundary values, each into slot a//K: direction 0 stores c at
    actual times a % K == K-1 (slot m holds c[d0, mK+K-1], the entry for
    block m+1), direction 1 at a % K == 0 (slot m holds c[d1, mK], the
    entry for block m-1). Both stores land on the LAST grid step of their
    output window's residency — Pallas writes back a revisited window's
    final contents, so a store early in the residency would be clobbered
    by the un-stored steps after it (measured in interpret mode). The
    never-written slots (d0's last slot; d1's slot 0 entry is never read)
    are masked by consumers."""
    d = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        c_scr[...] = jnp.zeros_like(c_scr)

    h_prev = jnp.where(t == 0, 0.0, hprev_ref[:, 0].astype(jnp.float32))

    dn = (((2,), (1,)), ((0,), (0,)))
    cdt = x_ref.dtype
    gates = jax.lax.dot_general(
        x_ref[:, 0], wih_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        _dot_op(h_prev, cdt), whh_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + b_ref[:, 0].astype(jnp.float32)

    hidden = c_scr.shape[-1]
    i = _sigmoid(gates[..., :hidden])
    f = _sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    c = f * c_scr[...] + i * g
    c_scr[...] = c

    a = _time_map(d, t, T)
    boundary = jnp.where(d == 0, a % K == K - 1, a % K == 0)

    @pl.when(boundary)
    def _():
        cb_ref[:, 0] = c


def _cbnd_call(x, h_seq, w_ih, w_hh, b, K: int, interpret: bool):
    """Segment-boundary c checkpoints (S, NSEG, B, 2H) float32 from the
    stored x/h_seq packed layouts (NSEG = ceil(T/K)). One per-step grid
    (2, T); the DEFAULT. The time-blocked :func:`_cbndk_call` variant
    (gates batched over KC rows, ``MSA_LSTM_CBNDK>0``) is a measured
    e2e negative — see the ``_CBND_K`` note."""
    S, T, B, I = x.shape
    G = w_hh.shape[-1]
    H = G // 4
    nseg = -(-T // K)

    xmap = lambda d, t: (0, _time_map(d, t, T), 0, 0)
    hpmap = lambda d, t: (
        0, jnp.clip(_time_map(d, t - 1, T), 0, T - 1), 0, d)
    wmap = lambda d, t: (0, d, 0, 0)

    def omap(d, t):
        a = _time_map(d, t, T)
        return (0, a // K, 0, d)

    return pl.pallas_call(
        functools.partial(_cbnd_kernel, T=T, K=K),
        grid=(2, T),
        in_specs=[
            pl.BlockSpec((S, 1, B, I), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, B, H), hpmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, I, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, 1, G), wmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, 1, B, H), omap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nseg, B, 2 * H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, h_seq, w_ih, w_hh, b)


def _cbndk_kernel(x_ref, h_ref, hb_ref, wih_ref, whh_ref, b_ref, cb_ref,
                  c_scr, *, T: int, KC: int, KS: int, NT: int):
    """Time-blocked boundary sweep: grid (2, NT), KC actual-time rows per
    step. The gates have no recurrent dependence (stored x + h_seq), so
    both gate dots batch over the block's KC*B rows; only the elementwise
    c carry walks the rows. Each block writes its KC/KS boundary slots
    (all visited exactly once — no revisit-residency hazards)."""
    d = pl.program_id(0)
    g = pl.program_id(1)
    m = jnp.where(d == 0, g, NT - 1 - g)  # recurrence-order block visit

    @pl.when(g == 0)
    def _():
        c_scr[...] = jnp.zeros_like(c_scr)

    S, _, B, H = h_ref.shape
    I = x_ref.shape[-1]
    G = whh_ref.shape[-1]
    cdt = x_ref.dtype

    rows = m * KC + jax.lax.broadcasted_iota(jnp.int32, (1, KC, 1, 1), 1)
    rmask = rows < T
    x = jnp.where(rmask, x_ref[...], 0)
    h = jnp.where(rmask, h_ref[...], 0).astype(jnp.float32)

    first_blk = g == 0
    hb = jnp.where(first_blk, 0.0, hb_ref[:, 0].astype(jnp.float32))
    hp = jnp.where(
        d == 0,
        jnp.concatenate([hb[:, None], h[:, :KC - 1]], axis=1),
        jnp.concatenate([h[:, 1:], hb[:, None]], axis=1),
    )

    dn = (((2,), (1,)), ((0,), (0,)))
    gates = (jax.lax.dot_general(
        x.reshape(S, KC * B, I), wih_ref[:, 0], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        _dot_op(hp.reshape(S, KC * B, H), cdt), whh_ref[:, 0],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ) + b_ref[:, 0].astype(jnp.float32)).reshape(S, KC, B, G)

    cvals = []  # by recurrence index r (block row r for d=0, KC-1-r for d=1)
    ccur = c_scr[...]
    for r in range(KC):
        gr = jnp.where(d == 0, gates[:, r], gates[:, KC - 1 - r])
        i = _sigmoid(gr[..., :H])
        f = _sigmoid(gr[..., H:2 * H])
        gg = jnp.tanh(gr[..., 2 * H:3 * H])
        a_r = m * KC + jnp.where(d == 0, r, KC - 1 - r)
        cnext = f * ccur + i * gg
        ccur = jnp.where(a_r < T, cnext, ccur)
        cvals.append(ccur)
    c_scr[...] = ccur

    # slot j of this block holds c at local row j*KS+KS-1 (d=0: the entry
    # for the NEXT seg block) or j*KS (d=1: the entry for the PREVIOUS);
    # block row k maps to recurrence index k (d=0) or KC-1-k (d=1)
    for j in range(KC // KS):
        v0 = cvals[j * KS + KS - 1]
        v1 = cvals[KC - 1 - j * KS]
        cb_ref[:, j] = jnp.where(d == 0, v0, v1)


def _cbndk_call(x, h_seq, w_ih, w_hh, b, K: int, interpret: bool):
    """Time-blocked boundary checkpoints; same output contract as
    :func:`_cbnd_call`. Opt-in via ``MSA_LSTM_CBNDK>0`` — a measured
    e2e negative at every config (see the ``_CBND_K`` note) and WITHOUT
    batch blocking: at fp32 B=256 its windows exceed scoped VMEM."""
    S, T, B, I = x.shape
    G = w_hh.shape[-1]
    H = G // 4
    nseg = -(-T // K)
    kc = max(_CBND_K // K, 1) * K  # block rows, a multiple of the segment
    nt = -(-T // kc)
    sb = kc // K

    xmap = lambda d, g: (0, jnp.where(d == 0, g, nt - 1 - g), 0, 0)
    hmap = lambda d, g: (0, jnp.where(d == 0, g, nt - 1 - g), 0, d)

    def hbmap(d, g):
        m = jnp.where(d == 0, g, nt - 1 - g)
        t = jnp.where(d == 0, m * kc - 1, (m + 1) * kc)
        return (0, jnp.clip(t, 0, T - 1), 0, d)

    wmap = lambda d, g: (0, d, 0, 0)

    return pl.pallas_call(
        functools.partial(_cbndk_kernel, T=T, KC=kc, KS=K, NT=nt),
        grid=(2, nt),
        in_specs=[
            pl.BlockSpec((S, kc, B, I), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, kc, B, H), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, B, H), hbmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, I, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, 1, G), wmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, sb, B, H), hmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nseg, B, 2 * H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x, h_seq, h_seq, w_ih, w_hh, b)


def _segbwd_kernel(dh_ref, x_ref, h_ref, hb_ref, cb_ref,
                   wih_ref, whh_ref, b_ref, dx_ref, dw_ref,
                   dg_scr, dh_scr, dc_scr,
                   *, T: int, K: int, NSEG: int):
    """Reverse sweep over K-row actual-time segments. Grid (2, NB, NSEG);
    direction 0 visits blocks last-to-first (its recurrence ends at
    a=T-1), direction 1 first-to-last. Within a block, recurrence-order
    row r maps to block row r (d=0) or K-1-r (d=1) via static dual
    slices + selects."""
    d = pl.program_id(0)
    n = pl.program_id(1)
    g = pl.program_id(2)
    m = jnp.where(d == 0, NSEG - 1 - g, g)
    # recurrence START segment (c/h entries are the zero state): block 0
    # for d=0 and block NSEG-1 for d=1 — both at g == NSEG-1
    first_seg = g == NSEG - 1

    @pl.when(g == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    S, _, bb, hidden = dh_ref.shape
    I = x_ref.shape[-1]
    G = whh_ref.shape[-1]
    cdt = x_ref.dtype

    # zero the partial last block's out-of-range rows AT LOAD: undefined
    # edge values must never reach a real row through a contraction
    # (NaN * 0 == NaN)
    rows = m * K + jax.lax.broadcasted_iota(jnp.int32, (1, K, 1, 1), 1)
    rmask = rows < T
    x = jnp.where(rmask, x_ref[...], 0)
    h = jnp.where(rmask, h_ref[...], 0).astype(jnp.float32)
    dh_in = jnp.where(rmask, dh_ref[...], 0).astype(jnp.float32)

    # h_prev rows: shift h by one actual step toward the recurrence
    # past. Row edges: d=0 row 0 takes the previous block's last row
    # (streamed window), d=1 row K-1 takes the next block's first row.
    # Both edge windows are the zero state at the recurrence start; and
    # d=1 rows whose successor is out of range (a+1 >= T) are exactly
    # the zeroed rmask rows of h, which is the correct zero h_prev.
    hb = jnp.where(first_seg, 0.0, hb_ref[:, 0].astype(jnp.float32))
    hp = jnp.where(
        d == 0,
        jnp.concatenate([hb[:, None], h[:, :K - 1]], axis=1),
        jnp.concatenate([h[:, 1:], hb[:, None]], axis=1),
    )

    # segment-batched gate dots over all K rows at once
    dn = (((2,), (1,)), ((0,), (0,)))
    xk = x.reshape(S, K * bb, I)
    hpk = _dot_op(hp.reshape(S, K * bb, hidden), cdt)
    gates = (jax.lax.dot_general(
        xk, wih_ref[:, 0], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        hpk, whh_ref[:, 0], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + b_ref[:, 0].astype(jnp.float32)).reshape(S, K, bb, G)

    def sel(t, r):
        """Recurrence-order row r of a (S, K, bb, ·) block tensor."""
        return jnp.where(d == 0, t[:, r], t[:, K - 1 - r])

    def a_of(r):
        return m * K + jnp.where(d == 0, r, K - 1 - r)

    # forward-order c rebuild within the segment (registers); masked
    # rows pass the carry through untouched, so the partial block's
    # garbage rows never pollute a real row's c (they precede the real
    # rows only for d=1, whose entry carry is the zero state anyway)
    c_entry = jnp.where(first_seg, 0.0, cb_ref[:, 0])
    gate_rows, cvals = [], []
    ccur = c_entry
    for r in range(K):
        gr = sel(gates, r)
        i = _sigmoid(gr[..., :hidden])
        f = _sigmoid(gr[..., hidden:2 * hidden])
        gg = jnp.tanh(gr[..., 2 * hidden:3 * hidden])
        o = _sigmoid(gr[..., 3 * hidden:])
        cnext = f * ccur + i * gg
        ccur = jnp.where(a_of(r) < T, cnext, ccur)
        gate_rows.append((i, f, gg, o))
        cvals.append(ccur)

    # reverse-order gradient pass; only the dgates @ Whh^T carry dot is
    # per-step (serial dependence) — dx and dW batch over the segment
    dnt = (((2,), (2,)), ((0,), (0,)))
    dhc = dh_scr[...]
    dcc = dc_scr[...]
    for r in range(K - 1, -1, -1):
        real = a_of(r) < T
        i, f, gg, o = gate_rows[r]
        dh_t = sel(dh_in, r) + dhc
        tc = jnp.tanh(cvals[r])
        do = dh_t * tc
        dc = dcc + dh_t * o * (1.0 - tc * tc)
        di = dc * gg
        dg = dc * i
        df = dc * (cvals[r - 1] if r > 0 else c_entry)
        dgates = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dg * (1.0 - gg * gg), do * o * (1.0 - o)], axis=-1)
        dgates = jnp.where(real, dgates, 0.0)
        dg_op = _dot_op(dgates, cdt)
        dhc = jnp.where(real, jax.lax.dot_general(
            dg_op, whh_ref[:, 0], dimension_numbers=dnt,
            preferred_element_type=jnp.float32,
        ), dhc)
        dcc = jnp.where(real, dc * f, dcc)

        @pl.when(d == 0)
        def _(r=r, v=dgates):
            dg_scr[:, r] = v

        @pl.when(d != 0)
        def _(r=r, v=dgates):
            dg_scr[:, K - 1 - r] = v

    dh_scr[...] = dhc
    dc_scr[...] = dcc

    # segment-batched reductions (masked rows are zero in BOTH operands)
    dgk = _dot_op(dg_scr[...].reshape(S, K * bb, G), cdt)
    dx = jax.lax.dot_general(
        dgk, wih_ref[:, 0], dimension_numbers=dnt,
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.reshape(S, K, bb, I).astype(dx_ref.dtype)

    acc_t = dgk.dtype
    ones_rows = jnp.where(
        rmask, jnp.ones((1, K, 1, 1), jnp.float32), 0.0
    ) * jnp.ones((S, K, bb, 8), jnp.float32)
    lhs = jnp.concatenate(
        [xk.astype(acc_t), hpk.astype(acc_t),
         ones_rows.reshape(S, K * bb, 8).astype(acc_t)], axis=-1)
    contrib = jax.lax.dot_general(
        lhs, dgk,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    first_dw = jnp.logical_and(n == 0, g == 0)

    @pl.when(first_dw)
    def _():
        dw_ref[:, 0] = contrib

    @pl.when(jnp.logical_not(first_dw))
    def _():
        dw_ref[:, 0] += contrib


def _segbwd_vmem_est(s: int, bb: int, k: int, i_dim: int, h: int,
                     it: int) -> int:
    """Scoped-VMEM estimate (bytes) for the v9 backward at batch block
    ``bb`` and segment ``k``: shape-accurate per-window sum x2 for Mosaic
    double buffering, plus the register-resident segment intermediates
    (gates block + per-row gate/c lists), x1.10 calibration as in
    :func:`_bwdc_vmem_est`."""
    G = 4 * h
    win = 2 * (
        s * k * bb * h * it        # dh window
        + s * k * bb * i_dim * it  # x window
        + s * k * bb * h * it      # h window
        + s * bb * h * it          # h boundary window
        + s * bb * h * 4           # c boundary window (f32)
        + s * k * bb * i_dim * it  # dx output window
        + s * i_dim * G * it       # w_ih window
        + s * h * G * it           # w_hh window
        + s * G * it               # bias window
        + s * (i_dim + h + 8) * G * 4  # dW output window (f32)
    )
    scr = (
        s * k * bb * G * 4         # dgates scratch (f32)
        + 2 * s * bb * h * 4       # dh/dc carries (f32)
    )
    regs = (
        s * k * bb * G * 4         # gates block (f32)
        + 5 * k * s * bb * h * 4   # per-row i/f/g/o/c lists (f32)
    )
    return int((win + scr + regs) * 1.10)


def pick_block_b_seg(s: int, b: int, k: int, i_dim: int, h: int, it: int,
                     budget_bytes: int = 127 << 20) -> int:
    """Largest batch block (divisor of ``b``, multiple of 8) whose v9
    backward fits the scoped-VMEM budget at segment length ``k``. The
    budget sits just under the kernel's 128M ``vmem_limit_bytes`` — the
    flagship winner (K=2, Bb=64 fp32, est 126M) compiles and runs on
    hardware, and the tuning sweep showed halving Bb for headroom costs
    more than it saves (Bb=16 was a measured 0.91x LOSS vs v8)."""
    bb = b
    while bb > 8 and bb % 2 == 0 and _segbwd_vmem_est(
            s, bb, k, i_dim, h, it) > budget_bytes:
        bb //= 2
    return bb


def _segbwd_call(dh_seq, x, h_seq, c_bnd, w_ih, w_hh, b, K: int,
                 interpret: bool):
    """v9 reverse sweep; same outputs as :func:`_bwd_bwdc_call`
    (dx_pk (S,T,B,2I) x.dtype, dw_cat (S,2,I+H+8,4H) float32) but takes
    the (S,NSEG,B,2H) boundary checkpoints instead of a full c_seq."""
    S, T, B, I = x.shape
    G = w_hh.shape[-1]
    H = G // 4
    R = I + H + 8
    nseg = -(-T // K)
    bb = _FORCE_BLOCK_B or pick_block_b_seg(S, B, K, I, H, x.dtype.itemsize)
    nb = max(B // bb, 1)
    bb = B // nb

    m_of = lambda d, g: jnp.where(d == 0, nseg - 1 - g, g)
    seqmap = lambda d, n, g: (0, m_of(d, g), n, d)
    xmap = lambda d, n, g: (0, m_of(d, g), n, 0)
    wmap = lambda d, n, g: (0, d, 0, 0)

    def hbmap(d, n, g):
        m = m_of(d, g)
        t = jnp.where(d == 0, m * K - 1, (m + 1) * K)
        return (0, jnp.clip(t, 0, T - 1), n, d)

    def cbmap(d, n, g):
        m = m_of(d, g)
        return (0, jnp.where(d == 0, jnp.maximum(m - 1, 0),
                             jnp.minimum(m + 1, nseg - 1)), n, d)

    return pl.pallas_call(
        functools.partial(_segbwd_kernel, T=T, K=K, NSEG=nseg),
        grid=(2, nb, nseg),
        in_specs=[
            pl.BlockSpec((S, K, bb, H), seqmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, bb, I), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K, bb, H), seqmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, bb, H), hbmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, bb, H), cbmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, I, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, H, G), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, 1, G), wmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, K, bb, I), seqmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1, R, G), wmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, T, B, 2 * I), x.dtype),
            jax.ShapeDtypeStruct((S, 2, R, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, K, bb, G), jnp.float32),
            pltpu.VMEM((S, bb, H), jnp.float32),
            pltpu.VMEM((S, bb, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(dh_seq, x, h_seq, h_seq, c_bnd, w_ih, w_hh, b)


# ---------------------------------------------------------------------------
# custom_vmap wrappers: the trainer's vmap over models maps to the S axis
# of ONE kernel launch instead of a sequential grid dimension
# ---------------------------------------------------------------------------

def _bcast(x, axis_size):
    return jnp.broadcast_to(x[None], (axis_size,) + x.shape)


@functools.lru_cache(maxsize=2)
def _make_vm(interpret: bool):
    @custom_vmap
    def vm_fwd(xp, w_hh):
        # unbatched view: xp (T,B,8H) packed, w_hh (2,H,4H)
        h, c = _fwd_call(xp[None], w_hh[None], interpret)
        return h[0], c[0]

    @vm_fwd.def_vmap
    def _vm_fwd_rule(axis_size, in_batched, xp, w_hh):
        xp = xp if in_batched[0] else _bcast(xp, axis_size)
        w_hh = w_hh if in_batched[1] else _bcast(w_hh, axis_size)
        return _fwd_call(xp, w_hh, interpret), (True, True)

    @custom_vmap
    def vm_bwd(dh, xp, h, c, w_hh):
        return _bwd_call(dh[None], xp[None], h[None], c[None], w_hh[None],
                         interpret)[0]

    @vm_bwd.def_vmap
    def _vm_bwd_rule(axis_size, in_batched, dh, xp, h, c, w_hh):
        args = [
            v if b else _bcast(v, axis_size)
            for v, b in zip((dh, xp, h, c, w_hh), in_batched)
        ]
        return _bwd_call(*args, interpret), True

    return vm_fwd, vm_bwd


@functools.lru_cache(maxsize=2)
def _make_vm_xproj(interpret: bool):
    @custom_vmap
    def vm_fwd(x, w_ih, w_hh, b):
        # unbatched view: x (T,B,I), w_ih (2,I,4H), w_hh (2,H,4H), b (2,1,4H)
        return _fwd_xproj_call(x[None], w_ih[None], w_hh[None], b[None],
                               interpret)[0]

    @vm_fwd.def_vmap
    def _vm_fwd_rule(axis_size, in_batched, x, w_ih, w_hh, b):
        args = [
            v if bt else _bcast(v, axis_size)
            for v, bt in zip((x, w_ih, w_hh, b), in_batched)
        ]
        return _fwd_xproj_call(*args, interpret), True

    @custom_vmap
    def vm_bwd(dh, x, h, c, w_ih, w_hh, b):
        return _bwd_xproj_call(dh[None], x[None], h[None], c[None],
                               w_ih[None], w_hh[None], b[None], interpret)[0]

    @vm_bwd.def_vmap
    def _vm_bwd_rule(axis_size, in_batched, dh, x, h, c, w_ih, w_hh, b):
        args = [
            v if bt else _bcast(v, axis_size)
            for v, bt in zip((dh, x, h, c, w_ih, w_hh, b), in_batched)
        ]
        return _bwd_xproj_call(*args, interpret), True

    @custom_vmap
    def vm_bwdc(dh, x, h, c, w_ih, w_hh, b):
        dx_pk, dw_cat = _bwd_bwdc_call(
            dh[None], x[None], h[None], c[None],
            w_ih[None], w_hh[None], b[None], interpret)
        return dx_pk[0], dw_cat[0]

    @vm_bwdc.def_vmap
    def _vm_bwdc_rule(axis_size, in_batched, dh, x, h, c, w_ih, w_hh, b):
        args = [
            v if bt else _bcast(v, axis_size)
            for v, bt in zip((dh, x, h, c, w_ih, w_hh, b), in_batched)
        ]
        return _bwd_bwdc_call(*args, interpret), (True, True)

    @custom_vmap
    def vm_cseq(x, h, w_ih, w_hh, b):
        return _cseq_call(x[None], h[None], w_ih[None], w_hh[None],
                          b[None], interpret)[0]

    @vm_cseq.def_vmap
    def _vm_cseq_rule(axis_size, in_batched, x, h, w_ih, w_hh, b):
        args = [
            v if bt else _bcast(v, axis_size)
            for v, bt in zip((x, h, w_ih, w_hh, b), in_batched)
        ]
        return _cseq_call(*args, interpret), True

    @custom_vmap
    def vm_cbnd(x, h, w_ih, w_hh, b):
        call = _cbndk_call if _CBND_K > 0 else _cbnd_call
        return call(x[None], h[None], w_ih[None], w_hh[None],
                    b[None], _SEG_K, interpret)[0]

    @vm_cbnd.def_vmap
    def _vm_cbnd_rule(axis_size, in_batched, x, h, w_ih, w_hh, b):
        args = [
            v if bt else _bcast(v, axis_size)
            for v, bt in zip((x, h, w_ih, w_hh, b), in_batched)
        ]
        call = _cbndk_call if _CBND_K > 0 else _cbnd_call
        return call(*args, _SEG_K, interpret), True

    @custom_vmap
    def vm_segbwd(dh, x, h, cb, w_ih, w_hh, b):
        dx_pk, dw_cat = _segbwd_call(
            dh[None], x[None], h[None], cb[None],
            w_ih[None], w_hh[None], b[None], _SEG_K, interpret)
        return dx_pk[0], dw_cat[0]

    @vm_segbwd.def_vmap
    def _vm_segbwd_rule(axis_size, in_batched, dh, x, h, cb, w_ih, w_hh, b):
        args = [
            v if bt else _bcast(v, axis_size)
            for v, bt in zip((dh, x, h, cb, w_ih, w_hh, b), in_batched)
        ]
        return _segbwd_call(*args, _SEG_K, interpret), (True, True)

    return vm_fwd, vm_bwd, vm_bwdc, vm_cseq, vm_cbnd, vm_segbwd


# ---------------------------------------------------------------------------
# custom-VJP recurrence + layer wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_recurrence(xp, w_hh, interpret=False):
    """Bidirectional LSTM recurrence over PACKED layouts.

    xp: (T, B, 8H) input projections (+biases) with the two directions
    packed [fwd|bwd] along the last dim, BOTH in actual-time order;
    w_hh: (2, H, 4H) recurrent weights (``w_hh_torch.T``). Returns h_seq
    (T, B, 2H) packed [fwd|bwd], actual-time. The packed layouts mean the
    caller never materializes a direction-major copy of the (T, B, 4H)
    projections — the direction select is lane blocking in the kernel's
    BlockSpecs. vmap over models (weights and activations batched) maps
    onto the kernel's S axis.
    """
    h_seq, _ = _make_vm(interpret)[0](xp, w_hh)
    return h_seq


def _recurrence_fwd(xp, w_hh, interpret):
    h_seq, c_seq = _make_vm(interpret)[0](xp, w_hh)
    return h_seq, (xp, w_hh, h_seq, c_seq)


def dw_hh_packed(h_seq, dxp):
    """dW_hh from packed-layout residuals (shared by the production VJP and
    the fault-isolation variants in ``scripts/debug_lstm_fault.py``).

    dW_hh[d] = sum_t h_prev(t)^T dgates(t); h_prev in actual time is
    h_seq shifted right along T for dir 0, left for dir 1 (zero at the
    boundary). Packed shapes: h_seq (..., T, B, 2H), dxp (..., T, B, 8H)
    — split the direction halves, shift, contract over (T, B)."""
    hf = h_seq.astype(jnp.float32)
    hidden = hf.shape[-1] // 2
    h0 = hf[..., :hidden]   # (..., T, B, H)
    h1 = hf[..., hidden:]
    t_ax = hf.ndim - 3
    zed = jnp.zeros_like(jax.lax.slice_in_dim(h0, 0, 1, axis=t_ax))
    shift_r = jnp.concatenate(
        [zed, jax.lax.slice_in_dim(h0, 0, -1, axis=t_ax)], axis=t_ax)
    shift_l = jnp.concatenate(
        [jax.lax.slice_in_dim(h1, 1, None, axis=t_ax), zed], axis=t_ax)
    g4 = dxp.shape[-1] // 2
    dw0 = jnp.einsum("...tbh,...tbg->...hg", shift_r, dxp[..., :g4])
    dw1 = jnp.einsum("...tbh,...tbg->...hg", shift_l, dxp[..., g4:])
    return jnp.stack([dw0, dw1], axis=-3)  # (..., 2, H, 4H)


def _recurrence_bwd(interpret, res, dh_seq):
    xp, w_hh, h_seq, c_seq = res
    dxp = _make_vm(interpret)[1](dh_seq, xp, h_seq, c_seq, w_hh)
    dw_hh = dw_hh_packed(h_seq, dxp)
    return dxp.astype(xp.dtype), dw_hh.astype(w_hh.dtype)


lstm_recurrence.defvjp(_recurrence_fwd, _recurrence_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_recurrence_xproj(x, w_ih, w_hh, b, interpret=False):
    """v6 bidirectional recurrence from the RAW input (projection in-kernel).

    x: (T, B, I) actual-time input; w_ih: (2, I, 4H) per-direction input
    weights (``w_ih_torch.T``); w_hh: (2, H, 4H); b: (2, 1, 4H) summed
    ``b_ih + b_hh``. Returns h_seq (T, B, 2H) packed [fwd|bwd],
    actual-time — the same output contract as :func:`lstm_recurrence`,
    but the (T, B, 8H) projection tensor never exists (hardware A/B in
    the module docstring / ``scripts/bench_lstm_inkernel_proj.py``) and,
    as of v8, neither does a forward c_seq output: the backward rebuilds
    c from (x, h_seq) via :func:`_cseq_call`, so no c-derived tensor
    ever crosses the forward kernel's program boundary (the round-3
    fault trigger). vmap over models maps onto the kernel's S axis."""
    return _make_vm_xproj(interpret)[0](x, w_ih, w_hh, b)


def _xproj_fwd(x, w_ih, w_hh, b, interpret):
    h_seq = _make_vm_xproj(interpret)[0](x, w_ih, w_hh, b)
    return h_seq, (x, w_ih, w_hh, b, h_seq)


def _xproj_bwd(interpret, res, dh_seq):
    x, w_ih, w_hh, b, h_seq = res
    if _SEGBWD_ENABLED and _BWDC_ENABLED:
        # v9: boundary-checkpointed c + segmented merged reverse sweep —
        # the full c_seq tensor never exists (T/K of the c traffic) and
        # the gate/dx/dW dots batch over K-row segments
        vms = _make_vm_xproj(interpret)
        c_bnd = vms[4](x, h_seq, w_ih, w_hh, b)
        dx_pk, dw_cat = vms[5](dh_seq, x, h_seq, c_bnd, w_ih, w_hh, b)
        i_dim = x.shape[-1]
        hidden = w_hh.shape[-2]
        dx = dx_pk[..., :i_dim] + dx_pk[..., i_dim:]
        dw_ih = dw_cat[..., :i_dim, :]
        dw_hh = dw_cat[..., i_dim:i_dim + hidden, :]
        db = dw_cat[..., i_dim + hidden:i_dim + hidden + 1, :]
        return (dx.astype(x.dtype), dw_ih.astype(w_ih.dtype),
                dw_hh.astype(w_hh.dtype), db.astype(b.dtype))
    # v8: rebuild c in forward order from the stored tensors (bit-exact
    # in fp32 — the gates depend only on x and h_seq, and the c carry is
    # elementwise). The forward kernel itself never emits c.
    c_seq = _make_vm_xproj(interpret)[3](x, h_seq, w_ih, w_hh, b)
    if _BWDC_ENABLED:
        # v7: the reverse-sweep kernel already reduced everything —
        # dW/db accumulated in its output block, dx emitted as
        # per-direction lane halves (summed here, fused by XLA into the
        # consumer); the dxp tensor never existed
        dx_pk, dw_cat = _make_vm_xproj(interpret)[2](
            dh_seq, x, h_seq, c_seq, w_ih, w_hh, b)
        i_dim = x.shape[-1]
        hidden = w_hh.shape[-2]
        dx = dx_pk[..., :i_dim] + dx_pk[..., i_dim:]
        dw_ih = dw_cat[..., :i_dim, :]
        dw_hh = dw_cat[..., i_dim:i_dim + hidden, :]
        db = dw_cat[..., i_dim + hidden:i_dim + hidden + 1, :]
        return (dx.astype(x.dtype), dw_ih.astype(w_ih.dtype),
                dw_hh.astype(w_hh.dtype), db.astype(b.dtype))
    dxp = _make_vm_xproj(interpret)[1](dh_seq, x, h_seq, c_seq,
                                       w_ih, w_hh, b)
    # the serial kernel emits only the per-step gate grads; the big
    # (T*B)-wide reductions below are one XLA MXU pass each
    g4 = dxp.shape[-1] // 2
    dg0, dg1 = dxp[..., :g4], dxp[..., g4:]
    w0 = w_ih[..., 0, :, :]
    w1 = w_ih[..., 1, :, :]
    dx = (jnp.einsum("...tbg,...ig->...tbi", dg0, w0)
          + jnp.einsum("...tbg,...ig->...tbi", dg1, w1))
    xf = x.astype(jnp.float32)
    dw_ih = jnp.stack(
        [jnp.einsum("...tbi,...tbg->...ig", xf, dg0),
         jnp.einsum("...tbi,...tbg->...ig", xf, dg1)], axis=-3)
    dw_hh = dw_hh_packed(h_seq, dxp)
    t_ax = dxp.ndim - 3
    db = jnp.stack(
        [dg0.sum(axis=(t_ax, t_ax + 1), keepdims=True).squeeze(t_ax),
         dg1.sum(axis=(t_ax, t_ax + 1), keepdims=True).squeeze(t_ax)],
        axis=-3)  # (..., 2, 1, 4H)
    return (dx.astype(x.dtype), dw_ih.astype(w_ih.dtype),
            dw_hh.astype(w_hh.dtype), db.astype(b.dtype))


lstm_recurrence_xproj.defvjp(_xproj_fwd, _xproj_bwd)


def supported_shape(b: int, hidden: int) -> bool:
    """Mosaic tiling wants sublane%8 and lane%128 alignment."""
    return b % 8 == 0 and hidden % 128 == 0 and (4 * hidden) % 512 == 0


def fused_bwd_vmem_fits(n_models: int, batch: int, hidden: int,
                        itemsize: int = 4,
                        budget_bytes: int = 120 << 20) -> bool:
    """Does the fused backward fit scoped VMEM at this config?

    When :func:`..ops.rnn.bilstm_layer` runs under ``jax.vmap`` (the
    vectorized-LOSO trainers), the model axis lands INSIDE the kernel
    block, so every double-buffered window scales with ``n_models`` and
    most also with the batch block. Pre-v8 history: a 24-model fp32
    config at per-model B=256 was measured to need 146.43M of the 128M
    scoped-VMEM budget and fail to compile (2026-08-19) —
    :func:`_bwdc_vmem_est` reproduces that dump within 0.1%. v8 blocks
    the batch axis in the backward grid (:func:`pick_block_b`), so the
    windows scale with the chosen block Bb and such configs now compile
    fused (B=256 fp32 runs as two Bb=128 blocks). This predicate asks
    whether the estimate fits at the block :func:`pick_block_b` selects;
    it only fails for configs too big even at Bb=8 (the vectorized
    trainers then fall back to the XLA recurrence). The flagship input
    width I = 2H is assumed, as in the EEG stem's both layers.
    """
    if _SEGBWD_ENABLED and _BWDC_ENABLED:
        bb = pick_block_b_seg(n_models, batch, _SEG_K, 2 * hidden, hidden,
                              itemsize, budget_bytes)
        return _segbwd_vmem_est(
            n_models, bb, _SEG_K, 2 * hidden, hidden,
            itemsize) <= budget_bytes
    bb = pick_block_b(n_models, batch, 2 * hidden, hidden, itemsize,
                      budget_bytes)
    return _bwdc_vmem_est(
        n_models, bb, 2 * hidden, hidden, itemsize) <= budget_bytes


def fused_bilstm_layer(
    x: jnp.ndarray,
    fwd: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    bwd: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    interpret: bool = False,
    use_xproj: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for :func:`..ops.rnn.bilstm_layer` (same torch-layout params,
    same (B, T, 2H) output).

    v6 default (``use_xproj``): the kernel streams the RAW (T, B, I)
    input and computes the projection in-kernel — the (T, B, 8H)
    projection tensor never exists (1.67x the v5 forward on hardware,
    module docstring). Needs the input width lane-aligned (I % 128);
    otherwise, and under ``MSA_LSTM_XPROJ=0``, the v5 two-pass form runs:
    the input is transposed to (T, B, I) FIRST (4-8x smaller than the
    projections), then ONE matmul against the direction-concatenated
    weights writes the packed (T, B, 8H) projection directly — no
    (2, T, B, 4H) stack/transpose pass. Either way the kernel returns
    packed (T, B, 2H), so the output needs only the final (T<->B)
    transpose."""
    (wif, whf, bif, bhf) = fwd
    (wib, whb, bib, bhb) = bwd
    if use_xproj is None:
        use_xproj = _XPROJ_ENABLED and x.shape[-1] % 128 == 0
    xt = jnp.swapaxes(x, 0, 1)  # (T, B, I)
    w_hh = jnp.stack([whf.T, whb.T])  # (2, H, 4H)
    if use_xproj:
        w_ih = jnp.stack([wif.T, wib.T])  # (2, I, 4H)
        b = jnp.stack([bif + bhf, bib + bhb])[:, None, :]  # (2, 1, 4H)
        h_seq = lstm_recurrence_xproj(xt, w_ih, w_hh, b, interpret)
    else:
        w_cat = jnp.concatenate([wif, wib], axis=0)      # (8H, I)
        b_cat = jnp.concatenate([bif + bhf, bib + bhb])  # (8H,)
        xp = xt @ w_cat.T + b_cat  # (T, B, 8H) — one big MXU matmul
        h_seq = lstm_recurrence(xp, w_hh, interpret)  # (T, B, 2H) packed
    return jnp.swapaxes(h_seq, 0, 1)  # (B, T, 2H), torch concat order
