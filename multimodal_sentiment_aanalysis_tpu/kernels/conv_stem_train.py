"""Fused TRAIN-mode stem stage: BN(batch stats) + GELU + dropout + MaxPool.

The inference stem kernel (:mod:`.conv_stem`) folds running-stat BN and is
serving-only; training kept the jnp stem, whose post-conv tail costs several
HBM passes over the stage's biggest tensor — the (B, 585, 64) conv output —
plus threefry mask generation and a select-and-scatter pool backward
(reference stage: ``MultimodalModel.py:28-39``).

Split of labor (each part where it is strongest):

- **XLA**: the convolution itself (MXU), the per-channel batch-stat
  reduction, and the final BN input-gradient combine (one fused
  elementwise pass).
- **Pallas forward**: ONE pass over the conv output — normalize + exact
  erf-GELU + dropout with IN-KERNEL RNG (``pltpu.prng_random_bits``; no
  mask tensor is ever materialized) + windowed max — writing only the
  pooled result.
- **Pallas backward (v3, winner-routed)**: the forward additionally
  emits a packed int32 routing code per pooled cell (winner's pool
  index + its dropout keep bit); the backward selects the winner's
  conv value by that code and applies ONE ``gelu_grad`` on the
  pool-x-smaller winner tensor — no forward recompute, no dropout
  PRNG regeneration, no max/tie-count — emitting dy plus per-block
  partial dgamma/dbeta sums. Routing is torch ``MaxPool1d`` semantics
  (FIRST max wins), which matches the reference exactly; the jnp path
  (``reshape().max()``, i.e. ``lax.reduce_max`` VJP) splits ties
  evenly instead — identical on tie-free inputs, which every parity
  test and real workload is. v3 e2e timing is a measured WASH vs the
  v2 recompute backward (fused 20-epoch vloso 2026-08-17: fp32
  32,958 vs 33.0k; bf16 40.1k vs 40.2k samples/s — tunnel noise);
  kept for the exact-reference routing and the simpler backward
  contract (standalone: stage2 bwd kernel 4.5 -> 3.9 ms, stage1
  unchanged, fwd +0.3-0.6 ms for the argmax + win write).

**Full-lane layout (v2).** The kernels view the covered rows
``(t_cov, C)`` as ``(t_out, pool*C)`` — the pool window folded into the
LANE dimension. Two wins, measured stage-by-stage on v5e
(``scripts/bench_stem_variants.py``, chained + host-sync):

- stage 1's C=64 is half the 128-lane vreg width, so every VPU op in the
  row-major layout ran at half throughput (the erf-GELU chain alone was
  ~1.6 ms of the 3.55 ms stage); at ``pool*C = 256`` lanes are full.
- the pool ``reshape(bt, t_out, pool, c).max(2)`` (sublane-strided
  selects) becomes ``pool-1`` lane-slice ``maximum`` ops.

===============  ==========  ==========  =======
fwd kernel       row-major   full-lane   speedup
===============  ==========  ==========  =======
stage1 (T=585)     3.55 ms     1.78 ms    2.0x
stage2 (T=146)     2.90 ms     1.72 ms    1.7x
===============  ==========  ==========  =======

The relayout itself: when ``C % 128 == 0`` (stage 2) the reshape happens
IN-KERNEL on the loaded block — measured free (1.735 vs 1.718 ms on a
pre-reshaped operand). Mosaic cannot lower the value reshape when the
source last dim is < 128 (stage 1's C=64 fails to compile), so that case
pays one XLA relayout pass on the host side (~1-2 ms of HBM round-trip
at stage-1 size in situ — which eats roughly half the stage-1 kernel
win, see the A/B table below — but is still a net gain). The backward
emits dy in full-lane layout; the caller's reshape back is fused by XLA
into the BN input-gradient combine.

**Conv-formulation negative (measured — keep lax.conv).** Because the
production step vmaps the stem over S=24 per-model weights, the conv
lowers through lax.conv's batched-rhs rule; the suspicion that this
grouped-conv form was slow (and that shifted-tap batched ``dot_general``
formulations, or taps emitting the full-lane layout directly, would
beat it) was A/B'd on v5e (``scripts/bench_conv_vmapped.py``,
2026-08-17, chained + scalar-sync): XLA's conv wins every case by
3-30x (fp32 f+bwd conv1: xla 4.32 ms, tap-matmul 40.7, tap-fl 138;
conv2: xla 2.20, tap-matmul 10.5). The same run showed the stage-1
host relayout is FREE in composition (xla-conv+fl 4.27 ms ≈ xla-conv
alone) — XLA fuses it into the conv output write, so the relayout
cost estimated below materializes only when the pass cannot fuse.

**Input-fusion negative (measured — do NOT enable).** Fusing the
stage-1 relayout into the kernel's operand DMA via
``CompilerParams(allow_input_fusion=...)`` looked like the obvious way
to erase the host pass; in situ it is a >10x LOSS (98.7 ms fwd vs
8.6 ms) — XLA re-evaluates the fused relayout per kernel block with
block-strided reads from the (585, 64)-layout source. It also blows the
16 MB scoped-vmem budget when applied to the in-kernel-reshape (stage-2
backward) call. Removed after the A/B; the host relayout pass is the
right trade.

Gradient note: batch mean/var enter as ``stop_gradient`` inputs and the
backward returns the COMPLETE BatchNorm input gradient
``inv*gamma*(dy - dbeta/N - xhat*dgamma/N)`` — the standard fused-BN
formulation, so the caller's stats computation contributes no extra
gradient path.

**Backward v4 considered and rejected on traffic accounting (r3).** A
two-pass backward that never materializes ``dy`` (pass 1: partial
dgamma/dbeta only; XLA: tiny total; pass 2: emit ``dconv`` directly
with the totals folded in, in-kernel reshape to row-major where
``C % 128 == 0``) was sized before building. Per stage-2 step the win
is one dy write+read minus one extra dpool+win read ≈ 230 MB ≈ 0.28 ms
at v5e HBM; stage 1 is parity (the unsupported in-kernel reshape at
C=64 re-introduces the relayout pass the current combine already fuses
for free). Both are below this harness's e2e A/B noise and far below
the measured ~3 ms gap between the stem backward's traffic roofline
(~3.2 GB -> 3.9 ms incl. conv grads) and its in-situ cost (10.7 ms) —
that gap is XLA pass/scheduling overhead, which a kernel swap does not
touch. Recorded instead of built, per the in-situ-compression lesson
(CLAUDE.md): only real traffic eliminations hold, and this one is too
small to survive the noise floor.

Dropout stream: the fused path draws bits from the kernel PRNG seeded per
(call, block) — same Bernoulli(1-p) distribution as ``nn.Dropout`` but a
different stream than the jnp path (parity tests therefore pin p=0; a
statistical test pins the keep rate). The v2 layout also permutes the
stream relative to v1 (bits are drawn in (t_out, pool*C) order).

A/B parity (p=0, interpret mode): ``tests/test_kernels.py``; on-device
fused-vs-jnp value parity ``profile_stem.py --only=parity``.

A/B hardware timing, TPU v5e, BOTH stem stages (conv in XLA identically
on both sides), real vmapped shape (S=24 models, B=64, T=585, train
mode with batch-stat BN + dropout 0.4), chained scan with host-transfer
sync (``scripts/profile_stem.py``):

===========  ==========  ==============  ==============
config       XLA stage   fused v1 (row)  fused v2 (FL)
===========  ==========  ==============  ==============
fp32 fwd       16.08 ms     9.23 ms        8.62 ms
fp32 f+bwd     26.46 ms    20.89 ms       19.30 ms
===========  ==========  ==============  ==============

(v2's in-situ gain is smaller than the 2x per-stage kernel speedup
because the composition also pays the stage-1 host relayout and keeps
the XLA convs/stats unchanged; the standalone kernel table above is the
clean comparison.)

(The win is concentrated in the forward — one pass + in-kernel PRNG vs
XLA's separate stat/normalize/mask passes; the recompute backward runs
closer to XLA's stored-activation backward.) For context the whole fp32
train step was 51.7 ms before this kernel: the stem tail was over a
quarter of the step.

**bf16 history (both verdicts measured).** The kernel body always runs
fp32 internally (Mosaic cannot lower packed-bf16 float compares in the
pool max), which forfeits the VPU's 2x bf16 rate — and with the v1
row-major layout that made the kernel a NET LOSS in bf16 (end-to-end
A/B ``scripts/ab_bf16_fused.py``, fused 20-epoch vloso program: v1
all-fused 35.5k samples/s vs 37.1k with the stem kernel off), so v1
dispatch was fp32-only. The v2 full-lane layout flipped the verdict:
same A/B 2026-08-17 gives all-fused **39.8k** vs no-stem 37.0k
(+7.6%), so bf16 dispatch is now on by default
(``enable_bf16_dispatch`` / ``MSA_FUSED_STEM_BF16=0`` reverts).

**Roofline (r5, scripts/stem_roofline.py).** Complete bytes+FLOPs budget
of the stem fwd+bwd at flagship shape (S=24 x B=64, T=585, fp32), per op
as dispatched: forward 1.81 GB + 92 GFLOP -> 2.48 ms floor; backward
3.73 GB + 184 GFLOP -> 5.09 ms floor; **total 5.4 GB / 276 GFLOP ->
7.57 ms computed vs ~19.7 ms measured in-step** (2.6x). The stem is
therefore NOT HBM-bound, and further traffic-elimination kernels cannot
close the gap. Attribution of the 2.6x:

- the fused stage kernels run ~3.5x above their own traffic floors
  (stage1 1.78 ms vs 0.42, stage2 1.72 vs 0.56 standalone) because the
  normalize + erf-GELU (A&S rational ~15 VPU ops/elem) + in-kernel PRNG
  dropout + win-code pool body is VPU-ISSUE-bound — proven by the v1->v2
  result above: doubling lane occupancy at identical bytes halved the
  time. The erf chain is reference numerics (torch exact-erf GELU), so
  the VPU work is irreducible without breaking parity.
- the remaining ~6-7 ms sits in XLA's conv/stat/combine chain running
  above its per-op floors + scheduling overhead on the 14-op graph —
  the same overhead class the r3 compiler-knob A/B showed is not
  reachable through exposed XLA options.

Remaining traffic-elimination candidates were sized against this budget
and are ALL below the ~1 ms e2e A/B noise floor: v4 two-pass backward
~0.28 ms (rejected r3, above), storing winner values to skip the y
re-read in bwd ~0.14 ms net, folding the stats reduce into the conv
epilogue ~0.56 ms upper bound (impossible without fusing into XLA's
conv anyway). Recorded as justified negatives per the in-situ
compression lesson (CLAUDE.md).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_stem import _erf

# KILL SWITCH: MSA_FUSED_STEM=0 disables the fused train-stem dispatch
# (same convention as MSA_FUSED_LSTM / MSA_FUSED_INFONCE).
_DISPATCH = os.environ.get("MSA_FUSED_STEM", "1") != "0"


def enable_dispatch(on: bool) -> bool:
    global _DISPATCH
    old = _DISPATCH
    _DISPATCH = bool(on)
    return old


def dispatch_enabled() -> bool:
    return _DISPATCH


# bf16 dispatch: ON by default since the v2 full-lane layout (hardware
# A/B 2026-08-17: bf16 vloso 39.8k samples/s fused vs 37.0k jnp — the v1
# row-major kernel had LOST this A/B 35.5k vs 37.1k);
# MSA_FUSED_STEM_BF16=0 or enable_bf16_dispatch(False) reverts.
_BF16_DISPATCH = os.environ.get("MSA_FUSED_STEM_BF16", "1") != "0"


def enable_bf16_dispatch(on: bool) -> bool:
    global _BF16_DISPATCH
    old = _BF16_DISPATCH
    _BF16_DISPATCH = bool(on)
    return old


def bf16_dispatch_enabled() -> bool:
    return _BF16_DISPATCH


def _gelu(y):
    return 0.5 * y * (1.0 + _erf(y * (1.0 / math.sqrt(2.0))))


def _gelu_grad(y):
    phi = jnp.exp(-0.5 * y * y) * (1.0 / math.sqrt(2.0 * math.pi))
    return 0.5 * (1.0 + _erf(y * (1.0 / math.sqrt(2.0)))) + y * phi


def _keep_mask(shape, p: float):
    """Bernoulli(1-p) keep mask from the kernel PRNG (must be preceded by
    pltpu.prng_seed with the block's seed)."""
    bits = pltpu.prng_random_bits(shape)  # int32 bits
    thresh = int(p * 2.0 ** 32) - 2 ** 31  # compare in signed space
    return bits >= jnp.int32(thresh)


def _inkernel_reshape_ok(c: int) -> bool:
    """Mosaic lowers the (t_cov, c) -> (t_out, pool*c) VALUE reshape only
    when the source last dim fills the 128-lane vregs; narrower sources
    (stage 1's C=64) fail to compile and take the host-relayout path."""
    return c % 128 == 0


# ---------------------------------------------------------------------------
# forward: one pass conv_out -> pooled, full-lane layout
# ---------------------------------------------------------------------------

def _load_fl(conv_ref, *, pool, t_out, c, ik):
    """Load the block's covered rows as (bt, t_out, pool*c) fp32."""
    t_cov = t_out * pool
    if ik:
        _, bt, _, _ = conv_ref.shape
        return conv_ref[0, :, :t_cov, :].astype(jnp.float32).reshape(
            bt, t_out, pool * c)
    return conv_ref[0].astype(jnp.float32)  # operand pre-reshaped on host


def _fwd_kernel(seed_ref, conv_ref, sc_ref, sh_ref, o_ref, win_ref, *,
                pool: int, t_out: int, c: int, p: float, ik: bool):
    xv = _load_fl(conv_ref, pool=pool, t_out=t_out, c=c, ik=ik)
    bt = xv.shape[0]
    y = xv * sc_ref[0, 0][None, None, :].astype(jnp.float32) + \
        sh_ref[0, 0][None, None, :].astype(jnp.float32)
    a = _gelu(y)
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0, 0] + pl.program_id(1))
        keep = _keep_mask((bt, t_out, pool * c), p)
        a = jnp.where(keep, a * (1.0 / (1.0 - p)), 0.0)
    # max + FIRST-argmax over the pool lane groups (torch MaxPool routing);
    # the packed code jwin + pool*kept_win is the backward's routing table
    # (see _bwd_kernel: no forward recompute, no PRNG regen needed there).
    m = a[:, :, :c]
    win = jnp.zeros((bt, t_out, c), jnp.int32)
    if p > 0.0:
        # keep bit carried as int32: Mosaic cannot select i1 VALUES
        # (arith.trunci i8->i1 fails); i1 select CONDITIONS are fine
        kw = keep[:, :, :c].astype(jnp.int32)
    for j in range(1, pool):
        aj = a[:, :, j * c:(j + 1) * c]
        upd = aj > m
        win = jnp.where(upd, jnp.int32(j), win)
        if p > 0.0:
            kw = jnp.where(
                upd, keep[:, :, j * c:(j + 1) * c].astype(jnp.int32), kw)
        m = jnp.maximum(m, aj)
    if p > 0.0:
        win = win + pool * kw
    else:
        win = win + pool  # kept bit always set when dropout is off
    o_ref[0] = m.astype(o_ref.dtype)
    win_ref[0] = win


def _conv_spec(t, c, t_out, pc, block_b, ik):
    if ik:
        return pl.BlockSpec((1, block_b, t, c), lambda s, i: (s, i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, block_b, t_out, pc), lambda s, i: (s, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _host_fl(conv, pool, t_out):
    """(S, B, T, C) -> (S, B, t_out, pool*C) via one XLA relayout pass."""
    S, b, _, c = conv.shape
    return conv[:, :, : t_out * pool, :].reshape(S, b, t_out, pool * c)


def _fwd_call(conv, sc, sh, seeds, *, pool, p, block_b, interpret):
    """Batched over a leading model axis S: conv (S, B, T, C), sc/sh
    (S, C), seeds (S, 8, 128). Grid (S, nb). Returns (pooled, win) —
    ``win`` is the packed winner/keep routing code consumed by the
    backward kernel."""
    S, b, t, c = conv.shape
    t_out = t // pool
    pc = pool * c
    ik = _inkernel_reshape_ok(c)
    if not ik:
        conv = _host_fl(conv, pool, t_out)
    sc_t = jnp.tile(sc, (1, pool)).reshape(S, 1, pc)
    sh_t = jnp.tile(sh, (1, pool)).reshape(S, 1, pc)
    nb = b // block_b
    ospec = pl.BlockSpec((1, block_b, t_out, c), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, pool=pool, t_out=t_out, c=c, p=p,
                          ik=ik),
        grid=(S, nb),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            _conv_spec(t, c, t_out, pc, block_b, ik),
            pl.BlockSpec((1, 1, pc), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pc), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((S, b, t_out, c), conv.dtype),
            jax.ShapeDtypeStruct((S, b, t_out, c), jnp.int32),
        ],
        # the recompute-style body keeps ~a dozen (block_b, t, c) f32
        # intermediates live; the 16 MB default scoped-VMEM cap is too
        # tight at stage-1 shapes (v5e has 128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(seeds, conv, sc_t, sh_t)


# ---------------------------------------------------------------------------
# backward (v3, winner-routed): no forward recompute — the fwd kernel's
# packed win code routes the pool gradient, so the only transcendental
# left is ONE gelu_grad on the (t_out, C) winner tensor (pool-x fewer
# elements than the v2 recompute backward, which re-ran gelu + dropout
# PRNG + max + tie-count over the full (t_out, pool*C) block).
# ---------------------------------------------------------------------------

def _bwd_kernel(conv_ref, dpool_ref, win_ref, sc_ref, sh_ref,
                mean_ref, inv_ref, dy_ref, dg_ref, db_ref, *,
                pool: int, t_out: int, c: int, p: float, ik: bool):
    xv = _load_fl(conv_ref, pool=pool, t_out=t_out, c=c, ik=ik)
    code = win_ref[0]
    jwin = code & jnp.int32(pool - 1)  # pool is a power of two
    # winner's pre-activation input, selected across lane groups
    xw = jnp.where(jwin == 0, xv[:, :, :c], 0.0)
    for j in range(1, pool):
        xw = jnp.where(jwin == j, xv[:, :, j * c:(j + 1) * c], xw)
    y = xw * sc_ref[0, 0][None, None, :].astype(jnp.float32) + \
        sh_ref[0, 0][None, None, :].astype(jnp.float32)
    g = dpool_ref[0].astype(jnp.float32) * _gelu_grad(y)
    if p > 0.0:
        kept = code >= jnp.int32(pool)
        g = jnp.where(kept, g * (1.0 / (1.0 - p)), 0.0)
    # route g to the winner's lane group as ONE full-lane value + a single
    # block write — per-group masked lane-slice stores (offsets j*c are
    # not vreg-aligned at c=64) lowered poorly
    dy_ref[0] = jnp.concatenate(
        [jnp.where(jwin == j, g, 0.0) for j in range(pool)], axis=-1
    ).astype(dy_ref.dtype)
    xhat = (xw - mean_ref[0, 0][None, None, :].astype(jnp.float32)) * \
        inv_ref[0, 0][None, None, :].astype(jnp.float32)
    # partial channel sums in row 0 of an (8, c) tile (Mosaic tiling
    # wants full last-two-dim blocks); rows 1..7 zeroed, XLA sums all
    zeros7 = jnp.zeros((7, c), jnp.float32)
    dg_ref[0, 0] = jnp.concatenate(
        [jnp.sum(g * xhat, axis=(0, 1))[None], zeros7], axis=0
    ).astype(dg_ref.dtype)
    db_ref[0, 0] = jnp.concatenate(
        [jnp.sum(g, axis=(0, 1))[None], zeros7], axis=0
    ).astype(db_ref.dtype)


def _bwd_call(conv, dpool, win, sc, sh, mean, inv, *,
              pool, p, block_b, interpret):
    """Batched like :func:`_fwd_call`; returns (dy full-lane
    (S, B, t_out, pool*C) f32, dgamma/dbeta per-block partials
    (S, nb, 8, C))."""
    S, b, t, c = conv.shape
    t_out = t // pool
    pc = pool * c
    ik = _inkernel_reshape_ok(c)
    if not ik:
        conv = _host_fl(conv, pool, t_out)
    sc_t = sc.reshape(S, 1, c)
    sh_t = sh.reshape(S, 1, c)
    mean_t = mean.reshape(S, 1, c)
    inv_t = inv.reshape(S, 1, c)
    nb = b // block_b
    cspec = pl.BlockSpec((1, 1, c), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, block_b, t_out, c), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, pool=pool, t_out=t_out, c=c, p=p,
                          ik=ik),
        grid=(S, nb),
        in_specs=[
            _conv_spec(t, c, t_out, pc, block_b, ik),
            bspec,
            bspec,
            cspec, cspec, cspec, cspec,
        ],
        out_specs=[
            pl.BlockSpec((1, block_b, t_out, pc), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, c), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, c), lambda s, i: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, b, t_out, pc), jnp.float32),
            jax.ShapeDtypeStruct((S, nb, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((S, nb, 8, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(conv, dpool, win, sc_t, sh_t, mean_t, inv_t)


# ---------------------------------------------------------------------------
# custom_vmap wrappers (the trainer vmap maps onto a leading grid axis) +
# custom-VJP
# ---------------------------------------------------------------------------

# batch-tile of each grid step; 8 = 192 grid steps at the flagship shape.
# Env-tunable for A/B (MSA_STEM_BLOCK_B).
_BLOCK_B = int(os.environ.get("MSA_STEM_BLOCK_B", "8"))


def _bcast(x, n):
    return jnp.broadcast_to(x[None], (n,) + x.shape)


@functools.lru_cache(maxsize=32)
def _make_vm(p: float, pool: int, interpret: bool):
    kw = dict(pool=pool, p=p, block_b=_BLOCK_B, interpret=interpret)

    @jax.custom_batching.custom_vmap
    def vm_fwd(conv, sc, sh, seeds):
        out, win = _fwd_call(conv[None], sc[None], sh[None], seeds[None],
                             **kw)
        return out[0], win[0]

    @vm_fwd.def_vmap
    def _fwd_rule(axis_size, in_batched, conv, sc, sh, seeds):
        args = [v if bb else _bcast(v, axis_size)
                for v, bb in zip((conv, sc, sh, seeds), in_batched)]
        return _fwd_call(*args, **kw), (True, True)

    @jax.custom_batching.custom_vmap
    def vm_bwd(conv, dpool, win, sc, sh, mean, inv):
        dy, dgp, dbp = _bwd_call(
            conv[None], dpool[None], win[None], sc[None], sh[None],
            mean[None], inv[None], **kw)
        return dy[0], dgp[0], dbp[0]

    @vm_bwd.def_vmap
    def _bwd_rule(axis_size, in_batched, *ops):
        args = [v if bb else _bcast(v, axis_size)
                for v, bb in zip(ops, in_batched)]
        return _bwd_call(*args, **kw), (True, True, True)

    return vm_fwd, vm_bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_stage_train(conv, gamma, beta, mean, var, seeds,
                      p: float, pool: int, eps: float = 1e-5,
                      interpret: bool = False):
    """BN(given batch stats) + GELU + dropout(p) + MaxPool(pool), fused.

    conv: (B, T, C) conv output; gamma/beta: (C,) BN affine; mean/var:
    (C,) batch statistics (the backward here returns the COMPLETE BN
    input gradient, so pass them through ``lax.stop_gradient``); seeds:
    (8, 128) int32 base-seed tile from :func:`make_seeds` (ignored when
    p == 0). Returns (B, T//pool, C). vmap over models maps onto a
    leading kernel grid axis.
    """
    inv = jax.lax.rsqrt(var + eps)
    sc = gamma * inv
    sh = beta - mean * sc
    return _make_vm(p, pool, interpret)[0](conv, sc, sh, seeds)[0]


def _fst_fwd(conv, gamma, beta, mean, var, seeds, p, pool, eps, interpret):
    inv = jax.lax.rsqrt(var + eps)
    sc = gamma * inv
    sh = beta - mean * sc
    out, win = _make_vm(p, pool, interpret)[0](conv, sc, sh, seeds)
    return out, (conv, gamma, beta, mean, var, seeds, win)


def _fst_bwd(p, pool, eps, interpret, res, dpool):
    conv, gamma, beta, mean, var, seeds, win = res
    inv = jax.lax.rsqrt(var + eps)
    sc = gamma * inv
    sh = beta - mean * sc
    dyfl, dgp, dbp = _make_vm(p, pool, interpret)[1](
        conv, dpool.astype(jnp.float32), win, sc, sh, mean, inv)
    dgamma = dgp.sum(axis=(0, 1))
    dbeta = dbp.sum(axis=(0, 1))
    b, t, c = conv.shape
    t_cov = (t // pool) * pool
    # full-lane dy back to row-major; XLA fuses this reshape (and the
    # tail-row zero pad) into the elementwise combine below
    dy = dyfl.reshape(b, t_cov, c)
    if t_cov < t:
        dy = jnp.pad(dy, ((0, 0), (0, t - t_cov), (0, 0)))
    n = b * t
    xhat = (conv.astype(jnp.float32) - mean) * inv
    # complete fused-BN input gradient (stats-dependence folded in)
    dconv = (inv * gamma) * (dy - dbeta / n - xhat * (dgamma / n))
    import numpy as np
    from jax import dtypes

    dseeds = np.zeros(seeds.shape, dtypes.float0)  # int input -> float0
    return (dconv.astype(conv.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), jnp.zeros_like(mean),
            jnp.zeros_like(var), dseeds)


fused_stage_train.defvjp(_fst_fwd, _fst_bwd)


def supported_shape(b: int, c: int, pool: int = None) -> bool:
    """Batch must tile into the block size; channels must fill lanes
    (and, in the full-lane layout, the folded ``pool*c`` lane width must
    be a multiple of the 128-lane vreg)."""
    ok = b % _BLOCK_B == 0 and c % 64 == 0
    if pool is not None:
        ok = ok and (pool * c) % 128 == 0
    return ok


def make_seeds(key, b: int) -> jnp.ndarray:
    """(8, 128) int32 base-seed tile from a JAX PRNG key (the kernels add
    ``pl.program_id`` so every batch block draws a distinct stream; the
    tile shape satisfies Mosaic's VMEM block tiling)."""
    del b
    base = jax.random.randint(
        key, (), minval=-(2 ** 31), maxval=2 ** 31 - 1, dtype=jnp.int32
    )
    return jnp.full((8, 128), base, jnp.int32)
