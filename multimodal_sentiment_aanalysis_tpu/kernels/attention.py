"""Blockwise flash multi-head attention (Pallas TPU).

The reference's attention sites all run at sequence length 1 or 3
(``Subnetwork`` seq-1 self-attention, ``CrossModalTransformer`` seq-1
cross-attention, SimCLR/ME-MHACL seq-3 modality fusion — SURVEY.md §5
"long-context" row), but the kernel is written blockwise (flash-style,
online softmax, O(T) memory) so longer EEG windows from the sliding-window
augmentation (``common/data_process.py:96-136``) scale without change.

Forward: grid over (batch*heads, q-blocks); inner ``fori_loop`` over k-blocks
keeps running max / normalizer / accumulator in VMEM; saves the LSE for the
backward. Backward: the standard two-kernel flash backward (dq by q-block,
dk/dv by k-block) recomputing probabilities from the saved LSE.

Off-TPU the public entry dispatches to the jnp reference (also used by the
A/B parity tests); tiny sequences (below one block) take the jnp path too —
a grid launch would be pure overhead at T<=8.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# tuned on v5e at T=4096 (bf16): 512/1024 runs ~1.6x faster than XLA's
# attention; smaller blocks underfeed the MXU per grid step
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
# float32 inputs get exact multi-pass MXU matmuls (parity with the jnp
# reference under highest precision); bfloat16 inputs run at native MXU rate
# (fp32 contract precision is invalid for bf16 operands in Mosaic).


def _prec(dtype) -> jax.lax.Precision:
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# jnp reference (dispatch target off-TPU and for tiny sequences)
# ---------------------------------------------------------------------------

def mha_reference(q, k, v):
    """Softmax attention over (B, H, T, Dh); scale 1/sqrt(Dh)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(q.shape[-1])
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, block_k):
    """Grid-pipelined forward: k-blocks arrive via the innermost grid
    dimension (Mosaic double-buffers their DMA against compute), online-
    softmax state lives in VMEM scratch across k iterations."""
    kv_len = kv_len_ref[0]
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (block_q, Dh), pre-scaled
    kb = k_ref[0]  # (block_k, Dh)
    vb = v_ref[0]
    s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32,
                precision=_prec(q_ref.dtype))
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, _NEG)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = alpha * l_ref[:] + p.sum(axis=1, keepdims=True)
    acc_ref[:] = alpha * acc_ref[:] + jnp.dot(
        p, vb, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype)
    )

    @pl.when(j == n_k - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])  # (block_q, 1)


def _flash_fwd(q, k, v, block_q, block_k):
    bh, tq, dh = q.shape
    tk = k.shape[1]
    kv_len = jnp.full((1,), tk, jnp.int32)
    tq_pad = (-tq) % block_q
    tk_pad = (-tk) % block_k
    qp = jnp.pad(q, ((0, 0), (0, tq_pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad), (0, 0)))
    tqp, tkp = tq + tq_pad, tk + tk_pad

    grid = (bh, tqp // block_q, tkp // block_k)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda b, i, j, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, dh), lambda b, i, j, *_: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, dh), lambda b, i, j, *_: (b, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dh), lambda b, i, j, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda b, i, j, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),   # running max
                pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
                pltpu.VMEM((block_q, dh), jnp.float32),  # accumulator
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, tqp, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, tqp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(kv_len, qp, kp, vp)
    return o[:, :tq], lse  # lse stays block-padded (bh, tqp, 1) for the bwd


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(kv_len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_k):
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (block_q, 1)
    delta = delta_ref[0]  # (block_q, 1)
    kv_len = kv_len_ref[0]
    tk = k_ref.shape[1]
    n_blocks = tk // block_k

    def body(i, dq):
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype))
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype))
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, kb, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype))

    dq0 = jnp.zeros_like(q, jnp.float32)
    dq_ref[0] = jax.lax.fori_loop(0, n_blocks, body, dq0).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q):
    kb = k_ref[0]  # (block_k, Dh)
    vb = v_ref[0]
    q_len = q_len_ref[0]
    tq = q_ref.shape[1]
    n_blocks = tq // block_q

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype))
        rowq = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * block_q
        # padded q rows have lse=0 -> p=exp(s) garbage; mask them out
        p = jnp.where(rowq < q_len, jnp.exp(s - lse), 0.0)
        dv_new = dv + jnp.dot(p.T, dob, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype))
        dp = jnp.dot(dob, vb.T, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype))
        ds = p * (dp - delta)
        dk_new = dk + jnp.dot(ds.T, qb, preferred_element_type=jnp.float32, precision=_prec(q_ref.dtype))
        return dk_new, dv_new

    dk0 = jnp.zeros_like(kb, jnp.float32)
    dv0 = jnp.zeros_like(vb, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_blocks, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, block_q, block_k):
    bh, tq, dh = q.shape
    tk = k.shape[1]
    delta = (do * o).sum(axis=-1, keepdims=True)  # (bh, tq, 1)

    tq_pad = (-tq) % block_q
    tk_pad = (-tk) % block_k
    qp = jnp.pad(q, ((0, 0), (0, tq_pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tk_pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tk_pad), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, tq_pad), (0, 0)))
    lsep = lse  # already (bh, tq + tq_pad, 1) from the forward
    deltap = jnp.pad(delta, ((0, 0), (0, tq_pad), (0, 0)))
    tqp, tkp = tq + tq_pad, tk + tk_pad

    kv_len = jnp.full((1,), tk, jnp.int32)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tqp // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tkp, dh), lambda b, i, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tkp, dh), lambda b, i, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, dh), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dh), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, tqp, dh), q.dtype)],
        interpret=_interpret(),
    )(kv_len, qp, kp, vp, dop, lsep, deltap)[0][:, :tq]

    q_len = jnp.full((1,), tq, jnp.int32)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, tkp // block_k),
            in_specs=[
                pl.BlockSpec((1, tqp, dh), lambda b, j, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, dh), lambda b, j, *_: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, dh), lambda b, j, *_: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tqp, dh), lambda b, j, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tqp, 1), lambda b, j, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tqp, 1), lambda b, j, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, dh), lambda b, j, *_: (b, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, dh), lambda b, j, *_: (b, j, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, tkp, dh), k.dtype),
            jax.ShapeDtypeStruct((bh, tkp, dh), v.dtype),
        ],
        interpret=_interpret(),
    )(q_len, qp, kp, vp, dop, lsep, deltap)
    return dq, dk[:, :tk], dv[:, :tk]


# ---------------------------------------------------------------------------
# custom-VJP wrapper over flattened (B*H, T, Dh)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_core(q, k, v, block_q, block_k):
    o, _ = _flash_fwd(q, k, v, block_q, block_k)
    return o


def _flash_core_fwd(q, k, v, block_q, block_k):
    o, lse = _flash_fwd(q, k, v, block_q, block_k)
    return o, (q, k, v, o, lse)


def _flash_core_bwd(block_q, block_k, res, do):
    q, k, v, o, lse = res
    return _flash_bwd(q, k, v, o, lse, do, block_q, block_k)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_mha(q, k, v, *, block_q: int = DEFAULT_BLOCK_Q,
              block_k: int = DEFAULT_BLOCK_K, force: bool = False):
    """Flash attention over (B, H, T, Dh); numerics of :func:`mha_reference`.

    Dispatches to the jnp reference off-TPU or when both sequence lengths fit
    one VPU tile (grid launch overhead beats any fusion win there) unless
    ``force=True`` (used by the parity tests via interpret mode).
    """
    tiny = q.shape[2] <= 8 and k.shape[2] <= 8
    if not force and (jax.default_backend() != "tpu" or tiny):
        return mha_reference(q, k, v)
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    scale = 1.0 / math.sqrt(dh)
    qf = (q * scale).reshape(b * h, tq, dh)
    kf = k.reshape(b * h, tk, dh)
    vf = v.reshape(b * h, tk, dh)
    block_q = min(block_q, max(8, tq))
    block_k = min(block_k, max(8, tk))
    o = _flash_core(qf, kf, vf, block_q, block_k)
    return o.reshape(b, h, tq, dh)
