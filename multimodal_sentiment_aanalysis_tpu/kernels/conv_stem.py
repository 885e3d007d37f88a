"""Fused Conv1d + BatchNorm + GELU + MaxPool Pallas kernel (EEG stem).

One stage of the reference EEG temporal stack (``MultimodalModel.py:28-39``):
``Conv1d -> BN -> GELU -> MaxPool`` executed as a single VMEM-resident kernel
per batch tile — the conv output never round-trips through HBM before the
pool, which removes the stage's intermediate-activation bandwidth entirely
(the (B, 585, 64) conv1 output is 4x the pooled result).

The convolution is computed as K shifted (T, C) x (C, O) matmuls on the MXU
(kernel taps unrolled — K is 15/5). BatchNorm is folded into a per-channel
affine (inference semantics: running stats), so this is the SERVING path;
training keeps the jnp stem where BN batch stats and dropout RNG live.

A/B parity test: ``tests/test_kernels.py`` compares against the eval-mode
jnp stem stage.

MEASURED NEGATIVE in the serving composition (scripts/serve_sweep.py,
v5e, 2026-08-18): the end-to-end serving forward with this kernel loses
to the plain XLA stem at EVERY batch size — 1.257 vs 0.835 ms/batch at
B=64 (1.5x), 3.419 vs 1.232 at B=256 (2.8x), worsening with batch. In
eval mode XLA already fuses the folded affine+GELU into the conv output
and tiles the batch dimension freely, while this kernel's
batch-in-sublanes grid pays a relayout per stage; the HBM round-trip it
removes does not dominate at serving shapes. ``eval/serving.py``
therefore defaults to the XLA stem (``use_pallas=False``); the kernel
stays opt-in and parity-tested. (The TRAIN-mode stem fusion is a
different kernel and a measured e2e WIN — ``conv_stem_train.py``.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via the Abramowitz & Stegun 7.1.26 rational approximation
    (|error| < 1.5e-7): Mosaic has no erf primitive, and tanh-GELU would
    break parity with the exact-erf GELU the models use."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def fold_bn(gamma, beta, mean, var, conv_bias, eps: float = 1e-5):
    """Fold inference BatchNorm + conv bias into per-channel (scale, shift):
    ``y = (conv + bias) * scale + shift`` == ``BN(conv + bias)``."""
    scale = gamma / jnp.sqrt(var + eps)
    shift = beta - mean * scale + conv_bias * scale
    return scale, shift


def _stage_kernel(x_ref, w_ref, scale_ref, shift_ref, o_ref, *,
                  k_taps: int, t_out: int, pool: int):
    """x_ref: (Bt, T_padded, C); w_ref: (K, C, O); o_ref: (Bt, T_pool, O)."""
    t_conv = t_out * pool  # pooled-coverage length (floor semantics)
    bt = x_ref.shape[0]
    o_ch = w_ref.shape[2]

    # accumulate over kernel taps with ref-based dynamic slices: one live
    # (Bt, t_conv, C) buffer instead of K materialized shifted copies
    # (K=15 copies of the conv1 input blow the 16 MB VMEM budget at B=64)
    def tap(k, acc):
        xs = x_ref[:, pl.ds(k, t_conv), :]
        return acc + jax.lax.dot_general(
            xs, w_ref[k],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, k_taps, tap, jnp.zeros((bt, t_conv, o_ch), jnp.float32)
    )

    y = acc * scale_ref[0][None, None, :] + shift_ref[0][None, None, :]
    # erf-GELU (torch default; reference uses nn.GELU()); polynomial erf
    y = 0.5 * y * (1.0 + _erf(y / math.sqrt(2.0)))
    bt = y.shape[0]
    o = y.reshape(bt, t_out, pool, y.shape[-1]).max(axis=2)
    o_ref[:] = o.astype(o_ref.dtype)


def fused_conv_bn_gelu_pool(
    x: jnp.ndarray,          # (B, T, C) NLC
    weight: jnp.ndarray,     # (O, C, K) torch layout
    scale: jnp.ndarray,      # (O,) folded BN scale (see fold_bn)
    shift: jnp.ndarray,      # (O,) folded BN shift
    padding: int,
    pool: int,
    block_b: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused serving-path stem stage; returns (B, (T // pool), O).

    Matches ``gelu(BN(conv1d(x))) |> max_pool1d(pool)`` with inference BN.
    """
    b, t, c = x.shape
    o_ch, _, k_taps = weight.shape
    t_out = t // pool
    w = jnp.transpose(weight, (2, 1, 0))  # (K, C, O)

    b_pad = (-b) % block_b
    xp = jnp.pad(x, ((0, b_pad), (padding, padding), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        functools.partial(
            _stage_kernel, k_taps=k_taps, t_out=t_out, pool=pool
        ),
        grid=((b + b_pad) // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, t + 2 * padding, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_taps, c, o_ch), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, t_out, o_ch), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + b_pad, t_out, o_ch), x.dtype),
        # B=512 serving overflowed the 16 MB default scoped-VMEM cap by
        # 12 KB (v5e has 128 MB); headroom for large serving batches
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(xp, w, scale.reshape(1, o_ch), shift.reshape(1, o_ch))
    return out[:b]
