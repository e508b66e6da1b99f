"""Batch-norm training statistics as MXU matmuls (custom VJP).

Round-2 profiling (NOTES.md gap 2) showed the BatchNorm statistic
reductions of the high-resolution stages costing ~25% of the train step:
XLA lowers ``mean(x) / mean(x^2)`` over (N, H, W) to convert_reduce
fusions that stream 200-400 MB at ~150 GB/s (channel-minor reduces keep
only C of 128 lanes busy at C=32/64), and the BN *backward* creates the
same shape of reduce twice more (sum(g), sum(g*xhat)).

This module reformulates every one of those reductions as a matrix
product, which reads the activation at full HBM bandwidth and runs on the
MXU regardless of C:

  forward:   sum(x)   = ones^T X            (matvec)
             sum(x^2) = diag(X^T X)          (Gram diagonal; bf16 inputs
                                              multiply exactly into f32)
  backward:  sum(g)       = ones^T G
             sum(g * x)   = diag(G^T X)
             sum(g * xhat) = (sum(g*x) - m * sum(g)) * r
             dx = r*gamma * (g - sum(g)/n - xhat * sum(g*xhat)/n)

The Gram products spend n*C^2 extra structural FLOPs (tens of µs at these
shapes) to avoid the slow reduces entirely; the remaining elementwise
normalize/dx terms fuse into neighbouring ops as usual.

Semantics match ``flax.linen.BatchNorm`` (population variance, f32
statistics) plus the S2D group extension (``groups=4``: statistics per
LOGICAL channel across the four space-to-depth groups, phys channel
layout ``g*c + i`` as produced by ``jnp.tile``, models/unet.py
_S2DBatchNorm).  Reference semantics: torch BatchNorm2d inside ConvLayer,
/root/reference/models/unet.py:178-193.

The ``mean``/``var`` outputs exist ONLY to feed the running-statistics
EMA; their cotangents are treated as zero (callers wrap them in
``stop_gradient``), exactly matching how flax updates running stats
outside the gradient.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _fold_groups(vec, groups):
    """(groups*c,) phys vector -> (c,) logical sum over groups."""
    if groups == 1:
        return vec
    return vec.reshape(groups, -1).sum(axis=0)


def _tile_groups(vec, groups):
    return jnp.tile(vec, groups) if groups > 1 else vec


def _matmul_sums(x2d, groups):
    """(sum_x, sum_x2) per logical channel via MXU products.

    ``x2d``: (n, C_phys) in the compute dtype (bf16 products accumulate
    exactly in f32: 8-bit mantissas multiply into 16 bits < f32's 24).

    ``Precision.HIGHEST`` matters only for f32 inputs: at DEFAULT the TPU
    MXU truncates f32 operands to one bf16 pass, which the round-5 on-chip
    parity gate measured at 0.22 max grad error vs the reduce path
    (study_r5/chipq/chip_parity.json); multi-pass restores f32 accuracy at
    negligible cost (these products are skinny and HBM-bound, and for bf16
    inputs the flag is a no-op).
    """
    gram = lax.dot_general(x2d, x2d, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
    ones = jnp.ones((x2d.shape[0],), x2d.dtype)
    sums = lax.dot_general(ones, x2d, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
    return _fold_groups(sums, groups), _fold_groups(jnp.diagonal(gram), groups)


def _matmul_dot_sums(g2d, x2d, groups):
    """(sum_g, sum_gx) per logical channel for the backward pass."""
    prod = lax.dot_general(g2d, x2d, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
    ones = jnp.ones((g2d.shape[0],), g2d.dtype)
    sums = lax.dot_general(ones, g2d, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
    return _fold_groups(sums, groups), _fold_groups(jnp.diagonal(prod), groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def batch_norm_train(x, scale, bias, eps: float, groups: int):
    """Training-mode batch norm; returns ``(y, mean, var)``.

    ``x``: (..., C_phys) with C_phys = groups * C_logical; ``scale`` /
    ``bias``: (C_logical,) f32.  ``y`` is in x.dtype; ``mean`` / ``var``
    are f32 (C_logical,) population statistics for the EMA update only
    (zero-cotangent by contract — see module docstring).
    """
    y, m, v, _ = _bn_fwd_impl(x, scale, bias, eps, groups)
    return y, m, v


def _bn_fwd_impl(x, scale, bias, eps, groups):
    c_phys = x.shape[-1]
    n = x.size // c_phys * groups  # samples per logical channel
    x2d = x.reshape(-1, c_phys)
    sum_x, sum_x2 = _matmul_sums(x2d, groups)
    m = sum_x / n
    v = sum_x2 / n - jnp.square(m)
    r = lax.rsqrt(v + eps)
    m_t = _tile_groups(m, groups)
    rg_t = _tile_groups(r * scale, groups)
    b_t = _tile_groups(bias, groups)
    y = ((x.astype(jnp.float32) - m_t) * rg_t + b_t).astype(x.dtype)
    return y, m, v, r


def _bn_fwd(x, scale, bias, eps, groups):
    y, m, v, r = _bn_fwd_impl(x, scale, bias, eps, groups)
    return (y, m, v), (x, scale, m, r)


def _bn_bwd(eps, groups, res, cts):
    x, scale, m, r = res
    g = cts[0]  # cotangents of mean/var are zero by contract (EMA-only)
    c_phys = x.shape[-1]
    n = x.size // c_phys * groups
    g2d = g.reshape(-1, c_phys)
    x2d = x.reshape(-1, c_phys)
    sum_g, sum_gx = _matmul_dot_sums(g2d, x2d, groups)
    sum_g_xhat = (sum_gx - m * sum_g) * r
    dscale = sum_g_xhat
    dbias = sum_g
    m_t = _tile_groups(m, groups)
    r_t = _tile_groups(r, groups)
    rg_t = _tile_groups(r * scale, groups)
    xhat = (x.astype(jnp.float32) - m_t) * r_t
    dx = rg_t * (g.astype(jnp.float32)
                 - _tile_groups(sum_g / n, groups)
                 - xhat * _tile_groups(sum_g_xhat / n, groups))
    return dx.astype(x.dtype), dscale, dbias


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)


def batch_norm_train_reduce(x, scale, bias, eps: float, groups: int):
    """Reference reduce-based statistics (what ``flax.linen.BatchNorm``
    lowers to): plain ``jnp.mean`` reductions, autodiff backward.

    Kept as the measured A/B baseline for the matmul path — bench.py times
    both end-to-end (``PACING_BN_IMPL``); semantics are identical.
    """
    c_phys = x.shape[-1]
    c = c_phys // groups
    x32 = x.astype(jnp.float32)
    x_g = x32.reshape(-1, groups, c)
    m = jnp.mean(x_g, axis=(0, 1))
    v = jnp.mean(jnp.square(x_g), axis=(0, 1)) - jnp.square(m)
    r = lax.rsqrt(v + eps)
    m_t = _tile_groups(m, groups)
    rg_t = _tile_groups(r * scale, groups)
    b_t = _tile_groups(bias, groups)
    y = ((x32 - m_t) * rg_t + b_t).astype(x.dtype)
    return y, m, v


def batch_norm_eval(x, scale, bias, mean, var, eps: float, groups: int):
    """Inference-mode normalize with running statistics (pure elementwise;
    XLA fuses it — no custom VJP needed)."""
    r = lax.rsqrt(var + eps)
    m_t = _tile_groups(mean, groups)
    rg_t = _tile_groups(r * scale, groups)
    b_t = _tile_groups(bias, groups)
    return ((x.astype(jnp.float32) - m_t) * rg_t + b_t).astype(x.dtype)
