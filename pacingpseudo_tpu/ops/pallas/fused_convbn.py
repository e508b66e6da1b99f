"""Pallas TPU kernels: fused ConvLayer (3x3 conv + BN statistics + LReLU).

The reference ConvLayer is Conv2d -> BatchNorm2d -> LeakyReLU
(/root/reference/models/unet.py:178-193).  Round-2 profiling found the BN
statistic reductions of the high-resolution stages costing ~25% of the
train step; ops/fused_bn.py reformulated them as MXU Gram matmuls, but
those still make a SEPARATE full pass over the conv output (forward) and
over (g, y) (backward).  This module fuses the statistics INTO the conv
pass itself, and collapses the LeakyReLU backward into the BN-sums pass —
the remaining bandwidth on the table after MXU-BN (VERDICT r4 item 5):

  forward:  ONE Pallas kernel computes y = conv3x3(x) + b as nine shifted
            (TH*W, Ci) x (Ci, Co) MXU matmuls per row tile AND accumulates
            sum(y), sum(y^2) per channel across the sequential grid — the
            statistics cost zero extra HBM traffic.  The normalize+LReLU
            epilogue is one XLA elementwise pass (fuses with the output
            padding, see below).
  backward: kernel A reads (y, g) once and produces sum(g'), sum(g'*xhat)
            where g' is the LReLU-masked cotangent (the unfused path
            materialises g' as a separate elementwise pass first); one XLA
            elementwise pass then forms the conv-output cotangent dy;
            kernel B computes dx = conv3x3(dy, flipped kernel); dW uses
            XLA's native filter-gradient convolution (reads x, dy once —
            already optimal); db has a closed form in the per-PHYSICAL-
            channel sums the kernels already produce — no extra tensor
            pass (for groups=1, BN's mean subtraction makes the bias a
            no-op and the formula collapses to roundoff around zero).

Padded-canvas convention (the trick that makes halos free): the op takes
``xp`` = x padded by 1 on H and W, and returns ``zp`` = z padded by 1.
A Pallas input must materialise anyway, so producing it padded costs
nothing (the pad fuses into the producing XLA elementwise), and chained
ConvLayers (DoubleConv) hand the padded canvas straight through.  Inside a
kernel, halo rows are read from the padded input with element-granular
dynamic slices; blocked outputs stay unpadded-aligned.

VMEM: the grid is (N, 2) row-halves — padded full-image inputs are
revisited (one buffer + one prefetch), per-half outputs are block-mapped —
keeping the worst ConvLayer shape (128x128x128 bf16) around 13 MB.

Numerics: conv accumulates in f32 (``preferred_element_type``) and the
batch statistics are taken from the f32 accumulator BEFORE the cast to the
compute dtype — at bf16 this makes the statistics slightly MORE accurate
than the unfused path (which reads back the rounded y); parity tests pin
f32 exactly and bf16 to rounding tolerance.

Semantics match ConvLayer / S2DConvLayer (models/unet.py): population-
variance training BN with the S2D ``groups`` extension (statistics per
LOGICAL channel, physical layout ``g*C + i``), LeakyReLU(negative_slope).
``mean``/``var`` outputs are EMA-only (zero cotangent by contract, like
ops/fused_bn.batch_norm_train).

Selection: ``get_conv_impl()`` ("fused" | "xla"), env ``PACING_CONV_IMPL``,
default "xla" until the A/B lands in BENCH (bench.py times both).  The
kernels are single-chip; the mesh drivers keep the XLA path.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pacingpseudo_tpu.ops.fused_bn import _fold_groups, _tile_groups

_CONV_IMPL = None  # lazy: resolved from env on first use
_TH = 16  # row-tile height (bf16 sublane tile)

# Mosaic's default scoped-VMEM budget is 16 MiB; the full-image revisit
# blocks of the stage-1 256^2 shapes need 17.3 MiB (measured on chip,
# round-5 bench: "Scoped allocation with size 17.27M ... exceeded scoped
# vmem limit by 1.27M").  The v5e core has 128 MiB of physical VMEM, so
# raise the budget with ample headroom for the compiler's own buffers.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def set_conv_impl(impl: str) -> None:
    global _CONV_IMPL
    assert impl in ("fused", "xla"), impl
    _CONV_IMPL = impl


def get_conv_impl() -> str:
    global _CONV_IMPL
    if _CONV_IMPL is None:
        _CONV_IMPL = os.environ.get("PACING_CONV_IMPL", "xla")
        assert _CONV_IMPL in ("fused", "xla"), _CONV_IMPL
    return _CONV_IMPL


def fusable(h: int, w: int, kernel_size: int, stride: int,
            dilation: int) -> bool:
    """Static shape gate for the fused path: 3x3 stride-1 dilation-1 convs
    whose height splits into two halves of whole 16-row tiles (every
    training canvas is a multiple of 32)."""
    return (kernel_size == 3 and stride == 1 and dilation == 1
            and h % (2 * _TH) == 0 and w >= 8)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _conv_rows(xp_ref, w_ref, row0, th, w_out, ci, co):
    """conv3x3 for ``th`` output rows starting at PADDED row ``row0``:
    nine shifted-window matmuls accumulating f32 on the MXU."""
    acc = jnp.zeros((th * w_out, co), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = xp_ref[0, pl.ds(row0 + dh, th), dw:dw + w_out, :]
            xs = xs.reshape(th * w_out, ci)
            acc = acc + lax.dot_general(
                xs, w_ref[3 * dh + dw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _conv_stats_kernel(xp_ref, w_ref, b_ref, y_ref, stats_ref, *, th):
    """Forward: y = conv3x3(x) + b, plus per-channel (sum, sumsq) of the
    f32 accumulator, accumulated across the sequential (N, 2) grid."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        stats_ref[:, :] = jnp.zeros(stats_ref.shape, stats_ref.dtype)

    h_half, w_out, co = y_ref.shape[1], y_ref.shape[2], y_ref.shape[3]
    ci = xp_ref.shape[3]
    n_tiles = h_half // th

    def tile_body(t, carry):
        s1, s2 = carry
        # output row (global, unpadded) = j*h_half + t*th; padded row is +1,
        # and tap dh reads padded rows [g, g+th+2).
        g = j * h_half + t * th
        acc = _conv_rows(xp_ref, w_ref, g, th, w_out, ci, co)
        acc = acc + b_ref[0, :][None, :]
        y_ref[0, pl.ds(t * th, th), :, :] = (
            acc.reshape(th, w_out, co).astype(y_ref.dtype))
        s1 = s1 + jnp.sum(acc, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(acc * acc, axis=0, keepdims=True)
        return s1, s2

    s1, s2 = lax.fori_loop(
        0, n_tiles, tile_body,
        (jnp.zeros((1, co), jnp.float32), jnp.zeros((1, co), jnp.float32)))
    stats_ref[0:1, :] += s1
    stats_ref[1:2, :] += s2


def _bn_sums_kernel(y_ref, gzp_ref, aux_ref, sums_ref, *, th, slope):
    """Backward pass A: per-channel sum(g') and sum(g' * xhat) where
    g' = gz * LReLU'(yn) — the LReLU backward collapses into this read
    instead of materialising a masked-cotangent tensor.

    ``aux_ref``: (4, Co) f32 rows [mean, rstd, gamma, beta] (physical)."""
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        sums_ref[:, :] = jnp.zeros(sums_ref.shape, sums_ref.dtype)

    h_half, w_out, co = y_ref.shape[1], y_ref.shape[2], y_ref.shape[3]
    m = aux_ref[0:1, :].reshape(1, 1, co)
    r = aux_ref[1:2, :].reshape(1, 1, co)
    ga = aux_ref[2:3, :].reshape(1, 1, co)
    be = aux_ref[3:4, :].reshape(1, 1, co)
    n_tiles = h_half // th

    def tile_body(t, carry):
        s1, s2 = carry
        y32 = y_ref[0, pl.ds(t * th, th), :, :].astype(jnp.float32)
        # gz center rows: padded row = j*h_half + t*th + 1, cols [1, W+1).
        gz = gzp_ref[0, pl.ds(j * h_half + t * th + 1, th),
                     1:w_out + 1, :].astype(jnp.float32)
        xhat = (y32 - m) * r
        yn = xhat * ga + be
        gaff = gz * jnp.where(yn >= 0, 1.0, slope)
        flat = gaff.reshape(th * w_out, co)
        flat_x = (gaff * xhat).reshape(th * w_out, co)
        s1 = s1 + jnp.sum(flat, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(flat_x, axis=0, keepdims=True)
        return s1, s2

    s1, s2 = lax.fori_loop(
        0, n_tiles, tile_body,
        (jnp.zeros((1, co), jnp.float32), jnp.zeros((1, co), jnp.float32)))
    sums_ref[0:1, :] += s1
    sums_ref[1:2, :] += s2


def _conv_pad_out_kernel(dyp_ref, w_ref, dxp_ref, *, th):
    """Backward pass B: dxp = pad(conv3x3(dy, flipped kernel)).

    The output block is a (H+2)/2-row half of the PADDED dx canvas, so the
    cotangent hands straight to the previous fused layer with no extra
    XLA pad pass.  Border rows/cols are zeroed by a block-wide clear, then
    the four 16-row center tiles are written at local offset (1 - j)."""
    j = pl.program_id(1)
    hp_half, wp, ci = dxp_ref.shape[1], dxp_ref.shape[2], dxp_ref.shape[3]
    w_out = wp - 2
    h_half = hp_half - 1  # center rows per half: (H+2)/2 - 1 = H/2
    co = dyp_ref.shape[3]
    n_tiles = h_half // th

    dxp_ref[:, :, :, :] = jnp.zeros(dxp_ref.shape, dxp_ref.dtype)

    def tile_body(t, _):
        # center output row (global, unpadded): g = j*h_half + t*th;
        # reads dyp padded rows [g, g+th+2); writes local padded row
        # (g + 1) - j*hp_half = (1 - j) + t*th.
        g = j * h_half + t * th
        acc = _conv_rows(dyp_ref, w_ref, g, th, w_out, co, ci)
        lrow = (1 - j) + t * th
        dxp_ref[0, pl.ds(lrow, th), 1:w_out + 1, :] = (
            acc.reshape(th, w_out, ci).astype(dxp_ref.dtype))
        return 0

    lax.fori_loop(0, n_tiles, tile_body, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _full_spec(shape):
    """Padded full-image input, revisited by both row-half programs."""
    return pl.BlockSpec((1,) + shape[1:], lambda i, j: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, j: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _half_spec(shape_half):
    return pl.BlockSpec((1,) + shape_half, lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)


def _conv_stats_call(xp, w9, bias, co):
    n, hp, wp, ci = xp.shape
    h, w = hp - 2, wp - 2
    y, sums = pl.pallas_call(
        functools.partial(_conv_stats_kernel, th=_TH),
        grid=(n, 2),
        in_specs=[_full_spec(xp.shape), _const_spec(w9.shape),
                  _const_spec((1, co))],
        out_specs=[_half_spec((h // 2, w, co)), _const_spec((2, co))],
        out_shape=[jax.ShapeDtypeStruct((n, h, w, co), xp.dtype),
                   jax.ShapeDtypeStruct((2, co), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * ci * co,
            bytes_accessed=xp.size * xp.dtype.itemsize * 2,
            transcendentals=0),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(xp, w9, bias.reshape(1, co).astype(jnp.float32))
    return y, sums


def _bn_sums_call(y, gzp, aux, slope):
    n, h, w, co = y.shape
    return pl.pallas_call(
        functools.partial(_bn_sums_kernel, th=_TH, slope=slope),
        grid=(n, 2),
        in_specs=[_half_spec((h // 2, w, co)), _full_spec(gzp.shape),
                  _const_spec((4, co))],
        out_specs=_const_spec((2, co)),
        out_shape=jax.ShapeDtypeStruct((2, co), jnp.float32),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(y, gzp, aux)


def _conv_pad_out_call(dyp, w9t, ci):
    n, hp, wp, co = dyp.shape
    return pl.pallas_call(
        functools.partial(_conv_pad_out_kernel, th=_TH),
        grid=(n, 2),
        in_specs=[_full_spec(dyp.shape), _const_spec(w9t.shape)],
        out_specs=_half_spec((hp // 2, wp, ci)),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, ci), dyp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (hp - 2) * (wp - 2) * 9 * ci * co,
            bytes_accessed=dyp.size * dyp.dtype.itemsize * 2,
            transcendentals=0),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(dyp, w9t)


# ---------------------------------------------------------------------------
# The differentiable op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv_bn_lrelu_train(xp, kernel, bias, scale, beta, eps: float,
                        groups: int, negative_slope: float):
    """Fused training-mode ConvLayer on a padded canvas.

    Args:
      xp: (N, H+2, W+2, Ci) input padded by 1 (compute dtype).
      kernel: (3, 3, Ci, Co) f32 (dense — S2D callers pass the expanded
        kernel; autodiff chains back through the expansion).
      bias: (Co,) f32 physical conv bias.
      scale/beta: (C_logical,) f32 BN affine (C_logical = Co // groups).
      eps/groups/negative_slope: static.
    Returns:
      (zp, mean, var): zp is (N, H+2, W+2, Co) padded output; mean/var are
      (C_logical,) f32 population statistics for the EMA only (their
      cotangents are zero by contract — callers stop_gradient them).
    """
    zp, m, v, _ = _fwd_impl(xp, kernel, bias, scale, beta, eps, groups,
                            negative_slope)
    return zp, m, v


def _fwd_impl(xp, kernel, bias, scale, beta, eps, groups, slope):
    n, hp, wp, ci = xp.shape
    co = kernel.shape[-1]
    dt = xp.dtype
    w9 = kernel.astype(dt).reshape(9, ci, co)
    y, sums = _conv_stats_call(xp, w9, bias, co)
    cnt = n * (hp - 2) * (wp - 2) * groups
    m = _fold_groups(sums[0], groups) / cnt
    v = _fold_groups(sums[1], groups) / cnt - jnp.square(m)
    r = lax.rsqrt(v + eps)
    m_t = _tile_groups(m, groups)
    rg_t = _tile_groups(r * scale, groups)
    b_t = _tile_groups(beta, groups)
    yn = (y.astype(jnp.float32) - m_t) * rg_t + b_t
    z = jnp.where(yn >= 0, yn, yn * slope).astype(dt)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return zp, m, v, (y, m, r, sums[0])


def _fwd(xp, kernel, bias, scale, beta, eps, groups, slope):
    zp, m, v, (y, m_, r, sum_y_phys) = _fwd_impl(
        xp, kernel, bias, scale, beta, eps, groups, slope)
    return (zp, m, v), (xp, kernel, y, scale, beta, m, r, sum_y_phys)


def _bwd(eps, groups, slope, res, cts):
    xp, kernel, y, scale, beta, m, r, sum_y_phys = res
    gzp = cts[0]  # (n, hp, wp, co); mean/var cotangents are zero (EMA-only)
    n, h, w, co = y.shape
    ci = xp.shape[-1]
    dt = y.dtype
    cnt = n * h * w * groups

    m_t = _tile_groups(m, groups)
    r_t = _tile_groups(r, groups)
    ga_t = _tile_groups(scale, groups)
    be_t = _tile_groups(beta, groups)
    aux = jnp.stack([m_t, r_t, ga_t, be_t]).astype(jnp.float32)

    sums = _bn_sums_call(y, gzp.astype(dt), aux, slope)
    sum_g = _fold_groups(sums[0], groups)
    sum_gx = _fold_groups(sums[1], groups)
    dscale = sum_gx
    dbeta = sum_g

    # Conv-output cotangent dy (one fused XLA elementwise pass over
    # (gz, y)), emitted BOTH padded (for the dx kernel) and unpadded (for
    # the XLA filter gradient) out of the same fusion.
    gz = gzp[:, 1:-1, 1:-1, :].astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    xhat = (y32 - m_t) * r_t
    yn = xhat * ga_t + be_t
    gaff = gz * jnp.where(yn >= 0, 1.0, slope)
    rg_t = _tile_groups(r * scale, groups)
    dy32 = rg_t * (gaff - _tile_groups(sum_g / cnt, groups)
                   - xhat * _tile_groups(sum_gx / cnt, groups))
    dy = dy32.astype(dt)
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # dx: conv of dy with the spatially flipped, in/out-transposed kernel.
    w9t = jnp.transpose(kernel.astype(dt)[::-1, ::-1], (0, 1, 3, 2)
                        ).reshape(9, co, ci)
    dxp = _conv_pad_out_call(dyp, w9t, ci)

    # dW: XLA's native filter-gradient convolution — x as the "image" with
    # batch<->feature swapped so the (3,3) taps fall out as the spatial
    # output; dimension specs avoid any materialised transpose.
    dkernel = lax.conv_general_dilated(
        xp, dy,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.float32)
    # "NHWC" output reads as (Ci, 3, 3, Co) -> (3, 3, Ci, Co)
    dkernel = jnp.transpose(dkernel, (1, 2, 0, 3))

    # Conv bias gradient: db_phys = sum_pixels dy_phys, which has a closed
    # form in the per-PHYSICAL-channel sums already accumulated (for
    # groups=1 BN absorbs the bias and this collapses to roundoff noise
    # around the true zero, exactly like the unfused autodiff).
    cnt_phys = n * h * w
    sum_xhat_phys = (sum_y_phys - cnt_phys * m_t) * r_t
    dbias = rg_t * (sums[0] - cnt_phys * _tile_groups(sum_g / cnt, groups)
                    - _tile_groups(sum_gx / cnt, groups) * sum_xhat_phys)

    return dxp.astype(xp.dtype), dkernel, dbias, dscale, dbeta


conv_bn_lrelu_train.defvjp(_fwd, _bwd)


def conv_bn_lrelu_reference(xp, kernel, bias, scale, beta, eps: float,
                            groups: int, negative_slope: float):
    """Unfused twin (XLA conv + ops/fused_bn reduce statistics + LReLU) on
    the same padded-canvas contract; the parity oracle for the tests."""
    from pacingpseudo_tpu.ops.fused_bn import batch_norm_train_reduce

    x = xp[:, 1:-1, 1:-1, :]
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype) + bias.astype(x.dtype)
    yn, m, v = batch_norm_train_reduce(y, scale, beta, eps, groups)
    z = jnp.where(yn >= 0, yn, yn * jnp.asarray(negative_slope, yn.dtype))
    zp = jnp.pad(z.astype(x.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return zp, m, v
