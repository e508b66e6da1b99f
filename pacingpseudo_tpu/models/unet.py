"""Flax UNet backbone (NHWC, TPU-native).

Re-design of the reference 2D UNet (reference: models/unet.py:10-193) as a
Flax linen module:

* 6 encoder stages / 5 decoder stages; stage channels
  ``[min(max_ch, init_ch * 2**k) for k in range(6)]`` = 32..512 at the
  defaults (reference: models/unet.py:27-31);
* ``output_stride`` in {8, 16, 32}: at 16/8 the deep stages trade
  subsampling for dilated (atrous) convolutions, dilation 2/4, following
  FCIS (reference: models/unet.py:33-53; driver default is 8,
  train_chaos.py:74);
* blocks: EncBlock = optional 2x2 max-pool (or stride-2 conv) + DoubleConv;
  DecBlock = 2x align-corners bilinear upsample (or 2x2 transposed conv) +
  skip concat + DoubleConv; ConvLayer = Conv -> BatchNorm -> LeakyReLU(0.01)
  (reference: models/unet.py:100-193);
* returns the same named end-points dict
  (``encoder/stage1..6``, ``decoder/stage5..1``, ``segmentation/logits``)
  but as a function return value, not mutable module state.

TPU-first choices: NHWC layout throughout, align-corners upsampling as MXU
matmuls (see ops/resize.py), optional bfloat16 compute with float32 params
and BatchNorm statistics, weight init matching torch's Conv2d default
(kaiming-uniform, a=sqrt(5)) so training dynamics match the reference.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from pacingpseudo_tpu.models.norm import BNParamsOnly, MatmulBatchNorm
from pacingpseudo_tpu.ops.pallas.fused_convbn import (
    conv_bn_lrelu_train, fusable, get_conv_impl)
from pacingpseudo_tpu.ops.resize import upsample2x_align_corners
from pacingpseudo_tpu.ops.s2d import (
    depth_to_space,
    expand_kernel1x1,
    expand_kernel3x3,
    get_layout_impl,
    group_concat,
    group_concat_plain,
    group_max_pool,
    max_pool2x2_firstmax,
    s2d_block_input_perm,
    space_to_depth,
    upsample2x_align_corners_s2d,
)

Dtype = Any


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)).

    Flax kernel shape is (kh, kw, in_ch, out_ch); fan_in = kh*kw*in_ch.
    Bound works out to ``1/sqrt(fan_in)`` (gain sqrt(1/3) * sqrt(3/fan_in)).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    """torch Conv2d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvParamsOnly(nn.Module):
    """Conv parameter declarations without a compute path — identical
    names/shapes/inits to ``nn.Conv`` under the same scope name ("conv"),
    so the fused Pallas ConvLayer path shares checkpoints and init draws
    with the unfused path (flax keys param init RNG by scope path)."""

    features: int
    in_features: int
    kernel_size: int = 3

    def setup(self):
        ks = self.kernel_size
        self.kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (ks, ks, self.in_features, self.features))
        self.bias = self.param(
            "bias", make_torch_bias_init(ks * ks * self.in_features),
            (self.features,))

    def __call__(self):
        return self.kernel, self.bias


class ConvLayer(nn.Module):
    """Conv2d -> BatchNorm -> LeakyReLU(1e-2) (reference: models/unet.py:178-193).

    ``padded_in``/``padded_out`` select the padded-canvas I/O convention of
    the fused Pallas path (ops/pallas/fused_convbn.py) so chained layers
    (DoubleConv) hand the halo straight through; the unfused path honours
    the flags with a fused slice/pad.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    negative_slope: float = 1e-2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, padded_in: bool = False,
                 padded_out: bool = False):
        edge = 2 if padded_in else 0
        if (train and get_conv_impl() == "fused"
                and fusable(x.shape[1] - edge, x.shape[2] - edge,
                            self.kernel_size, self.stride, self.dilation)):
            kernel, cbias = ConvParamsOnly(
                self.features, x.shape[-1], self.kernel_size, name="conv")()
            bn = BNParamsOnly(self.features, name="norm")
            scale, beta = bn.affine()
            # Match nn.Conv(dtype=...): compute in self.dtype regardless of
            # the input dtype, so both implementations share semantics
            # (ADVICE r4).
            x = x.astype(self.dtype)
            xp = x if padded_in else jnp.pad(
                x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            zp, m, v = conv_bn_lrelu_train(
                xp, kernel, cbias, scale, beta, 1e-5, 1,
                self.negative_slope)
            bn(m, v)
            return zp if padded_out else zp[:, 1:-1, 1:-1, :]
        if padded_in:
            x = x[:, 1:-1, 1:-1, :]
        pad = self.dilation if self.kernel_size == 3 else 0
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1]
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            name="conv",
        )(x)
        # BatchNorm statistics always in float32; torch defaults eps=1e-5,
        # momentum=0.1 (flax momentum = 1 - 0.1).  With jit+NamedSharding
        # data parallelism the batch mean/var below are global reductions, so
        # cross-replica sync-BN holds by construction (SURVEY.md §5).
        # MatmulBatchNorm == nn.BatchNorm semantics with the statistic (and
        # backward) reductions as MXU matmuls — the round-2 profiled
        # convert_reduce stall fix (ops/fused_bn.py).
        x = MatmulBatchNorm(name="norm")(x, use_running_average=not train)
        x = nn.leaky_relu(x.astype(self.dtype),
                          negative_slope=self.negative_slope)
        if padded_out:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return x


class DoubleConv(nn.Module):
    """Two ConvLayers (reference: models/unet.py:154-176)."""

    features: int
    stride1: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # Chain the padded canvas between the two layers when both take
        # the fused Pallas path (stride-1 keeps the extents, so one gate
        # covers both) — the halo is produced once and handed through.
        chain = (train and get_conv_impl() == "fused"
                 and self.stride1 == 1
                 and fusable(x.shape[1], x.shape[2], 3, 1, self.dilation))
        x = ConvLayer(self.features, 3, self.stride1, self.dilation,
                      dtype=self.dtype, name="conv_layer1")(
            x, train, padded_out=chain)
        x = ConvLayer(self.features, 3, 1, self.dilation,
                      dtype=self.dtype, name="conv_layer2")(
            x, train, padded_in=chain)
        return x


class EncBlock(nn.Module):
    """Encoder block (reference: models/unet.py:100-127)."""

    features: int
    do_subsamp: bool = True
    is_stride_conv: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        stride1 = 1
        if self.do_subsamp and not self.is_stride_conv:
            # Layout v2: reshape-view pool with first-max VJP instead of
            # reduce_window — avoids the select-and-scatter backward's
            # H-minor layout preference (ops/s2d.py, identical values and
            # tie routing).
            if (get_layout_impl() == "v2"
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                x = max_pool2x2_firstmax(x)
            else:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        elif self.do_subsamp and self.is_stride_conv:
            stride1 = 2
        x = DoubleConv(self.features, stride1=stride1, dilation=self.dilation,
                       dtype=self.dtype, name="conv_block")(x, train)
        return x


class DecBlock(nn.Module):
    """Decoder block (reference: models/unet.py:129-152).

    ``up_factor`` is the upsample scale (1 disables, matching the stride-1
    DecBlocks of output_stride 8/16 configs).
    """

    features: int
    up_factor: int = 2
    is_trans_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        if self.is_trans_conv:
            # nnUNet-style: transposed conv maps lower_ch -> skip_ch.
            # transpose_kernel=True selects torch ConvTranspose2d semantics
            # (gradient-of-conv: spatially flipped kernel, (kh,kw,out,in)
            # layout) so reference checkpoints import bit-compatibly.
            x = nn.ConvTranspose(
                features=skip.shape[-1],
                kernel_size=(self.up_factor, self.up_factor),
                strides=(self.up_factor, self.up_factor),
                padding="VALID",
                use_bias=False,
                transpose_kernel=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=torch_conv_kernel_init,
                name="up_samp",
            )(x)
        elif self.up_factor != 1:
            x = upsample2x_align_corners(x)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = DoubleConv(self.features, dtype=self.dtype, name="conv_block")(x, train)
        return x


# ---------------------------------------------------------------------------
# Space-to-depth (S2D) variants of the high-resolution stage-1 blocks.
#
# Parameters are LOGICAL — identical names, shapes and init draws to the
# plain ConvLayer/DoubleConv path (conv/{kernel,bias}, norm/{scale,bias} +
# batch_stats norm/{mean,var}) — so checkpoints, the torch importer/
# exporter and the parity tests are oblivious to the layout.  The dense
# S2D kernels are expanded from the logical parameters inside the traced
# forward (ops/s2d.py), so autodiff returns exact logical gradients.
# Measured on-chip: the stage-1 DoubleConv fwd+bwd drops 8.4 -> 3.3 ms
# (XLA's conv emitter runs 32-channel 256^2 convs at ~6% MFU; the
# 128-lane S2D formulation trades 4x structural-zero FLOPs for ~2.5x
# wall-clock).
# ---------------------------------------------------------------------------


class _S2DConv(nn.Module):
    """Logical conv params, dense S2D execution (name it "conv").

    ``in_splits=(ca, cb)`` declares the input as a layout-v2 BLOCK-order
    concat (``group_concat_plain``); the dense kernel's input axis is
    permuted to match (ops/s2d.py:s2d_block_input_perm) — parameters stay
    logical either way."""

    features: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32
    in_splits: tuple | None = None

    @nn.compact
    def __call__(self, x2):
        cin = x2.shape[-1] // 4
        ks = self.kernel_size
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (ks, ks, cin, self.features))
        bias = self.param("bias", make_torch_bias_init(ks * ks * cin),
                          (self.features,))
        dense = (expand_kernel3x3(kernel) if ks == 3
                 else expand_kernel1x1(kernel))
        if self.in_splits is not None:
            dense = dense[:, :, s2d_block_input_perm(*self.in_splits), :]
        dense = dense.astype(self.dtype)
        pad = 1 if ks == 3 else 0
        y = jax.lax.conv_general_dilated(
            x2.astype(self.dtype), dense, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        return y + jnp.tile(bias, 4).astype(self.dtype)


class S2DConvLayer(nn.Module):
    """S2D Conv -> BatchNorm -> LeakyReLU with ConvLayer-identical params.

    The norm is per-LOGICAL-channel statistics over the four (p, q) S2D
    groups (params/stats shapes (C,), phys layout ``g*C + i``)."""

    features: int
    negative_slope: float = 1e-2
    dtype: Dtype = jnp.float32
    in_splits: tuple | None = None

    @nn.compact
    def __call__(self, x2, train: bool, padded_in: bool = False,
                 padded_out: bool = False):
        edge = 2 if padded_in else 0
        if (train and get_conv_impl() == "fused"
                and fusable(x2.shape[1] - edge, x2.shape[2] - edge, 3, 1, 1)):
            cin = x2.shape[-1] // 4
            kernel, cbias = ConvParamsOnly(self.features, cin, 3,
                                           name="conv")()
            bn = BNParamsOnly(self.features, name="norm")
            scale, beta = bn.affine()
            x2 = x2.astype(self.dtype)  # match _S2DConv(dtype=...) semantics
            xp = x2 if padded_in else jnp.pad(
                x2, ((0, 0), (1, 1), (1, 1), (0, 0)))
            dense = expand_kernel3x3(kernel)
            if self.in_splits is not None:
                dense = dense[:, :, s2d_block_input_perm(*self.in_splits), :]
            zp, m, v = conv_bn_lrelu_train(
                xp, dense, jnp.tile(cbias, 4),
                scale, beta, 1e-5, 4, self.negative_slope)
            bn(m, v)
            return zp if padded_out else zp[:, 1:-1, 1:-1, :]
        if padded_in:
            x2 = x2[:, 1:-1, 1:-1, :]
        x2 = _S2DConv(self.features, 3, dtype=self.dtype,
                      in_splits=self.in_splits, name="conv")(x2)
        x2 = MatmulBatchNorm(groups=4, name="norm")(
            x2, use_running_average=not train)
        x2 = nn.leaky_relu(x2.astype(self.dtype),
                           negative_slope=self.negative_slope)
        if padded_out:
            x2 = jnp.pad(x2, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return x2


class S2DDoubleConv(nn.Module):
    features: int
    dtype: Dtype = jnp.float32
    in_splits: tuple | None = None   # block-order input (first layer only)

    @nn.compact
    def __call__(self, x2, train: bool):
        chain = (train and get_conv_impl() == "fused"
                 and fusable(x2.shape[1], x2.shape[2], 3, 1, 1))
        x2 = S2DConvLayer(self.features, dtype=self.dtype,
                          in_splits=self.in_splits,
                          name="conv_layer1")(x2, train, padded_out=chain)
        x2 = S2DConvLayer(self.features, dtype=self.dtype,
                          name="conv_layer2")(x2, train, padded_in=chain)
        return x2


class _S2DBlock(nn.Module):
    """Param-scope wrapper so the S2D DoubleConv lands at
    ``<enc|dec>_blockK/conv_block`` exactly like EncBlock/DecBlock."""

    features: int
    dtype: Dtype = jnp.float32
    in_splits: tuple | None = None

    @nn.compact
    def __call__(self, x2, train: bool):
        return S2DDoubleConv(self.features, dtype=self.dtype,
                             in_splits=self.in_splits,
                             name="conv_block")(x2, train)


class UNet(nn.Module):
    """The segmentation backbone; returns a dict of named end-points.

    Constructor args mirror the reference (models/unet.py:10-20); tensors
    are NHWC.  ``dtype`` selects the activation compute dtype (bfloat16 for
    speed; params and BN stats stay float32).  Logits are always returned in
    float32.
    """

    input_ch: int = 1
    init_ch: int = 32
    max_ch: int = 512
    num_classes: int = 4
    output_stride: int = 32
    is_stride_conv: bool = False
    is_trans_conv: bool = False
    elab_end_points: bool = False
    s2d_hires: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.is_trans_conv == self.is_stride_conv, (
            "Only combo of stride_conv and trans_conv or maxpool and upsample is allowed.")
        assert self.output_stride in (8, 16, 32)
        ch = [min(self.max_ch, (2 ** k) * self.init_ch) for k in range(6)]
        dt = self.dtype
        x = x.astype(dt)

        # S2D applies to the max-pool/bilinear variant on even extents
        # (every canvas is a multiple of 32); stride/trans-conv variants
        # keep the plain path.
        use_s2d = (self.s2d_hires and not self.is_stride_conv
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)

        if use_s2d:
            enc1_s2d = _S2DBlock(ch[0], dtype=dt, name="enc_block1")(
                space_to_depth(x), train)
            enc1 = depth_to_space(enc1_s2d)   # end-points view (DCE'd if unused)
            # EncBlock2's 2x2 max-pool == the S2D channel-group max: feed the
            # pooled plain tensor and skip the block's own subsampling.
            # (Stage-2 S2D was measured NET NEGATIVE: at 64 channels XLA's
            # conv is efficient enough that the 4x structural-zero FLOPs
            # plus transposes lose — 168 vs 176 slices/sec.)
            enc2 = EncBlock(ch[1], do_subsamp=False,
                            is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block2")(
                group_max_pool(enc1_s2d), train)
        else:
            enc1 = EncBlock(ch[0], do_subsamp=False, is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block1")(x, train)
            enc2 = EncBlock(ch[1], is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block2")(enc1, train)
        enc3 = EncBlock(ch[2], is_stride_conv=self.is_stride_conv,
                        dtype=dt, name="enc_block3")(enc2, train)
        enc4 = EncBlock(ch[3], is_stride_conv=self.is_stride_conv,
                        dtype=dt, name="enc_block4")(enc3, train)

        if self.output_stride == 32:
            enc5 = EncBlock(ch[4], is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block5")(enc4, train)
            enc6 = EncBlock(ch[5], is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block6")(enc5, train)
            up5, up4 = 2, 2
        elif self.output_stride == 16:
            enc5 = EncBlock(ch[4], is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block5")(enc4, train)
            enc6 = EncBlock(ch[5], do_subsamp=False, dilation=2,
                            is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block6")(enc5, train)
            up5, up4 = 1, 2
        else:  # output_stride == 8 (driver default, train_chaos.py:74)
            enc5 = EncBlock(ch[4], do_subsamp=False, dilation=2,
                            is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block5")(enc4, train)
            enc6 = EncBlock(ch[5], do_subsamp=False, dilation=4,
                            is_stride_conv=self.is_stride_conv,
                            dtype=dt, name="enc_block6")(enc5, train)
            up5, up4 = 1, 1

        dec5 = DecBlock(ch[4], up_factor=up5, is_trans_conv=self.is_trans_conv,
                        dtype=dt, name="dec_block5")(enc6, enc5, train)
        dec4 = DecBlock(ch[3], up_factor=up4, is_trans_conv=self.is_trans_conv,
                        dtype=dt, name="dec_block4")(dec5, enc4, train)
        dec3 = DecBlock(ch[2], up_factor=2, is_trans_conv=self.is_trans_conv,
                        dtype=dt, name="dec_block3")(dec4, enc3, train)
        dec2 = DecBlock(ch[1], up_factor=2, is_trans_conv=self.is_trans_conv,
                        dtype=dt, name="dec_block2")(dec3, enc2, train)
        if use_s2d:
            up1_s2d = upsample2x_align_corners_s2d(dec2)
            if get_layout_impl() == "v2":
                # Block-order concat + kernel-input permutation in the
                # consumer conv: same linear map, no lane-shuffle copy
                # (ops/s2d.py layout-v2 notes).
                cat = group_concat_plain(up1_s2d, enc1_s2d)
                dec1_s2d = _S2DBlock(ch[0], dtype=dt,
                                     in_splits=(ch[1], ch[0]),
                                     name="dec_block1")(cat, train)
            else:
                cat = group_concat(up1_s2d, enc1_s2d)
                dec1_s2d = _S2DBlock(ch[0], dtype=dt,
                                     name="dec_block1")(cat, train)
            dec1 = depth_to_space(dec1_s2d)   # end-points view (DCE'd if unused)
            logits = depth_to_space(_S2DConv(
                self.num_classes, 1, dtype=dt, name="final_conv")(dec1_s2d))
        else:
            dec1 = DecBlock(ch[0], up_factor=2, is_trans_conv=self.is_trans_conv,
                            dtype=dt, name="dec_block1")(dec2, enc1, train)

            fan_in = dec1.shape[-1]
            logits = nn.Conv(
                features=self.num_classes,
                kernel_size=(1, 1),
                dtype=dt,
                param_dtype=jnp.float32,
                kernel_init=torch_conv_kernel_init,
                bias_init=make_torch_bias_init(fan_in),
                name="final_conv",
            )(dec1)
        logits = logits.astype(jnp.float32)

        if not self.elab_end_points:
            return {"segmentation/logits": logits}
        return {
            "encoder/stage1": enc1,
            "encoder/stage2": enc2,
            "encoder/stage3": enc3,
            "encoder/stage4": enc4,
            "encoder/stage5": enc5,
            "encoder/stage6": enc6,
            "decoder/stage5": dec5,
            "decoder/stage4": dec4,
            "decoder/stage3": dec3,
            "decoder/stage2": dec2,
            "decoder/stage1": dec1,
            "segmentation/logits": logits,
        }
