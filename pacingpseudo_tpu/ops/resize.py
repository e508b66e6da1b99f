"""Exact align-corners bilinear resize as MXU matmuls.

The reference decoder upsamples with ``nn.Upsample(mode='bilinear',
align_corners=True)`` (reference: models/unet.py:144) and the aux path with
``F.interpolate(..., align_corners=True)`` (reference:
models/aux_path_memory.py:52,75).  ``jax.image.resize`` only implements
half-pixel (align_corners=False) sampling, so instead of emulating it with
gathers — slow on TPU — we materialise the (static) 1-D interpolation
matrices at trace time and apply them as two dense matmuls.  This is both
bit-accurate to torch's align_corners=True and MXU-friendly.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense ``(out_size, in_size)`` align-corners linear interpolation matrix."""
    w = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        w[:, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    pos = np.arange(out_size) * scale
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (pos - lo).astype(np.float32)
    w[np.arange(out_size), lo] = 1.0 - frac
    w[np.arange(out_size), lo + 1] = frac
    return w


def bilinear_resize_align_corners(x, out_h: int, out_w: int):
    """Resize ``(N, H, W, C)`` to ``(N, out_h, out_w, C)``, align_corners=True.

    Exact parity with ``F.interpolate(mode='bilinear', align_corners=True)``
    up to float associativity; implemented as two dense contractions so XLA
    tiles it onto the MXU.
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    wh = jnp.asarray(_interp_matrix(h, out_h), dtype)
    ww = jnp.asarray(_interp_matrix(w, out_w), dtype)
    # (N,H,W,C) -> (N,out_h,W,C) -> (N,out_h,out_w,C)
    x = jnp.einsum("oh,nhwc->nowc", wh, x)
    x = jnp.einsum("pw,nowc->nopc", ww, x)
    return x


def upsample2x_align_corners(x):
    """2x bilinear upsample, align_corners=True (decoder hot path)."""
    _, h, w, _ = x.shape
    return bilinear_resize_align_corners(x, 2 * h, 2 * w)
