"""Resampling primitives for the fused on-device augmentation warp.

The reference augmentation chain resamples up to three times per sample on
the host (scale -> elastic -> rotate, datasets/augmentations.py:191-317).
The TPU engine composes every geometric transform into ONE inverse
coordinate map per output pixel and samples the source exactly once:

* images: bilinear gather (4 taps).  The reference uses cubic (order 3) at
  each stage; one bilinear tap of the composed map trades a slightly
  different interpolation kernel for strictly less accumulated blur —
  statistical parity (SURVEY.md §7 hard-parts list).
* labels / scribbles: 4-tap **weighted class vote** — the bilinear weights
  vote over the neighbours' classes and argmax wins.  This reproduces the
  reference's one-hot-bilinear-then-argmax label scaling
  (augmentations.py:216-227) and degrades gracefully to nearest-neighbour
  when one tap dominates.

All gathers are flat 1-D ``jnp.take`` over the raveled source so XLA lowers
a single gather op per tap.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _flat_take(src, iy, ix):
    """Gather ``src[iy, ix]`` via a flat 1-D take (single XLA gather)."""
    h, w = src.shape
    flat = jnp.take(src.reshape(-1), (iy * w + ix).reshape(-1))
    return flat.reshape(iy.shape)


def bilinear_sample(src, sy, sx, bound_h=None, bound_w=None):
    """Bilinearly sample ``src`` (H, W) at real coordinates (sy, sx).

    Coordinates are clamped to ``[0, bound-1]`` (the reference's
    ``mode='nearest'`` / clip semantics).  ``bound_h/bound_w`` default to
    the array size; pass the *live* region extent when the array is a
    padded canvas.
    """
    h, w = src.shape
    bh = h if bound_h is None else bound_h
    bw = w if bound_w is None else bound_w
    sy = jnp.clip(sy, 0.0, bh - 1.0)
    sx = jnp.clip(sx, 0.0, bw - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, (bh - 1).astype(jnp.int32) if hasattr(bh, "astype") else bh - 1)
    x1 = jnp.minimum(x0 + 1, (bw - 1).astype(jnp.int32) if hasattr(bw, "astype") else bw - 1)
    fy = sy - y0
    fx = sx - x0
    v00 = _flat_take(src, y0, x0)
    v01 = _flat_take(src, y0, x1)
    v10 = _flat_take(src, y1, x0)
    v11 = _flat_take(src, y1, x1)
    return ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01
            + fy * (1 - fx) * v10 + fy * fx * v11)


def fused_warp_sample(image, label, scribble, sy, sx, num_values,
                      bound_h, bound_w):
    """Warp image (bilinear) + label/scribble (class vote) in ONE gather.

    The three tensors share the same sample coordinates, and the four
    bilinear taps of a pixel are the 2x2 neighbourhood of ``(y0, x0)`` — so
    instead of 12 independent gathers (4 taps x 3 tensors) we roll each
    source into a (H*W, 12) table whose row at flat index ``y*W + x`` packs
    ``(v[y,x], v[y,x+1], v[y+1,x], v[y+1,x+1])`` for all three tensors, and
    issue a SINGLE row-gather at ``(y0, x0)``.  TPU gathers cost per ROW
    (each row pads to the 128-lane tile regardless of width), so 4x fewer
    rows ≈ 4x less gather time — measured the dominant cost of the
    augmentation program (NOTES.md round-1 item 2).

    Exactness: the rolled table wraps at the canvas edge, but a wrapped
    value is only ever read where its bilinear weight is EXACTLY zero —
    ``x1`` clamps only when ``sx == bound_w - 1``, which forces ``fx == 0``
    (same for y) — so image sums and class votes match the unpacked 4-tap
    formulation bit for bit.

    Returns (image_out, label_out, scribble_out) with shapes of ``sy``.
    """
    h, w = image.shape
    sy = jnp.clip(sy, 0.0, bound_h - 1.0)
    sx = jnp.clip(sx, 0.0, bound_w - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    fy = sy - y0
    fx = sx - x0

    planes = [image, label.astype(jnp.float32), scribble.astype(jnp.float32)]
    cols = []
    for p in planes:
        pr = jnp.roll(p, -1, axis=1)      # v[y, x+1]
        pd = jnp.roll(p, -1, axis=0)      # v[y+1, x]
        pdr = jnp.roll(pd, -1, axis=1)    # v[y+1, x+1]
        cols += [p, pr, pd, pdr]
    table = jnp.stack(cols, axis=-1).reshape(-1, 12)

    rows = jnp.take(table, (y0 * w + x0).reshape(-1), axis=0)
    rows = rows.reshape(*y0.shape, 12)

    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx

    img_acc = (w00 * rows[..., 0] + w01 * rows[..., 1]
               + w10 * rows[..., 2] + w11 * rows[..., 3])
    # taps: (label_plane, scribble_plane, weight) per corner — the class
    # axis stays UNROLLED as full-lane (H, W) planes (a trailing
    # num_values=3..6 axis would pad to the 128-lane tile).
    taps = [
        (rows[..., 4], rows[..., 8], w00),
        (rows[..., 5], rows[..., 9], w01),
        (rows[..., 6], rows[..., 10], w10),
        (rows[..., 7], rows[..., 11], w11),
    ]

    def vote_argmax(tensor_idx):
        best_val = None
        best_cls = None
        for v in range(num_values):
            vote = 0.0
            for tap in taps:
                vote = vote + tap[2] * (tap[tensor_idx] == v)
            if best_val is None:
                best_val, best_cls = vote, jnp.zeros_like(vote, jnp.int32)
            else:
                take_new = vote > best_val  # strict: ties keep the lower class
                best_val = jnp.where(take_new, vote, best_val)
                best_cls = jnp.where(take_new, v, best_cls)
        return best_cls

    return img_acc, vote_argmax(0), vote_argmax(1)


def _keys_cubic_weights(f, a: float = -0.5):
    """Keys cubic convolution weights for the 4 taps at offsets -1..2.

    ``f`` is the fractional coordinate in [0, 1).  a=-0.75 is exactly
    cv2.INTER_CUBIC (the reference's rotation kernel, augmentations.py:307);
    a=-0.5 (Catmull-Rom) measures closest to the reference's full mixed
    chain of cubic resamples (skimage/scipy splines + cv2, :214/:270/:307):
    AUG_PARITY.json geometry_only gradient-KS 0.031 vs 0.063 for a=-0.75.
    Weights sum to 1 exactly.
    """
    def w_near(s):   # |s| <= 1
        return (a + 2.0) * s ** 3 - (a + 3.0) * s ** 2 + 1.0

    def w_far(s):    # 1 < |s| < 2
        return a * (s ** 3 - 5.0 * s ** 2 + 8.0 * s - 4.0)

    return (w_far(1.0 + f), w_near(f), w_near(1.0 - f), w_far(2.0 - f))


def fused_warp_sample_cubic(image, label, scribble, sy, sx, num_values,
                            bound_h, bound_w, cubic_a: float = -0.5,
                            table_impl: str = "auto",
                            table_dtype: str = "auto"):
    """Like :func:`fused_warp_sample` but with a bicubic image tap.

    The image is sampled with the 4x4 Keys cubic kernel (matching the
    reference's order-3 resamples, augmentations.py:214/:270/:307, far
    closer in measured gradient statistics than one bilinear tap — see
    AUG_PARITY.json ``geometry_only``); labels/scribbles keep the exact
    4-tap bilinear class vote.

    Still ONE row-gather, widened from 12 to 24 lanes (measured on-chip:
    gather time grows with row BYTES — 48 f32 lanes cost 8x the 12-lane
    table, 24 lanes only +60% — so every tap gets its own fixed lane and
    no select arithmetic is needed).  The row at flat ``(y, x)`` packs the
    image's 4x4 neighbourhood ``img[y-1+r, x-1+c]`` (lanes ``4r+c``) and
    the 2x2 label/scribble neighbourhoods at (0,0),(0,1),(1,0),(1,1)
    (lanes 16..19 / 20..23); the gather anchor stays ``(y0, x0)``.

    Edge handling: rolled lanes wrap at the canvas edge, so any tap whose
    nominal coordinate leaves the live region ``[0, bound)`` gets its
    cubic weight zeroed and the kernel is renormalised (boundary-kernel
    convention; interior pixels — all 16 taps live — are exact Keys).
    Out-of-range *bilinear* label taps (``y0+1 == bound``) carry weight
    exactly 0, so the class votes match :func:`fused_warp_sample` bit for
    bit (same argument as there).

    The cubic sum can overshoot; it is clipped to the live-region value
    range, mirroring the reference's per-stage ``clip=True``.
    """
    h, w = image.shape
    sy = jnp.clip(sy, 0.0, bound_h - 1.0)
    sx = jnp.clip(sx, 0.0, bound_w - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    fy = sy - y0
    fx = sx - x0

    bh_i = bound_h.astype(jnp.int32) if hasattr(bound_h, "astype") else jnp.int32(bound_h)
    bw_i = bound_w.astype(jnp.int32) if hasattr(bound_w, "astype") else jnp.int32(bound_w)

    # (H*W, 24) table: image lanes 4r+c = img[y-1+r, x-1+c]; label lanes
    # 16..19 and scribble lanes 20..23 hold the (0,0),(0,1),(1,0),(1,1)
    # bilinear corners exactly like fused_warp_sample's table.  On TPU the
    # table is built by a Pallas kernel directly in the gather's row
    # layout (ops/pallas/warp_table.py — skips XLA's plane-contiguous
    # materialise + re-tile, the ~6 ms/batch cost of NOTES.md gap 3).
    from pacingpseudo_tpu.ops.pallas.warp_table import (
        build_warp_table, build_warp_table_xla)
    impl = table_impl
    if impl == "auto":
        # "auto" stays on the XLA construction until the Pallas kernel is
        # benchmarked on hardware (flip here once BENCH shows the win).
        impl = "xla"
    dt = table_dtype
    if dt == "auto":
        dt = os.environ.get("PACING_WARP_TABLE_DTYPE", "f32")
    assert dt in ("f32", "bf16"), dt
    tdtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
    if impl == "pallas":
        # The Pallas builder is f32-only (non-default path); a bf16 table
        # under it saves the gather bytes but not construction bandwidth.
        table = build_warp_table(image, label, scribble).astype(tdtype)
    else:
        table = build_warp_table_xla(image, label, scribble, dtype=tdtype)

    rows = jnp.take(table, (y0 * w + x0).reshape(-1), axis=0)
    # Upcast immediately: all interpolation math stays f32 regardless of
    # the table storage dtype.  Label/scribble lanes hold small integer
    # class ids, exact in bf16, so the bilinear class votes below are
    # bit-identical between table dtypes; only image taps round.
    rows = rows.reshape(*y0.shape, 24).astype(jnp.float32)

    # ---- image: 16 cubic taps; live-range masked + renormalised weights.
    wy = _keys_cubic_weights(fy, cubic_a)
    wx = _keys_cubic_weights(fx, cubic_a)
    wy = [wy[r] * ((y0 - 1 + r >= 0) & (y0 - 1 + r <= bh_i - 1)) for r in range(4)]
    wx = [wx[c] * ((x0 - 1 + c >= 0) & (x0 - 1 + c <= bw_i - 1)) for c in range(4)]
    ny = wy[0] + wy[1] + wy[2] + wy[3]   # >= w(f)+w(1-f) > 0.9: taps y0 and
    nx = wx[0] + wx[1] + wx[2] + wx[3]   # y0+1 are live except when f == 0
    img_acc = 0.0
    for r in range(4):
        for c in range(4):
            img_acc = img_acc + wy[r] * wx[c] * rows[..., 4 * r + c]
    img_acc = img_acc / (ny * nx)

    # live-region range clip (reference clip=True, augmentations.py:214,:257)
    iy = jax.lax.broadcasted_iota(jnp.int32, image.shape, 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, image.shape, 1)
    live = (iy < bh_i) & (ix < bw_i)
    lo = jnp.min(jnp.where(live, image, jnp.inf))
    hi = jnp.max(jnp.where(live, image, -jnp.inf))
    img_acc = jnp.clip(img_acc, lo, hi)

    # ---- labels/scribbles: exact bilinear class vote (fixed lanes).
    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx

    def vote_argmax(base):
        taps = [(rows[..., base], w00), (rows[..., base + 1], w01),
                (rows[..., base + 2], w10), (rows[..., base + 3], w11)]
        best_val = None
        best_cls = None
        for v in range(num_values):
            vote = 0.0
            for val, wt in taps:
                vote = vote + wt * (val == v)
            if best_val is None:
                best_val, best_cls = vote, jnp.zeros_like(vote, jnp.int32)
            else:
                take_new = vote > best_val  # strict: ties keep the lower class
                best_val = jnp.where(take_new, vote, best_val)
                best_cls = jnp.where(take_new, v, best_cls)
        return best_cls

    return img_acc, vote_argmax(16), vote_argmax(20)


def separable_gaussian_blur(img, sigma, radius: int):
    """Gaussian blur with a traced ``sigma`` and static kernel ``radius``.

    The tap weights are computed from the traced sigma so no retrace occurs
    per sample; taps beyond ~4*sigma get negligible weight.  Reflect padding
    approximates scipy.ndimage.gaussian_filter's default mode
    (augmentations.py:95 and the elastic field smoothing at :264-265).
    """
    offsets = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * jnp.square(offsets / jnp.maximum(sigma, 1e-6)))
    kern = kern / jnp.sum(kern)

    # Rows then columns; pad reflect, then VALID depthwise 1-D convs.
    x = jnp.pad(img, ((radius, radius), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], kern[:, None, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    x = jnp.pad(x, ((0, 0), (radius, radius)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], kern[None, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return x
