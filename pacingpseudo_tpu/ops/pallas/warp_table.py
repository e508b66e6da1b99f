"""Pallas construction of the fused-warp gather table.

Round-2 profiling (NOTES.md gap 3): XLA materialises the 24-lane warp
table of ``ops.warp.fused_warp_sample_cubic`` plane-contiguous (its
natural fusion layout — 24 rolled (H, W) planes) and then re-tiles it
row-major for the gather, costing ~6 ms of the 8.1 ms augmentation
segment at batch 12.  This kernel builds the table directly in the
gather's row layout — one pass over the source planes in VMEM, one HBM
write — sidestepping the relayout entirely.

Table contract (must match ops/warp.py fused_warp_sample_cubic exactly):
row at flat index ``y*W + x`` packs
  lanes 0..15:  image[(y-1+r) % H, (x-1+c) % W]  for r, c in 0..3 (lane 4r+c)
  lanes 16..19: label  at (y, x), (y, x+1), (y+1, x), (y+1, x+1)  (wrapped)
  lanes 20..23: scribble, same corners
Wrapped entries are only ever read where their interpolation weight is
exactly zero (see fused_warp_sample_cubic edge argument), so wrap == the
XLA jnp.roll construction bit for bit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 24


def _kernel(img_ref, lab_ref, scb_ref, out_ref):
    h = img_ref.shape[0]
    y = pl.program_id(0)

    w = img_ref.shape[1]

    def row(ref, dy):
        idx = jax.lax.rem(y + dy + h, h)
        return ref[pl.ds(idx, 1), :]                     # (1, W)

    def left(r, k):
        # jnp.roll(x, -k) with pltpu.roll's non-negative shift
        return pltpu.roll(r, (w - k) % w, axis=1)

    cols = []
    for r in range(4):
        img_row = row(img_ref, r - 1)
        for c in range(4):
            cols.append(left(img_row, c - 1))
    for ref in (lab_ref, scb_ref):
        r0 = row(ref, 0)
        r1 = row(ref, 1)
        cols += [r0, left(r0, 1), r1, left(r1, 1)]
    block = jnp.concatenate(cols, axis=0)                # (24, W)
    out_ref[:, :] = block.T                              # (W, 24) rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_warp_table(image, label, scribble, interpret: bool = None):
    """(H, W) image/label/scribble (f32) -> (H*W, 24) f32 gather table.

    ``interpret`` defaults to True off-TPU so CPU tests exercise this
    exact kernel body.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    h, w = image.shape
    return pl.pallas_call(
        _kernel,
        grid=(h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((w, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h * w, LANES), jnp.float32),
        interpret=interpret,
    )(image, label.astype(jnp.float32), scribble.astype(jnp.float32))


def build_warp_table_xla(image, label, scribble, dtype=jnp.float32):
    """The round-2 XLA construction (rolled planes + stack) — reference
    implementation and fallback for non-TPU backends.

    ``dtype`` is the table STORAGE dtype (f32 default; bf16 halves the
    table's HBM/VMEM footprint and the downstream gather's bytes).  The
    source planes are cast BEFORE the rolls so construction bandwidth is
    also halved; label/scribble class ids are small ints, exact in bf16.
    """
    cols = []
    img = image.astype(dtype)
    for r in range(4):
        pr = jnp.roll(img, -(r - 1), axis=0)
        for c in range(4):
            cols.append(jnp.roll(pr, -(c - 1), axis=1))
    for p in (label.astype(dtype), scribble.astype(dtype)):
        pright = jnp.roll(p, -1, axis=1)
        pdown = jnp.roll(p, -1, axis=0)
        cols += [p, pright, pdown, jnp.roll(pdown, -1, axis=1)]
    return jnp.stack(cols, axis=-1).reshape(-1, LANES)
