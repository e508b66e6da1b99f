"""Space-to-depth (S2D) reformulation of the high-resolution UNet stages.

Motivation (measured on the chip, NOTES.md round-2): XLA's TPU conv
emitter runs the 32-channel 256^2 stage-1 convolutions at ~6% MFU — the
32-wide contraction/output underutilises the 128-lane MXU.  Packing 2x2
pixel blocks into channels turns the same stage into 128-channel convs at
128^2: the equivalent dense kernel carries 4x the FLOPs (structural
zeros) but runs ~2.5x faster wall-clock, and the fused BN statistics /
elementwise chains run at full lane width — a stage-1 DoubleConv
fwd+bwd measured 8.4 -> 3.3 ms (~2.5x).

The reformulation is EXACT (same linear map, float-order differences
only):

  out[2i+a, 2j+b, co] = sum_{dy,dx,ci} in[2i+a+dy-1, 2j+b+dx-1, ci] * K[dy,dx,ci,co]

becomes a 3x3 conv on the S2D grid with the dense kernel built by
:func:`expand_kernel3x3` from the LOGICAL (3,3,Cin,Cout) parameter — so
parameters, checkpoints, and torch interop are unchanged, and autodiff
through the (linear) expansion yields exact logical-kernel gradients.

S2D channel order is ``(p, q, ci)`` with ``ci`` minor: lane index
``(p*2 + q) * C + ci``.  Under this order:
  * 2x2 max-pool of the original tensor == a max over the 4 channel
    groups (S2D exits to the next stage's plain layout for free);
  * per-logical-channel BatchNorm statistics reduce over (N, H, W, 4);
  * align-corners 2x upsample lands directly in S2D via the even/odd
    rows of the interpolation matrices (ops/resize.py).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pacingpseudo_tpu.ops.resize import _interp_matrix

# ---------------------------------------------------------------------------
# Layout-implementation switch ("v1" | "v2").
#
# v2 targets the ~13 ms/step of `data formatting` copies in the round-5
# batch-12 trace (study_r5/chipq/prof_b12): XLA materialises full-tensor
# layout copies around (a) the decoder's interleaving group_concat
# (bf16[24,128,128,4,96] + two [.,384] transposes, ~2.8 ms/step), (b) the
# stage-2/3 max-pool select-and-scatter, which prefers H-minor layouts and
# drags ~3.5 ms/step of {1,3,2,0}<->{3,0,2,1} copies on the 64-ch tensors,
# and (c) the s32 argmax residual of group_max_pool (~0.6 ms/step).  The
# v2 formulations keep every tensor channel-minor:
#   * plain channel concat + a compile-time input-axis permutation of the
#     consumer's expanded dense kernel (same linear map, no data shuffle);
#   * reshape-view 2x2 max pool with a first-max custom VJP (elementwise
#     compares, no select-and-scatter);
#   * compare-based group_max_pool backward (no s32 index residual).
# Forward values are bit-exact for the pools; the dec_block1 convs sum
# input channels in a permuted order (float-level reordering only).
# Selection: env PACING_LAYOUT_IMPL.  Default "v2" from the round-5 on-chip
# measurements: three independent captures all have v2 faster e2e (bench
# A/Bs 69.03->68.61 and 68.33->66.69; the 5-rep interleaved A/B
# study_r5/chipq/layout_rep_ab.json: v2 wins 4/5 paired reps, mean
# 69.01->68.53 ms/step, +0.7%).  The HLO copy audit shows v2 removes the
# group_concat interleave copies (s2d.py v1 group_concat, 604 MB/step) and
# the argmax residual (201 MB/step); the remaining ~3 GB/step of layout
# copies sit around LReLU/pad->conv sites XLA controls (see
# study_r5/chipq/xla_flags_ab.json copy_audit_top).
# ---------------------------------------------------------------------------

_LAYOUT_IMPL = None  # lazy: resolved from env on first use


def set_layout_impl(impl: str) -> None:
    global _LAYOUT_IMPL
    assert impl in ("v1", "v2"), impl
    _LAYOUT_IMPL = impl


def get_layout_impl() -> str:
    global _LAYOUT_IMPL
    if _LAYOUT_IMPL is None:
        _LAYOUT_IMPL = os.environ.get("PACING_LAYOUT_IMPL", "v2")
        assert _LAYOUT_IMPL in ("v1", "v2"), _LAYOUT_IMPL
    return _LAYOUT_IMPL


def space_to_depth(x):
    """(N, 2h, 2w, C) -> (N, h, w, 4C), channel order (p, q, ci)."""
    n, H, W, c = x.shape
    x = x.reshape(n, H // 2, 2, W // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, H // 2, W // 2, 4 * c)


def depth_to_space(x2):
    """(N, h, w, 4C) -> (N, 2h, 2w, C) — inverse of :func:`space_to_depth`."""
    n, h, w, c4 = x2.shape
    c = c4 // 4
    x2 = x2.reshape(n, h, w, 2, 2, c)
    return x2.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def group_max_pool(x2):
    """2x2/stride-2 max-pool of the ORIGINAL tensor, computed in S2D:
    max over the 4 (p, q) channel groups -> plain (N, h, w, C).

    The BACKWARD pass must match ``nn.max_pool``/torch ``MaxPool2d``
    exactly: all gradient to the FIRST maximum in window scan order
    (a plain ``jnp.max`` reduction splits it among ties — and ties are
    pervasive on constant background regions).  The (p, q) channel order
    is row-major, the same scan order as the spatial (2, 2) window, so
    ``argmax`` (first-max) reproduces the plain layout's routing.
    Implemented as a custom VJP — the equivalent ``lax.reduce_window``
    lowering measured ~4.6 ms/step slower (its select-and-scatter
    backward), while this is an elementwise one-hot scatter.

    Layout v2 keeps the identical routing but derives the first-max mask
    from compares against the saved output (4 C-wide slices + masked
    writes, all channel-minor) instead of an argmax: no s32 index
    residual, no rank-5 reshape — the b12 trace charges the v1 argmax
    residual's layout copy ~0.6 ms/step.
    """
    if get_layout_impl() == "v2":
        return _group_max_pool_v2(x2)
    return _group_max_pool(x2)


@jax.custom_vjp
def _group_max_pool(x2):
    n, h, w, c4 = x2.shape
    c = c4 // 4
    return jnp.max(x2.reshape(n, h, w, 4, c), axis=3)


def _gmp_fwd(x2):
    n, h, w, c4 = x2.shape
    c = c4 // 4
    g = x2.reshape(n, h, w, 4, c)
    idx = jnp.argmax(g, axis=3)          # first max on ties (scan order)
    # residuals must be JAX values: idx carries the shapes, the empty
    # token carries x2's dtype
    return jnp.max(g, axis=3), (idx, jnp.zeros((0,), x2.dtype))


def _gmp_bwd(res, ct):
    idx, token = res
    n, h, w, c = idx.shape
    sel = (idx[:, :, :, None, :] ==
           jnp.arange(4, dtype=idx.dtype)[None, None, None, :, None])
    g = jnp.where(sel, ct[:, :, :, None, :], 0).astype(token.dtype)
    return (g.reshape(n, h, w, 4 * c),)


_group_max_pool.defvjp(_gmp_fwd, _gmp_bwd)


@jax.custom_vjp
def _group_max_pool_v2(x2):
    c = x2.shape[-1] // 4
    p = [x2[..., k * c:(k + 1) * c] for k in range(4)]
    return jnp.maximum(jnp.maximum(p[0], p[1]), jnp.maximum(p[2], p[3]))


def _gmp2_fwd(x2):
    m = _group_max_pool_v2(x2)
    return m, (x2, m)


def _gmp2_bwd(res, ct):
    # First-max-in-scan-order routing via sequential prior-equality masks
    # (group scan order == the spatial 2x2 window scan order, as in v1).
    x2, m = res
    c = m.shape[-1]
    outs, prior = [], None
    for k in range(4):
        eq = x2[..., k * c:(k + 1) * c] == m
        sel = eq if prior is None else eq & ~prior
        prior = eq if prior is None else prior | eq
        outs.append(jnp.where(sel, ct, jnp.zeros((), x2.dtype)))
    return (jnp.concatenate(outs, axis=-1).astype(x2.dtype),)


_group_max_pool_v2.defvjp(_gmp2_fwd, _gmp2_bwd)


@jax.custom_vjp
def max_pool2x2_firstmax(x):
    """2x2/stride-2 max pool of plain (N, H, W, C), H and W even, with the
    torch-``MaxPool2d``/``nn.max_pool`` tie routing (all gradient to the
    FIRST maximum in window scan order).

    Layout-v2 replacement for ``lax.reduce_window``: on TPU the
    select-and-scatter backward prefers H-minor layouts and XLA inserts
    full-tensor {1,3,2,0}<->{3,0,2,1} copies around it (~3.5 ms/step at
    batch 24, study_r5/chipq/prof_b12).  Here both directions are
    reshape views + elementwise compares/selects that stay channel-minor.
    """
    return _mp_fwd(x)[0]


def _mp_parts(x):
    n, H, W, c = x.shape
    v = x.reshape(n, H // 2, 2, W // 2, 2, c)
    return [v[:, :, a, :, b, :] for a in range(2) for b in range(2)]


def _mp_fwd(x):
    p = _mp_parts(x)
    return jnp.maximum(jnp.maximum(p[0], p[1]),
                       jnp.maximum(p[2], p[3])), (x,)


def _mp_bwd(res, ct):
    (x,) = res
    n, H, W, c = x.shape
    p = _mp_parts(x)
    m = jnp.maximum(jnp.maximum(p[0], p[1]), jnp.maximum(p[2], p[3]))
    outs, prior = [], None
    for k in range(4):
        eq = p[k] == m
        sel = eq if prior is None else eq & ~prior
        prior = eq if prior is None else prior | eq
        outs.append(jnp.where(sel, ct, jnp.zeros((), x.dtype)))
    row0 = jnp.stack(outs[:2], axis=3)            # (n, h, w, 2, c): b axis
    row1 = jnp.stack(outs[2:], axis=3)
    g = jnp.stack([row0, row1], axis=2)           # (n, h, 2, w, 2, c)
    return (g.reshape(n, H, W, c).astype(x.dtype),)


max_pool2x2_firstmax.defvjp(_mp_fwd, _mp_bwd)


def group_concat(a2, b2):
    """Concat two S2D tensors as the S2D of the channel-concat:
    (p, q, [ciA; ciB]) ordering."""
    n, h, w, ca4 = a2.shape
    cb4 = b2.shape[-1]
    a = a2.reshape(n, h, w, 4, ca4 // 4)
    b = b2.reshape(n, h, w, 4, cb4 // 4)
    return jnp.concatenate([a, b.astype(a.dtype)], axis=-1).reshape(
        n, h, w, ca4 + cb4)


def group_concat_plain(a2, b2):
    """Layout-v2 concat: plain channel concat ``[a2; b2]`` — the S2D of
    the channel-concat under the BLOCK order (all of A's (p, q, ciA)
    lanes, then all of B's).  Unlike :func:`group_concat` this is a pure
    block concatenate (no 64/32-granular lane shuffle), so XLA emits no
    relayout copy; the consumer conv compensates by permuting its dense
    kernel's input axis with :func:`s2d_block_input_perm` — the same
    linear map, with the shuffle moved onto the (3,3,4Cin,Cout) weight."""
    return jnp.concatenate([a2, b2.astype(a2.dtype)], axis=-1)


def s2d_block_input_perm(ca: int, cb: int) -> np.ndarray:
    """Permutation ``idx`` such that
    ``group_concat(a2, b2)[..., idx] == group_concat_plain(a2, b2)``,
    i.e. ``W_interleaved[:, :, idx, :]`` is the dense kernel consuming the
    block-ordered concat.  ``ca``/``cb`` are the LOGICAL channel counts."""
    ctot = ca + cb
    idx = [g * ctot + ci for g in range(4) for ci in range(ca)]
    idx += [g * ctot + ca + ci for g in range(4) for ci in range(cb)]
    return np.asarray(idx, np.int32)


def expand_kernel3x3(k_logical):
    """Dense S2D kernel (3, 3, 4Cin, 4Cout) from a logical (3, 3, Cin, Cout).

    Structural zeros everywhere except the taps derived from
    ``ry = a + dy - 1 = 2U + p`` (rows) and the analogous column relation;
    built with traced adds so parameter gradients flow back exactly.
    """
    kh, kw, cin, cout = k_logical.shape
    assert (kh, kw) == (3, 3)
    w2 = jnp.zeros((3, 3, 4 * cin, 4 * cout), k_logical.dtype)
    for a in range(2):
        for b in range(2):
            for dy in range(3):
                for dx in range(3):
                    ry, rx = a + dy - 1, b + dx - 1
                    u, p = ry // 2, ry % 2
                    v, q = rx // 2, rx % 2
                    w2 = w2.at[u + 1, v + 1,
                               (p * 2 + q) * cin:(p * 2 + q + 1) * cin,
                               (a * 2 + b) * cout:(a * 2 + b + 1) * cout
                               ].add(k_logical[dy, dx])
    return w2


def expand_kernel1x1(k_logical):
    """Dense S2D kernel (1, 1, 4Cin, 4Cout) of a logical 1x1 conv
    (block-diagonal over the four (p, q) groups)."""
    _, _, cin, cout = k_logical.shape
    w2 = jnp.zeros((1, 1, 4 * cin, 4 * cout), k_logical.dtype)
    for g in range(4):
        w2 = w2.at[0, 0, g * cin:(g + 1) * cin,
                   g * cout:(g + 1) * cout].add(k_logical[0, 0])
    return w2


def upsample2x_align_corners_s2d(x):
    """2x align-corners bilinear upsample of plain (N, h, w, C) producing
    the S2D layout (N, h, w, 4C) of the (N, 2h, 2w, C) result directly —
    the even/odd rows of the dense interpolation matrices
    (ops/resize.py) applied as four matmul pairs, no transpose."""
    n, h, w, c = x.shape
    wh = _interp_matrix(h, 2 * h)
    ww = _interp_matrix(w, 2 * w)
    parts = []
    for p in range(2):
        whp = jnp.asarray(wh[p::2], x.dtype)
        rows = jnp.einsum("oh,nhwc->nowc", whp, x)
        for q in range(2):
            wwq = jnp.asarray(ww[q::2], x.dtype)
            parts.append(jnp.einsum("pw,nowc->nopc", wwq, rows))
    return jnp.concatenate(
        [p_[..., None, :] for p_ in parts], axis=-2).reshape(n, h, w, 4 * c)
