"""Pallas TPU kernel: fused weak-supervision loss reduction.

Computes the three pixel-wise losses of the pacing objective in ONE pass
over the two logit fields (the hot reduction SURVEY.md §7 nominates for a
Pallas kernel):

* partial cross entropy of the weak stream vs scribble targets with
  ignore_index (reference: losses/losses.py:35-43),
* entropy minimisation of the weak stream with valid-mask normalisation
  (losses.py:9-24),
* soft-label cross entropy of the strong stream against the weak softmax
  (the ``ce_loss`` consistency variant, losses.py:45-62, NOT detached —
  gradients flow into the weak stream, consistency_reglur_memory.py:53-57).

XLA emits several independent softmax/log-softmax reductions over the
(N, H, W, C) logits for these; the kernel reads each logit block once and
produces all partial sums together, plus an analytic one-pass backward
(custom VJP) for both streams.

TPU layout choice: the class axis (C = 2..5) is far below the 128-lane
tile, so softmaxes are computed with C **unrolled as a static Python loop**
over (TH, W) tiles — every vector op runs at full lane width instead of a
C-wide degenerate tile.  Scalar partial sums accumulate in SMEM across the
sequential TPU grid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _softmax_terms(ref, th, w, c, row0):
    """Load C class-planes and return (probs list, logprobs list).

    ``ref`` block shape: (1, C, TH, W) — class-leading so each plane is a
    naturally (8,128)-tiled (TH, W) tile; a trailing C=2..5 axis would be
    lane-padded to 128 and every extracted plane would relayout a 2 MB
    buffer (observed: 41 MB scoped-VMEM OOM).  Unrolled over the static C.
    """
    logits = [ref[0, k, :, :] for k in range(c)]
    m = logits[0]
    for k in range(1, c):
        m = jnp.maximum(m, logits[k])
    exps = [jnp.exp(x - m) for x in logits]
    denom = exps[0]
    for k in range(1, c):
        denom = denom + exps[k]
    log_denom = jnp.log(denom)
    logps = [x - m - log_denom for x in logits]
    ps = [jnp.exp(lp) for lp in logps]
    return ps, logps


def _fwd_kernel(lw_ref, ls_ref, tgt_ref, mask_ref, out_ref, *, c, ignore):
    """Forward partial sums: [pce_sum, pce_cnt, ent_sum, sce_sum, mask_sum]."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        # SMEM only accepts scalar stores on TPU — initialise element-wise.
        for t in range(8):
            out_ref[0, t] = 0.0

    th, w = lw_ref.shape[2], lw_ref.shape[3]
    pw, lpw = _softmax_terms(lw_ref, th, w, c, 0)
    ps, lps = _softmax_terms(ls_ref, th, w, c, 0)

    tgt = tgt_ref[0]
    mask = mask_ref[0]

    # partial CE: -log p_w[target] over non-ignored pixels
    valid = (tgt != ignore).astype(jnp.float32)
    nll = jnp.zeros((th, w), jnp.float32)
    ent = jnp.zeros((th, w), jnp.float32)
    sce = jnp.zeros((th, w), jnp.float32)
    for k in range(c):
        sel = (tgt == k).astype(jnp.float32)
        nll = nll - sel * lpw[k]
        ent = ent - pw[k] * lpw[k]
        sce = sce - pw[k] * lps[k]

    out_ref[0, 0] += jnp.sum(nll * valid)
    out_ref[0, 1] += jnp.sum(valid)
    out_ref[0, 2] += jnp.sum(ent * mask)
    out_ref[0, 3] += jnp.sum(sce * mask)
    out_ref[0, 4] += jnp.sum(mask)


def _bwd_kernel(lw_ref, ls_ref, tgt_ref, mask_ref, scal_ref,
                dlw_ref, dls_ref, *, c, ignore):
    """Analytic one-pass backward for all three losses.

    ``scal_ref`` (SMEM, (1, 8)): [g_pce/cnt, g_ent/msum, g_sce/msum].
    Gradients (per pixel, class k):
      pce:  (p_w_k - 1[k=tgt]) * valid
      ent:  -p_w_k * (log p_w_k + ent_pixel)          (weak stream)
      sce (strong): (p_s_k - p_w_k)                    (strong stream)
      sce (weak):   -p_w_k * (log p_s_k + sce_pixel)  (teacher not detached;
                     note sce_pixel = -sum_c p_w_c log p_s_c)
    """
    th, w = lw_ref.shape[2], lw_ref.shape[3]
    pw, lpw = _softmax_terms(lw_ref, th, w, c, 0)
    ps, lps = _softmax_terms(ls_ref, th, w, c, 0)

    tgt = tgt_ref[0]
    mask = mask_ref[0]
    valid = (tgt != ignore).astype(jnp.float32)

    g_pce = scal_ref[0, 0]
    g_ent = scal_ref[0, 1]
    g_sce = scal_ref[0, 2]

    ent_pix = jnp.zeros((th, w), jnp.float32)
    sce_pix = jnp.zeros((th, w), jnp.float32)
    for k in range(c):
        ent_pix = ent_pix - pw[k] * lpw[k]
        sce_pix = sce_pix - pw[k] * lps[k]

    for k in range(c):
        sel = (tgt == k).astype(jnp.float32)
        d_pce = (pw[k] - sel) * valid * g_pce
        d_ent = -pw[k] * (lpw[k] + ent_pix) * mask * g_ent
        d_sce_w = -pw[k] * (lps[k] + sce_pix) * mask * g_sce
        dlw_ref[0, k, :, :] = d_pce + d_ent + d_sce_w
        dls_ref[0, k, :, :] = (ps[k] - pw[k]) * mask * g_sce


def _block_specs(n, h, w, c, th):
    grid = (n, h // th)
    # logits arrive transposed to (N, C, H, W) — see _softmax_terms.
    lw_spec = pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    return grid, lw_spec, map_spec


def _pick_tile(h: int) -> int:
    for th in (64, 32, 16, 8):
        if h % th == 0:
            return th
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_pacing_losses(logits_weak, logits_strong, scb_target, valid_mask,
                        ignore_index, interpret=False):
    """Fused (pce, ent, sce) losses via one Pallas pass.

    Args:
      logits_weak/logits_strong: (N, H, W, C) float32.
      scb_target: (N, H, W) int32 hard scribble targets.
      valid_mask: (N, H, W) float32.
    Returns:
      (loss_pce, loss_ent, loss_sce) scalars with reference normalisation
      (mean over valid pixels / sum-over-mask respectively).
    """
    sums = _forward_sums(logits_weak, logits_strong, scb_target, valid_mask,
                         ignore_index, interpret)
    cnt = jnp.maximum(sums[1], 1e-8)
    msum = jnp.maximum(sums[4], 1e-8)
    return sums[0] / cnt, sums[2] / msum, sums[3] / msum


def _forward_sums(logits_weak, logits_strong, scb_target, valid_mask,
                  ignore_index, interpret):
    n, h, w, c = logits_weak.shape
    th = _pick_tile(h)
    grid, lw_spec, map_spec = _block_specs(n, h, w, c, th)
    lw_t = jnp.transpose(logits_weak.astype(jnp.float32), (0, 3, 1, 2))
    ls_t = jnp.transpose(logits_strong.astype(jnp.float32), (0, 3, 1, 2))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, ignore=ignore_index),
        grid=grid,
        in_specs=[lw_spec, lw_spec, map_spec, map_spec],
        out_specs=pl.BlockSpec((1, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        interpret=interpret,
    )(lw_t, ls_t, scb_target.astype(jnp.int32),
      valid_mask.astype(jnp.float32))
    return out[0]


def _fwd(logits_weak, logits_strong, scb_target, valid_mask, ignore_index,
         interpret):
    sums = _forward_sums(logits_weak, logits_strong, scb_target, valid_mask,
                         ignore_index, interpret)
    cnt = jnp.maximum(sums[1], 1e-8)
    msum = jnp.maximum(sums[4], 1e-8)
    losses = (sums[0] / cnt, sums[2] / msum, sums[3] / msum)
    residuals = (logits_weak, logits_strong, scb_target, valid_mask, cnt, msum)
    return losses, residuals


def _bwd(ignore_index, interpret, residuals, cotangents):
    logits_weak, logits_strong, scb_target, valid_mask, cnt, msum = residuals
    g_pce, g_ent, g_sce = cotangents
    n, h, w, c = logits_weak.shape
    th = _pick_tile(h)
    grid, lw_spec, map_spec = _block_specs(n, h, w, c, th)

    scal = jnp.stack([g_pce / cnt, g_ent / msum, g_sce / msum,
                      0.0, 0.0, 0.0, 0.0, 0.0]).astype(jnp.float32)[None]

    lw_t = jnp.transpose(logits_weak.astype(jnp.float32), (0, 3, 1, 2))
    ls_t = jnp.transpose(logits_strong.astype(jnp.float32), (0, 3, 1, 2))
    dlw_t, dls_t = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, ignore=ignore_index),
        grid=grid,
        in_specs=[lw_spec, lw_spec, map_spec, map_spec,
                  pl.BlockSpec((1, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(lw_spec, lw_spec),
        out_shape=(jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((n, c, h, w), jnp.float32)),
        interpret=interpret,
    )(lw_t, ls_t, scb_target.astype(jnp.int32),
      valid_mask.astype(jnp.float32), scal)
    dlw = jnp.transpose(dlw_t, (0, 2, 3, 1))
    dls = jnp.transpose(dls_t, (0, 2, 3, 1))
    return dlw, dls, None, None


fused_pacing_losses.defvjp(_fwd, _bwd)


def fused_losses_reference(logits_weak, logits_strong, scb_target,
                           valid_mask, ignore_index):
    """Pure-jnp reference of the fused kernel (for tests & CPU fallback)."""
    from pacingpseudo_tpu.losses import (
        entropy_minimization_loss,
        partial_cross_entropy_loss,
        soft_label_cross_entropy_loss,
    )
    mask4 = valid_mask[..., None]
    pce = partial_cross_entropy_loss(logits_weak, scb_target, ignore_index)
    ent = entropy_minimization_loss(logits_weak, mask4)
    sce = soft_label_cross_entropy_loss(
        logits_strong, jax.nn.softmax(logits_weak, axis=-1), mask4)
    return pce, ent, sce
