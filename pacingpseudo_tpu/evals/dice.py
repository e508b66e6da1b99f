"""Dice similarity metrics: on-device (JAX) and host (numpy parity).

Two Dice conventions exist in the reference and both are preserved:

* validation Dice (reference: utils/metrics.py:7-34): per-class over a
  single sample, ``2*sum(pq)/(sum(p)+sum(q)+1e-5)``, NaN when prediction
  **and** target are both empty for a class;
* inference Dice (reference: inference.py:196-216): hard-label variant,
  ``2*sum(pq)/max(sum(p)+sum(q), 1e-8)`` with the same both-empty NaN rule.

The TPU path computes Dice on device for a whole batch at once
(:func:`dice_per_class_jax`), returning NaN in the same cases so host-side
aggregation (``AvgMeter`` skipping NaNs, train_chaos.py:388-391) is
unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dice_per_class_jax(probs, target_one_hot, eps=1e-5, region_mask=None):
    """Batched per-class validation Dice on device.

    Args:
      probs: ``(N, H, W, C)`` softmax values.
      target_one_hot: ``(N, H, W, C)`` one-hot full labels.
      region_mask: optional ``(N, H, W, 1)`` live-region mask — restricts
        the metric to the unpadded part of a fixed-size canvas, matching
        the reference's evaluation on the original (unpadded) slice.

    Returns:
      ``(N, C)`` float32 Dice, NaN where prediction and target are both
      empty for that class (reference: utils/metrics.py:26-29).
    """
    num_classes = probs.shape[-1]
    hard = jnp.argmax(probs, axis=-1)
    pred_one_hot = jax.nn.one_hot(hard, num_classes, dtype=jnp.float32)
    t = jnp.asarray(target_one_hot, jnp.float32)
    if region_mask is not None:
        pred_one_hot = pred_one_hot * region_mask
        t = t * region_mask

    inter = jnp.sum(pred_one_hot * t, axis=(1, 2))      # (N, C)
    p_sum = jnp.sum(pred_one_hot, axis=(1, 2))
    t_sum = jnp.sum(t, axis=(1, 2))
    dice = 2.0 * inter / (p_sum + t_sum + eps)
    both_empty = (p_sum == 0) & (t_sum == 0)
    return jnp.where(both_empty, jnp.nan, dice)


def compute_dice(softmax_hwc, target_hwc):
    """Host/numpy validation Dice for one sample (parity check path).

    NHWC analogue of reference utils/metrics.py:7-34 (which is CHW).

    Args:
      softmax_hwc: ``(H, W, C)`` softmax values.
      target_hwc: ``(H, W, C)`` one-hot label.

    Returns:
      list of per-class Dice values (NaN when both sides empty).
    """
    assert softmax_hwc.shape == target_hwc.shape
    eps = 1e-5
    num_classes = softmax_hwc.shape[-1]
    hard = np.argmax(softmax_hwc, axis=-1)

    dice_ls = []
    for c in range(num_classes):
        p = (hard == c).astype(np.float64).reshape(-1)
        t = np.asarray(target_hwc[..., c], np.float64).reshape(-1)
        if not p.any() and not t.any():
            dice_ls.append(np.nan)
        else:
            dice_ls.append(2.0 * np.sum(p * t) / (np.sum(p) + np.sum(t) + eps))
    return dice_ls


def compute_dice_hard(pred_hard, label, num_classes):
    """Inference-time hard-label Dice (reference: inference.py:196-216).

    Args:
      pred_hard: ``(H, W)`` integer prediction.
      label: ``(H, W)`` integer label.

    Returns:
      list of per-class Dice (NaN when both sides empty); note the
      ``max(denominator, 1e-8)`` convention of the inference driver, which
      differs from the validation metric's ``+1e-5``.
    """
    out = []
    for cls in range(num_classes):
        p = pred_hard == cls
        t = label == cls
        if not np.any(p) and not np.any(t):
            out.append(np.nan)
        else:
            num = 2.0 * np.sum(p & t)
            den = p.sum() + t.sum()
            out.append(num / max(den, 1e-8))
    return out
