"""Weak-supervision loss library (pure JAX functions, NHWC layout).

Functional re-design of the reference loss library (reference:
losses/losses.py:9-171).  Differences from the reference are layout only:

* tensors are **NHWC** (class axis last) instead of NCHW — the TPU-native
  layout; ``valid_mask`` is ``(N, H, W, 1)``,
* everything is a pure function of arrays (jit/vmap/grad-compatible),
* all reductions are computed in float32 regardless of input dtype so the
  losses are stable under bfloat16 activations.

Masked-normalisation semantics are preserved exactly: whenever a
``valid_mask`` is given, the loss is ``sum(loss * mask) / max(sum(mask),
1e-8)`` (reference: losses/losses.py:19-23 and siblings); without a mask the
plain mean over every element is used.  Note the reference asymmetry, kept
here on purpose: for element-wise losses over the class axis (soft CE,
entropy, KL) the masked numerator sums over classes while the denominator
counts only ``N*H*W`` mask entries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_MASK = 1e-8


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def _masked_mean(loss, valid_mask):
    """``sum(loss*mask)/max(sum(mask),1e-8)`` or plain mean when mask is None.

    ``loss`` may have more trailing channels than ``valid_mask`` (the mask
    broadcasts over the class axis), matching reference
    losses/losses.py:19-23.
    """
    if valid_mask is None:
        return jnp.mean(loss)
    valid_mask = _f32(valid_mask)
    num = jnp.sum(loss * valid_mask)
    den = jnp.maximum(jnp.sum(valid_mask), _EPS_MASK)
    return num / den


def entropy_minimization_loss(logits, valid_mask=None):
    """Shannon-entropy minimisation over per-pixel class distributions.

    Reference: losses/losses.py:9-24.

    Args:
      logits: ``(N, H, W, C)`` raw logits.
      valid_mask: optional ``(N, H, W, 1)`` binary mask.
    """
    logits = _f32(logits)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(log_p)
    loss = -p * log_p
    return _masked_mean(loss, valid_mask)


def cross_entropy_loss(logits, target):
    """Plain mean cross entropy with integer targets.

    Reference: losses/losses.py:26-33.  ``logits``: ``(..., C)``;
    ``target``: integer array of shape ``(...)``.
    """
    logits = _f32(logits)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    # one-hot multiply-reduce instead of take_along_axis: a per-pixel
    # class-select lowers to an XLA gather, which profiled at ~12% of the
    # whole train step on TPU; C<=6 FMAs/pixel on the VPU are ~free.
    # Targets MUST lie in [0, C): out-of-range rows one-hot to all-zero and
    # silently contribute 0 while still counted in the mean (torch's
    # clamped-gather NLL would differ) — callers with ignore semantics use
    # partial_cross_entropy_loss instead.
    c = logits.shape[-1]
    nll = -jnp.sum(
        log_p * jax.nn.one_hot(target.astype(jnp.int32), c, dtype=log_p.dtype),
        axis=-1)
    return jnp.mean(nll)


def partial_cross_entropy_loss(logits, target, ignore_index):
    """Cross entropy averaged over non-ignored pixels only.

    Reference: losses/losses.py:35-43 (``F.cross_entropy(ignore_index=...)``).
    Mean is over the count of valid pixels; an all-ignored batch yields 0
    (the reference's torch implementation yields NaN there — we deliberately
    return 0 for stability; no real batch is all-ignored).

    Args:
      logits: ``(N, H, W, C)``.
      target: integer ``(N, H, W)`` hard labels; pixels equal to
        ``ignore_index`` do not contribute.
    """
    logits = _f32(logits)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    valid = (target != ignore_index)
    safe_target = jnp.where(valid, target, 0).astype(jnp.int32)
    # one-hot multiply-reduce, not take_along_axis (see cross_entropy_loss)
    c = logits.shape[-1]
    nll = -jnp.sum(
        log_p * jax.nn.one_hot(safe_target, c, dtype=log_p.dtype), axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), _EPS_MASK)
    return jnp.sum(nll) / count


def soft_label_cross_entropy_loss(logits, target, valid_mask=None):
    """Cross entropy against a soft (probability) target.

    Reference: losses/losses.py:45-62.

    Args:
      logits: ``(N, H, W, C)`` raw logits for the student stream.
      target: ``(N, H, W, C)`` probability distribution (teacher stream).
      valid_mask: optional ``(N, H, W, 1)``.
    """
    logits = _f32(logits)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    loss = -_f32(target) * log_p
    return _masked_mean(loss, valid_mask)


def l1_loss(probs, target, valid_mask=None):
    """L1 distance between probability maps, summed over the class axis.

    Reference: losses/losses.py:64-79 (channel sum with keepdim, then
    masked / plain mean over ``(N, H, W, 1)``).
    """
    diff = jnp.sum(jnp.abs(_f32(probs) - _f32(target)), axis=-1, keepdims=True)
    return _masked_mean(diff, valid_mask)


def l2_loss(probs, target, valid_mask=None):
    """Squared-error distance between probability maps, class-summed.

    Reference: losses/losses.py:81-96.
    """
    diff = jnp.sum(jnp.square(_f32(probs) - _f32(target)), axis=-1, keepdims=True)
    return _masked_mean(diff, valid_mask)


def kl_loss(logits, target_logits, valid_mask=None):
    """KL(target || input) from two logit maps.

    Reference: losses/losses.py:98-116 — ``F.kl_div(input_ll, target_ll,
    log_target=True)`` which computes ``exp(t) * (t - i)`` element-wise.
    """
    input_ll = jax.nn.log_softmax(_f32(logits), axis=-1)
    target_ll = jax.nn.log_softmax(_f32(target_logits), axis=-1)
    loss = jnp.exp(target_ll) * (target_ll - input_ll)
    return _masked_mean(loss, valid_mask)


def bidirectional_kl_loss(logits, target_logits, valid_mask=None):
    """Symmetrised KL: ``(KL(t||i) + KL(i||t)) / 2``.

    Reference: losses/losses.py:118-145.
    """
    p = kl_loss(logits, target_logits, valid_mask)
    q = kl_loss(target_logits, logits, valid_mask)
    return (p + q) / 2.0


def dice_loss_fn(logits, target_one_hot):
    """Soft Dice objective; returns **negative** mean Dice.

    Reference: losses/losses.py:147-162 — note the reference returns
    ``-mean(dice)`` (not ``1 - dice``) so empty classes do not force the
    optimum away from 0; kept identical.

    Args:
      logits: ``(N, H, W, C)``.
      target_one_hot: ``(N, H, W, C)`` one-hot encoded labels.
    """
    eps = 1e-5
    p = jax.nn.softmax(_f32(logits), axis=-1)
    t = _f32(target_one_hot)
    inter = 2.0 * jnp.sum(p * t, axis=(1, 2))          # (N, C)
    denom = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2)) + eps
    dice = inter / denom
    return -jnp.mean(dice)


def multi_label_soft_margin_loss(logits, target):
    """Multi-label one-vs-all logistic loss, mean over classes then batch.

    Reference: losses/losses.py:164-171 (``F.multilabel_soft_margin_loss``):
    ``-mean_N(mean_C(y*logsigmoid(x) + (1-y)*logsigmoid(-x)))``.
    """
    x = _f32(logits)
    y = _f32(target)
    loss = -(y * jax.nn.log_sigmoid(x) + (1.0 - y) * jax.nn.log_sigmoid(-x))
    return jnp.mean(jnp.mean(loss, axis=-1))
