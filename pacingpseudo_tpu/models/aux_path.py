"""Auxiliary deep-supervision path + class-prototype memory bank.

Re-design of the reference AuxPath (reference: models/aux_path_memory.py:10-120)
for a functional TPU setting:

* the module owns only the **trainable** layers (bottleneck projection and
  the shared ``fc_cls`` classifier);
* the memory bank is an explicit ``(num_classes, hid_ch)`` array carried in
  the train state and updated by the pure function :func:`memory_update` —
  a carry, not a side effect (SURVEY.md §7 risk list);
* all per-class masked reductions are fixed-shape matmuls/where-masks, so
  they ride the MXU instead of data-dependent boolean indexing.

Reference quirks handled explicitly:

* ``fc_cls`` is shared between the auxiliary segmentation head and the
  memory-prototype classification (reference: aux_path_memory.py:51,61) —
  preserved via a dedicated submodule + ``classify_bank`` method;
* the reference's ``memory_update`` contains a ``return`` inside the
  per-sample loop so only the FIRST sample of each batch updates the bank
  (reference: aux_path_memory.py:116).  ``memory_update(...,
  update_mode='first')`` reproduces that; the default ``'all'`` folds every
  sample in sequentially (the evident intent), selectable per run;
* in ``cosine_similarity`` ensemble mode the reference **L2-normalises the
  stored bank row in place** before the EMA blend (``memory_cls /= ...`` on
  a view, aux_path_memory.py:106) — preserved;
* cold start (all-zero bank row) takes the raw masked mean with no momentum
  (reference: aux_path_memory.py:92-95).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pacingpseudo_tpu.models.unet import torch_conv_kernel_init
from pacingpseudo_tpu.ops.resize import bilinear_resize_align_corners
from pacingpseudo_tpu.train.schedules import memory_momentum

Dtype = Any


class AuxPath(nn.Module):
    """Bottleneck projection + shared classifier head.

    ``__call__`` consumes the backbone end-points dict, concatenates the
    configured encoder stages (default ``['encoder/stage6',
    'encoder/stage5']``, train_chaos.py:151-157), projects to ``hid_ch`` and
    emits (aux_features, full-resolution aux logits).
    """

    num_classes: int
    feat_stage: Sequence[str] = ("encoder/stage6", "encoder/stage5")
    hid_ch: int = 64
    aux_drop_prob: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        # Spatial (channel-wise) dropout == torch Dropout2d: broadcast over H, W.
        self.drop_bottleneck = nn.Dropout(self.aux_drop_prob, broadcast_dims=(1, 2))
        self.conv_bottleneck = nn.Conv(
            self.hid_ch, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=torch_conv_kernel_init,
            name="conv_bottleneck")
        self.norm_bottleneck = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
            name="norm_bottleneck")
        self.drop_cls = nn.Dropout(self.aux_drop_prob, broadcast_dims=(1, 2))
        # No bias: prototypes and pixel features share one linear classifier
        # (reference: aux_path_memory.py:30-33).
        self.fc_cls = nn.Conv(
            self.num_classes, (1, 1), use_bias=False,
            dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=torch_conv_kernel_init,
            name="fc_cls")

    def __call__(self, end_points, out_hw, train: bool):
        feat = jnp.concatenate(
            [end_points[s] for s in self.feat_stage], axis=-1).astype(self.dtype)
        x = self.drop_bottleneck(feat, deterministic=not train)
        x = self.conv_bottleneck(x)
        x = self.norm_bottleneck(x, use_running_average=not train)
        aux_features = nn.leaky_relu(x.astype(jnp.float32), negative_slope=1e-2)

        y = self.drop_cls(aux_features, deterministic=not train)
        logits_aux = self.fc_cls(y)
        logits_aux = bilinear_resize_align_corners(logits_aux, out_hw[0], out_hw[1])
        return aux_features, logits_aux.astype(jnp.float32)

    def classify_bank(self, bank):
        """Apply the shared ``fc_cls`` to bank prototypes.

        Args:
          bank: ``(num_classes, hid_ch)``.
        Returns:
          ``(num_classes, num_classes)`` logits (reference:
          aux_path_memory.py:61 applies fc_cls to the ``(C, D, 1, 1)`` bank).
        """
        return self.fc_cls(bank[:, None, None, :])[:, 0, 0, :]


def _update_bank_one_sample(bank, feats, scb_one_hot, m, ensemble_mode):
    """Fold one sample's pixel embeddings into the bank.

    Args:
      bank: ``(C, D)`` current prototypes.
      feats: ``(HW, D)`` float32 pixel embeddings (already upsampled to the
        scribble resolution, reference: aux_path_memory.py:75).
      scb_one_hot: ``(HW, C+1)`` one-hot scribble (last channel = ignore).
      m: scalar EMA weight for the fresh estimate (ramps down with epoch).
      ensemble_mode: ``'mean'`` or ``'cosine_similarity'``.

    Returns:
      New ``(C, D)`` bank.
    """
    num_classes, _ = bank.shape
    mask = scb_one_hot[:, :num_classes].astype(jnp.float32)        # (HW, C)
    counts = jnp.sum(mask, axis=0)                                  # (C,)
    safe_counts = jnp.maximum(counts, 1.0)

    # Raw masked mean per class — used for cold start and 'mean' mode.
    raw_mean = (mask.T @ feats) / safe_counts[:, None]              # (C, D)

    if ensemble_mode == "mean":
        warm_update = raw_mean
        old_for_ema = bank
    elif ensemble_mode == "cosine_similarity":
        feats_n = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
        bank_n = bank / (jnp.linalg.norm(bank, axis=-1, keepdims=True) + 1e-8)
        cos = feats_n @ bank_n.T                                    # (HW, C)
        w = mask * (1.0 - cos)
        w = w / (jnp.sum(w, axis=0, keepdims=True) + 1e-8)
        warm_update = w.T @ feats_n                                 # (C, D)
        # Reference normalises the stored row in place before the blend
        # (aux_path_memory.py:106,114).
        old_for_ema = bank_n
    else:
        raise ValueError(f"Unknown ensemble_mode: {ensemble_mode!r}")

    blended = (1.0 - m) * old_for_ema + m * warm_update

    cold = jnp.all(bank == 0.0, axis=-1, keepdims=True)             # (C, 1)
    new = jnp.where(cold, raw_mean, blended)
    has_pixels = (counts > 0)[:, None]
    return jnp.where(has_pixels, new, bank)


def memory_update(bank, aux_features, scribble_one_hot, step, max_step,
                  momentum=0.9, ensemble_mode="cosine_similarity",
                  update_mode="all"):
    """Pure functional memory-bank update (reference: aux_path_memory.py:68-116).

    Args:
      bank: ``(C, D)``.
      aux_features: ``(N, h, w, D)`` bottleneck features (pre-upsample).
      scribble_one_hot: ``(N, H, W, C+1)``.
      step / max_step: epoch index / total epochs (momentum ramp input).
      update_mode: ``'all'`` (every sample folds in sequentially) or
        ``'first'`` (reference parity: only batch sample 0 updates,
        aux_path_memory.py:116).

    Returns:
      New ``(C, D)`` bank.  Gradients are stopped — the reference update runs
      under ``@torch.no_grad()``.
    """
    n, big_h, big_w = scribble_one_hot.shape[:3]
    feats = bilinear_resize_align_corners(
        aux_features.astype(jnp.float32), big_h, big_w)
    feats = feats.reshape(n, big_h * big_w, -1)
    scb = scribble_one_hot.reshape(n, big_h * big_w, -1)
    m = memory_momentum(step, max_step, momentum)

    feats = jax.lax.stop_gradient(feats)
    bank = jax.lax.stop_gradient(bank)

    if update_mode == "first":
        return _update_bank_one_sample(bank, feats[0], scb[0], m, ensemble_mode)
    if update_mode != "all":
        raise ValueError(f"Unknown update_mode: {update_mode!r}")

    def body(carry, xs):
        f, s = xs
        return _update_bank_one_sample(carry, f, s, m, ensemble_mode), None

    new_bank, _ = jax.lax.scan(body, bank, (feats, scb))
    return new_bank


def init_memory_bank(num_classes: int, hid_ch: int):
    """Zero-initialised bank (reference: aux_path_memory.py:40-43)."""
    return jnp.zeros((num_classes, hid_ch), jnp.float32)
