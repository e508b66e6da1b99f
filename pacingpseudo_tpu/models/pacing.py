"""Siamese pacing-pseudo model: shared-weight UNet + AuxPath.

Functional re-design of the reference ``ConsistencyRegulr`` wrapper
(reference: models/consistency_reglur_memory.py:13-102).  The module runs
the network(s) and returns named logits/features; **loss assembly lives in
``train/step.py``** as pure functions of these outputs, so one jitted train
step fuses forward, all losses, backward and the optimizer update.

TPU-first choice — fused streams: the weak and strong images can be stacked
into a single batch of 2N and pushed through ONE backbone application
(``fuse_streams=True``), which doubles the matmul batch the MXU sees and
halves kernel-launch bookkeeping.  The reference instead runs two sequential
forwards with per-stream BatchNorm batch statistics
(consistency_reglur_memory.py:29,48); ``fuse_streams=False`` reproduces that
exactly (two applies; running stats are updated sequentially, weak first).
With fused streams the BN batch statistics are computed over both streams
jointly — a documented deviation that only matters while BN is in training
mode.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pacingpseudo_tpu.models.aux_path import AuxPath
from pacingpseudo_tpu.models.unet import UNet

Dtype = Any


class PacingPseudoModel(nn.Module):
    """Owns one shared-weight backbone and one auxiliary path.

    ``__call__(image, image_strong, train)`` returns a dict:
      ``segmentation/logits``         weak-stream logits (N, H, W, C)
      ``segmentation/logits_strong``  strong-stream logits (when given)
      ``aux/features``                bottleneck features (when do_aux_path)
      ``aux/logits``                  full-res auxiliary logits
    """

    # Backbone kwargs (reference: train_chaos.py:190-199)
    input_ch: int = 1
    init_ch: int = 32
    max_ch: int = 512
    num_classes: int = 5
    output_stride: int = 8
    is_stride_conv: bool = False
    is_trans_conv: bool = False
    # Aux-path kwargs (reference: train_chaos.py:201-211)
    do_aux_path: bool = False
    feat_stage: Sequence[str] = ("encoder/stage6", "encoder/stage5")
    hid_ch: int = 64
    aux_drop_prob: float = 0.0
    # Reference aliasing quirk: the torch UNet stores end_points in ONE
    # shared instance dict (unet.py:23), so the strong forward overwrites
    # the weak end_points in place and the aux path + memory bank actually
    # consume the STRONG stream's encoder features whenever the consistency
    # branch runs (consistency_reglur_memory.py:48,74).  True (default)
    # reproduces that — the behaviour behind the published numbers; False
    # feeds the aux path the weak stream's features.
    aux_on_strong: bool = True
    # TPU knobs
    fuse_streams: bool = True
    s2d_hires: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = UNet(
            input_ch=self.input_ch,
            init_ch=self.init_ch,
            max_ch=self.max_ch,
            num_classes=self.num_classes,
            output_stride=self.output_stride,
            is_stride_conv=self.is_stride_conv,
            is_trans_conv=self.is_trans_conv,
            elab_end_points=True,
            s2d_hires=self.s2d_hires,
            dtype=self.dtype,
            name="backbone",
        )
        if self.do_aux_path:
            self.aux_path = AuxPath(
                num_classes=self.num_classes,
                feat_stage=self.feat_stage,
                hid_ch=self.hid_ch,
                aux_drop_prob=self.aux_drop_prob,
                dtype=self.dtype,
                name="aux_path",
            )

    def __call__(self, image, image_strong=None, train: bool = False,
                 module_train=None):
        """Run the siamese forward.

        ``train`` selects the *mode* (whether the strong stream / aux path
        run — reference ``mode='train'``); ``module_train`` selects the
        torch-module train/eval state (BatchNorm batch-vs-running stats and
        dropout).  They normally coincide, but the reference drivers switch
        the module to eval() at the first validation and never back
        (train_chaos.py:370), training epochs >= 1 with frozen BN; passing
        ``module_train=False`` with ``train=True`` reproduces that.
        """
        if module_train is None:
            module_train = train
        n, h, w, _ = image.shape
        outputs = {}

        use_strong_aux = self.aux_on_strong and image_strong is not None
        if image_strong is not None and self.fuse_streams:
            both = jnp.concatenate([image, image_strong], axis=0)
            end_points = self.backbone(both, train=module_train)
            logits = end_points["segmentation/logits"]
            outputs["segmentation/logits"] = logits[:n]
            outputs["segmentation/logits_strong"] = logits[n:]
            # Which stream feeds the aux path: see ``aux_on_strong``.
            sl = slice(n, None) if use_strong_aux else slice(None, n)
            aux_end_points = {
                s: end_points[s][sl] for s in self.feat_stage
            } if self.do_aux_path else None
        else:
            end_points = self.backbone(image, train=module_train)
            outputs["segmentation/logits"] = end_points["segmentation/logits"]
            aux_end_points = end_points if self.do_aux_path else None
            if image_strong is not None:
                end_points_strong = self.backbone(image_strong, train=module_train)
                outputs["segmentation/logits_strong"] = (
                    end_points_strong["segmentation/logits"])
                if self.do_aux_path and use_strong_aux:
                    aux_end_points = end_points_strong

        if self.do_aux_path and train:
            aux_features, logits_aux = self.aux_path(
                aux_end_points, (h, w), train=module_train)
            outputs["aux/features"] = aux_features
            outputs["aux/logits"] = logits_aux

        return outputs

    def classify_bank(self, bank):
        """Shared-classifier logits for the memory prototypes (C, C)."""
        return self.aux_path.classify_bank(bank)
