from .losses import (
    entropy_minimization_loss,
    cross_entropy_loss,
    partial_cross_entropy_loss,
    soft_label_cross_entropy_loss,
    l1_loss,
    l2_loss,
    kl_loss,
    bidirectional_kl_loss,
    dice_loss_fn,
    multi_label_soft_margin_loss,
)

__all__ = [
    "entropy_minimization_loss",
    "cross_entropy_loss",
    "partial_cross_entropy_loss",
    "soft_label_cross_entropy_loss",
    "l1_loss",
    "l2_loss",
    "kl_loss",
    "bidirectional_kl_loss",
    "dice_loss_fn",
    "multi_label_soft_margin_loss",
]
