"""Optimizers with torch-parity semantics.

The reference uses ``torch.optim.Adam(lr, weight_decay)`` and
``torch.optim.SGD(lr, momentum, weight_decay)`` (reference:
train_chaos.py:218-221, upper_bound_chaos.py:130).  Torch's
``weight_decay`` is **coupled** L2 (added to the gradient before the Adam
moments), not AdamW — so the optax chain below applies
``add_decayed_weights`` *before* ``scale_by_adam``, and decay hits every
parameter (torch decays BN affine and biases too).

Learning rate follows the reference's per-epoch decay: the injected
schedule maps the global step to an epoch index first.
"""
from __future__ import annotations

import optax

from pacingpseudo_tpu.train.schedules import make_lr_schedule


def make_optimizer(config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Build the optax transformation for an :class:`ExperimentConfig`."""
    lr_by_epoch = make_lr_schedule(config.lr_decay, config.epoch, config.lr)

    def schedule(step):
        return lr_by_epoch(step // steps_per_epoch)

    if config.optimizer == "adam":
        # torch Adam defaults: betas=(0.9, 0.999), eps=1e-8.
        return optax.chain(
            optax.add_decayed_weights(config.wd),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        )
    if config.optimizer == "momentum":
        # torch SGD(momentum): buf = mu*buf + (grad + wd*p); update = lr*buf.
        return optax.chain(
            optax.add_decayed_weights(config.wd),
            optax.trace(decay=config.momentum, nesterov=False),
            optax.scale_by_learning_rate(schedule),
        )
    raise ValueError(f"Unimplemented optimizer: {config.optimizer!r}")
