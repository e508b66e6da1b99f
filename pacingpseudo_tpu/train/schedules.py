"""Learning-rate schedules and loss ramp-ups (pure functions).

Functional equivalents of the reference experiment utilities
(reference: utils/utils.py:7-65) plus the memory-bank momentum ramp
(reference: models/aux_path_memory.py:118-120).  Unlike the reference, these
never mutate an optimizer — they return scalars and are safe to call on
traced values inside jit (``jnp.where`` instead of Python branches).
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_lr_decay(step, num_steps, base_lr):
    """``(1 - step/num_steps) * base_lr`` — reference utils/utils.py:7-21."""
    return (1.0 - step / num_steps) * base_lr


def cosine_lr_decay(step, num_steps, base_lr):
    """``0.5*(1+cos(step*pi/num_steps))*base_lr`` — reference utils/utils.py:23-36."""
    return 0.5 * (1.0 + jnp.cos(step * jnp.pi / num_steps)) * base_lr


def poly_lr_decay(step, num_steps, base_lr, gamma=0.9):
    """``base_lr * (1 - step/num_steps)**gamma`` — reference utils/utils.py:38-51."""
    return base_lr * (1.0 - step / num_steps) ** gamma


_SCHEDULES = {
    "linear": linear_lr_decay,
    "cosine": cosine_lr_decay,
    "poly": poly_lr_decay,
}


def make_lr_schedule(policy: str, num_steps: int, base_lr: float):
    """Return ``fn(step) -> lr`` for ``policy`` in {linear, cosine, poly}.

    The reference decays per **epoch** (train_chaos.py:253-258); callers pass
    the epoch index as ``step``.
    """
    try:
        fn = _SCHEDULES[policy]
    except KeyError:
        raise ValueError(f"Unimplemented learning rate decay policy: {policy!r}")
    return lambda step: fn(step, num_steps, base_lr)


def gaussian_ramp_up(t, base_value, max_t=80, scale=5.0):
    """Exponential ramp-up of a loss weight, plateauing at ``base_value``.

    ``base * exp(-scale * (1 - t/max_t))`` for ``t < max_t``, else ``base``.
    Reference: utils/utils.py:53-65.  The reference hard-codes ``max_t=80``
    even for 400-epoch runs (drivers pass only ``scale``,
    train_chaos.py:280,288) — default preserved.  Traced-``t`` safe.
    """
    ramped = base_value * jnp.exp(-scale * (1.0 - t / max_t))
    return jnp.where(t < max_t, ramped, base_value)


def memory_momentum(step, max_step, base_mo=0.9, gamma=0.9):
    """Memory-bank EMA weight for the *new* estimate; ramps **down** 0.9 → 0.

    ``(1 - step/max_step)**gamma * base_mo`` — reference
    models/aux_path_memory.py:118-120 (``_ramp_up_mo``; despite its name the
    returned ``m`` weights the fresh per-batch prototype, so the weight on
    the stored memory ``(1-m)`` ramps up).
    """
    return (1.0 - step / max_step) ** gamma * base_mo
