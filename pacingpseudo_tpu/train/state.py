"""Train state: one immutable pytree carrying everything a step needs.

The reference scatters mutable state across the torch module (params, BN
running stats, the memory bank as a non-trainable Parameter) and the
optimizer object.  Here it is a single ``flax.struct`` dataclass so the
whole update is one pure function ``state -> state`` under jit, and Orbax
can checkpoint/restore it atomically — including the optimizer state the
reference never saved (SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from pacingpseudo_tpu.models.aux_path import init_memory_bank


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray            # global optimizer step (int32 scalar)
    params: Any
    batch_stats: Any
    opt_state: Any
    memory_bank: Optional[jnp.ndarray]   # (C, hid_ch) or None

    def epoch(self, steps_per_epoch: int):
        return self.step // steps_per_epoch


def create_train_state(rng, model, tx, sample_batch, with_memory: bool,
                       num_classes: int = 0, hid_ch: int = 64,
                       siamese: bool = True) -> TrainState:
    """Initialise parameters/stats/opt-state from a sample batch.

    Args:
      sample_batch: dict with at least ``image`` (N, H, W, 1); when
        ``siamese`` the strong stream is initialised too (same shapes).
    """
    image = sample_batch["image"]
    init_rng, drop_rng = jax.random.split(rng)
    if siamese:
        variables = model.init(
            {"params": init_rng, "dropout": drop_rng},
            image, image, train=True)
    else:
        variables = model.init(
            {"params": init_rng, "dropout": drop_rng},
            image, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    bank = init_memory_bank(num_classes, hid_ch) if with_memory else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        memory_bank=bank,
    )
