"""Data-parallel device mesh + sharding helpers.

The reference is single-process/single-GPU with no distributed backend
(SURVEY.md §2: no torch.distributed/NCCL anywhere; device selection is an
env var, train_chaos.py:434).  The TPU-native equivalent is first-class:
a 1-D ``data`` mesh over the slice's chips; batches are sharded along the
batch axis with ``NamedSharding``, the train state is replicated, and
``jax.jit`` inserts the gradient all-reduce (and any resharding) as XLA
collectives over ICI.

Cross-replica BatchNorm comes for free in this design: BN reduces over the
*global* batch axis inside jit, so XLA emits the cross-device ``all-reduce``
for the mean/var — the sync-BN choice documented in SURVEY.md §5.  (The
reference's per-device BN is vacuous at one GPU; sync-BN is the correct
generalisation under sharding.)

No multi-host/DCN support is required for these workloads (22M-param UNet,
batch 12); everything rides a single slice's ICI.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: int = 0) -> Mesh:
    """1-D ``data`` mesh over the first ``num_devices`` devices (0 = all)."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard ``axis`` (the batch axis) over ``data``; replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Dict[str, jax.Array], mesh: Optional[Mesh],
                axis: int = 0):
    """Device-put a batch dict with batch-axis sharding (host lists pass
    through).  ``axis=1`` serves chunked batches stacked as (K, N, ...)."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return {k: (jax.device_put(v) if not isinstance(v, list) else v)
                for k, v in batch.items()}
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            out[k] = v
            continue
        out[k] = jax.device_put(v, batch_sharding(mesh, np.ndim(v), axis))
    return out


def replicate(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (train state) across the mesh."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(tree)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
