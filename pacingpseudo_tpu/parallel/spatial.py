"""Spatial (height-axis) sharding for convolutional inference AND training.

SURVEY.md §5 notes the reference has no sequence/long-context parallelism
and that the analogous axis in this domain is spatial resolution.  This
module provides that stretch goal: shard the H axis of activations over a
``space`` mesh and let GSPMD partition every convolution (XLA inserts the
halo exchanges for the 3x3/dilated kernels automatically — no manual
ppermute needed, the "annotate shardings, let XLA insert collectives"
recipe).

Useful when a single large slice (or batch-1 latency) matters more than
batch throughput: a UNet forward over an 8-way spatial mesh runs with each
device holding H/8 rows.

For TRAINING, :func:`train_mesh` builds a 2-D ``('data', 'space')`` mesh
and :func:`make_spatial_constraint` pins the post-augmentation batch to
``P('data', 'space')`` inside the jitted train/eval step; GSPMD then
partitions the whole forward+backward (conv halos in both directions) and
keeps gradient/BN reductions global — sync-BN semantics are unchanged
because the reductions still run over the full (N, H, W) extent inside
jit.  The driver exposes this as ``--spatial_shards`` (streaming path)."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_mesh(num_devices: int = 0) -> Mesh:
    """1-D ``space`` mesh over the first ``num_devices`` devices (0 = all)."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("space",))


def shard_spatial(image, mesh: Mesh):
    """Shard an (N, H, W, C) image along H over the ``space`` axis."""
    return jax.device_put(
        image, NamedSharding(mesh, P(None, "space", None, None)))


def train_mesh(n_data: int, n_space: int) -> Mesh:
    """2-D ``('data', 'space')`` mesh over the first n_data*n_space devices.

    Batches shard over ``data`` (as in parallel/mesh.py) and activation
    heights over ``space``; the two compose — each device holds an
    (N/n_data, H/n_space) activation block.
    """
    devices = jax.devices()[: n_data * n_space]
    return Mesh(np.asarray(devices).reshape(n_data, n_space),
                ("data", "space"))


def make_spatial_constraint(mesh: Mesh):
    """Build a batch-resharding hook for the jitted train/eval steps.

    Returns ``constrain(batch)`` pinning every (N, H, ...) array leaf of
    rank >= 3 to ``P('data', 'space', ...)``.  Applied AFTER the on-device
    augmentation (whose per-pixel gathers want the whole canvas local) and
    BEFORE the model, so only model activations are spatially partitioned;
    GSPMD propagates the layout through the UNet and emits halo exchanges.
    """

    def constrain(batch):
        out = {}
        for k, v in batch.items():
            if hasattr(v, "ndim") and v.ndim >= 3:
                spec = P("data", "space", *([None] * (v.ndim - 2)))
                out[k] = jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, spec))
            else:
                out[k] = v
        return out

    return constrain


def spatial_forward(model, variables, mesh: Mesh):
    """Build a jitted forward whose activations stay H-sharded.

    The input constraint pins the layout; GSPMD propagates it through every
    conv/pool/upsample and emits halo exchanges over ICI.
    """
    in_sharding = NamedSharding(mesh, P(None, "space", None, None))

    @jax.jit
    def fwd(image):
        image = jax.lax.with_sharding_constraint(image, in_sharding)
        out = model.apply(variables, image, train=False)
        return out["segmentation/logits"]

    return fwd
