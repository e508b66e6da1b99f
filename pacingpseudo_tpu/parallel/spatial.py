"""Spatial (height-axis) sharding for convolutional inference.

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
"""
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
