"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the JAX analogue of
a fake multi-node backend); real-TPU execution is exercised by bench.py and
the driver's compile checks instead.
"""
import os

# Must be set before jax is imported anywhere.  The sandbox presets
# JAX_PLATFORMS=axon (a tunneled remote TPU) — tests must override it, or
# every op round-trips the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox's sitecustomize registers the axon PJRT plugin and pins
# jax_platforms='axon,cpu' programmatically, which overrides the env var —
# pin it back before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
