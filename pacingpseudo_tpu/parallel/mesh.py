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


def factor_devices(avail: int, batch_size: int):
    """Factor ``avail`` devices as (n_space, n_data) maximising utilisation.

    Pure data parallelism requires ``n_data | batch_size``; when that
    strands devices (reference batch 12 on 8 chips -> 6 used), splitting
    the remainder onto a 'space' (activation-height) axis keeps every chip
    busy at the exact reference batch with identical numerics
    (parallel/spatial.py).  Preference order: most devices used, then the
    smallest space factor (halo exchanges cost more than batch sharding),
    then the largest data axis.
    """
    best = (1, max(d for d in range(1, avail + 1) if batch_size % d == 0))
    best_used = best[0] * best[1]
    for s in range(2, avail + 1):
        if avail % s:
            continue
        d = max(dd for dd in range(1, avail // s + 1) if batch_size % dd == 0)
        if d * s > best_used:
            best, best_used = (s, d), d * s
    return best


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


def _mesh_size(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else int(np.prod(mesh.devices.shape))


def _data_size(mesh: Optional[Mesh]) -> int:
    """Devices along the ``data`` axis (a 2-D ('data','space') training
    mesh shards the pool over ``data`` only; parallel/spatial.py)."""
    if mesh is None:
        return 1
    try:
        return int(dict(mesh.shape)["data"])
    except Exception:
        return _mesh_size(mesh)


def stage_resident_pool(arrays: Dict[str, np.ndarray], mesh: Optional[Mesh]
                        ) -> Dict[str, jax.Array]:
    """Device-put a resident data pool, sharded on the slice axis.

    Single device: plain ``device_put`` (HBM-resident, replica of round 1's
    behaviour).  Multi-device: each array (N, ...) is padded to a multiple
    of the mesh size by repeating the final slice (the padding rows are
    never indexed — shuffle indices stay < N) and sharded ``P('data')`` on
    axis 0, so each chip holds ~N/n_dev slices and the whole pool scales
    with the slice count.
    """
    if _mesh_size(mesh) == 1:
        return {k: jax.device_put(v) for k, v in arrays.items()}
    n_data = _data_size(mesh)
    out = {}
    for k, v in arrays.items():
        n = v.shape[0]
        pad = (-n) % n_data
        if pad:
            v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
        out[k] = jax.device_put(
            v, NamedSharding(mesh, P(*(["data"] + [None] * (v.ndim - 1)))))
    return out


def make_resident_gather(mesh: Optional[Mesh]):
    """Build ``gather(pool, idx) -> batch`` over a (possibly sharded) pool.

    Multi-device pools are sharded on axis 0 (:func:`stage_resident_pool`);
    the gather uses the sharded-table-lookup pattern: every device resolves
    the requested GLOBAL indices against its local shard, zero-masks the
    misses, and one ``psum_scatter`` over ``data`` sums the partial batches
    while leaving each device exactly its batch shard.  Global shuffle
    semantics are therefore IDENTICAL to the single-device pool (no
    per-shard sampling restriction), and the collective moves one batch —
    not the pool — over ICI.

    ``idx`` must be replicated with length divisible by the DATA-axis size
    (on a 2-D ('data','space') mesh the pool is padded/sharded by the data
    axis only and replicated across 'space').
    """
    import jax.numpy as jnp

    if _mesh_size(mesh) == 1:
        return lambda pool, idx: {k: jnp.take(v, idx, axis=0)
                                  for k, v in pool.items()}

    def _scatter_dtype(dt):
        """Exact collective dtype per payload: each global index lives in
        exactly ONE shard, so the psum sums a single nonzero contribution —
        any dtype that represents the original values is exact.  Keep
        half-width floats half-width; widen sub-int32 ints (TPU reduce
        support) and anything else to a 4-byte type."""
        if jnp.issubdtype(dt, jnp.floating):
            return dt if jnp.dtype(dt).itemsize <= 2 else jnp.float32
        return jnp.int32

    def _local(pool_l, idx):
        d = jax.lax.axis_index("data")
        out = {}
        for k, v in pool_l.items():
            local_n = v.shape[0]                      # shard size N_pad/n_dev
            loc = idx - d * local_n
            hit = (loc >= 0) & (loc < local_n)
            got = jnp.take(v, jnp.clip(loc, 0, local_n - 1), axis=0)
            mask = hit.reshape((-1,) + (1,) * (got.ndim - 1))
            got = jnp.where(mask, got, 0).astype(_scatter_dtype(v.dtype))
            got = jax.lax.psum_scatter(got, "data", scatter_dimension=0,
                                       tiled=True)
            out[k] = got.astype(v.dtype)
        return out

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    def gather(pool, idx):
        return shard_map(_local, mesh=mesh,
                         in_specs=(P("data"), P()),
                         out_specs=P("data"))(pool, idx)

    return gather


def replicate(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (train state) across the mesh."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(tree)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
