"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

The JAX analogue of a fake multi-node backend (SURVEY.md §4): the jitted
train step must produce the same losses whether the batch lives on one
device or is sharded over 8, because jit+NamedSharding semantics are
placement-independent (collectives only change WHERE the reductions run).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pacingpseudo_tpu.config import ExperimentConfig
from pacingpseudo_tpu.models import PacingPseudoModel
from pacingpseudo_tpu.parallel import data_mesh, replicate, shard_batch
from pacingpseudo_tpu.train.optim import make_optimizer
from pacingpseudo_tpu.train.state import create_train_state
from pacingpseudo_tpu.train.step import make_pacing_train_step

C = 3
H = W = 32
N = 8


def _setup(rng):
    config = ExperimentConfig(
        num_classes=C, ignored_index=C, session="Experiment",
        do_loss_ent=True, do_decoder_consistency=True, do_aux_path=True,
        do_memory=True, batch_size=N, epoch=10, compute_dtype="float32",
    ).validate()
    model = PacingPseudoModel(num_classes=C, init_ch=8, output_stride=8,
                              do_aux_path=True, dtype=jnp.float32)
    batch = {
        "image": np.asarray(rng.randn(N, H, W, 1), np.float32),
        "image_strong": np.asarray(rng.randn(N, H, W, 1), np.float32),
        "scribble": np.eye(C + 1, dtype=np.float32)[
            rng.randint(0, C + 1, (N, H, W))],
        "valid_mask": np.ones((N, H, W, 1), np.float32),
    }
    tx = make_optimizer(config, steps_per_epoch=4)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx,
        {"image": jnp.zeros((N, H, W, 1), jnp.float32)},
        with_memory=True, num_classes=C)
    step = make_pacing_train_step(config, model, tx, steps_per_epoch=4,
                                  donate=False)
    return config, model, state, batch, step


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(rng):
    _, _, state, batch, step = _setup(rng)
    key = jax.random.PRNGKey(3)

    # single device
    _, m1 = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    # 8-way data mesh
    mesh = data_mesh(8)
    state8 = replicate(state, mesh)
    batch8 = shard_batch(batch, mesh)
    st8, m8 = step(state8, batch8, key)

    for k in m1:
        assert np.allclose(float(m1[k]), float(m8[k]), rtol=2e-4, atol=1e-5), (
            k, float(m1[k]), float(m8[k]))

    # Updated params: identical losses prove the math; sharded reductions
    # reorder float ops and Adam's early steps are ~lr*sign(grad), so a
    # last-bit gradient wiggle flips an lr-sized update — bound by one step.
    st1, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, key)
    p1 = jax.tree.leaves(st1.params)[0]
    p8 = jax.tree.leaves(st8.params)[0]
    assert np.allclose(np.asarray(p1), np.asarray(p8), atol=2 * 1e-4)


def test_batchnorm_is_cross_replica(rng):
    """BN batch statistics must be computed over the GLOBAL batch: the
    updated running mean must match the single-device run exactly, proving
    XLA inserted the cross-device reduction (sync-BN by construction)."""
    _, _, state, batch, step = _setup(rng)
    key = jax.random.PRNGKey(3)
    _, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, key)
    st1, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = data_mesh(8)
    st8, _ = step(replicate(state, mesh), shard_batch(batch, mesh), key)

    bs1 = jax.tree.leaves(st1.batch_stats)
    bs8 = jax.tree.leaves(st8.batch_stats)
    for a, b in zip(bs1, bs8):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_spatial_sharding_matches_single_device(rng):
    """UNet forward with H sharded over 8 devices == unsharded forward.

    GSPMD must partition the convs (halo exchanges) without changing the
    result (parallel/spatial.py).
    """
    from pacingpseudo_tpu.models import UNet
    from pacingpseudo_tpu.parallel.spatial import (shard_spatial,
                                                   spatial_forward,
                                                   spatial_mesh)

    model = UNet(num_classes=4, init_ch=8, output_stride=8,
                 elab_end_points=False, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    ref = model.apply(variables, x, train=False)["segmentation/logits"]

    mesh = spatial_mesh(8)
    fwd = spatial_forward(model, variables, mesh)
    got = fwd(shard_spatial(x, mesh))
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_spatial_sharded_train_step_matches_single_device(rng):
    """Training with activations H-sharded over a ('data','space') mesh
    (parallel/spatial.py make_spatial_constraint) reproduces the
    single-device losses: with_sharding_constraint only changes WHERE the
    math runs, and GSPMD's conv halo exchanges keep the fwd+bwd exact."""
    from pacingpseudo_tpu.config import ExperimentConfig
    from pacingpseudo_tpu.parallel.spatial import (
        make_spatial_constraint, train_mesh)

    config = ExperimentConfig(
        num_classes=C, ignored_index=C, session="Experiment",
        do_loss_ent=True, do_decoder_consistency=True, do_aux_path=True,
        do_memory=True, batch_size=N, epoch=10, compute_dtype="float32",
    ).validate()
    model = PacingPseudoModel(num_classes=C, init_ch=8, output_stride=8,
                              do_aux_path=True, dtype=jnp.float32)
    batch = {
        "image": np.asarray(rng.randn(N, H, W, 1), np.float32),
        "image_strong": np.asarray(rng.randn(N, H, W, 1), np.float32),
        "scribble": np.eye(C + 1, dtype=np.float32)[
            rng.randint(0, C + 1, (N, H, W))],
        "valid_mask": np.ones((N, H, W, 1), np.float32),
    }
    tx = make_optimizer(config, steps_per_epoch=4)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx,
        {"image": jnp.zeros((N, H, W, 1), jnp.float32)},
        with_memory=True, num_classes=C)
    key = jax.random.PRNGKey(3)

    step1 = make_pacing_train_step(config, model, tx, steps_per_epoch=4,
                                   donate=False)
    _, m1 = step1(state, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = train_mesh(2, 4)  # 2-way data x 4-way space over the 8 devices
    constraint = make_spatial_constraint(mesh)
    step_sp = make_pacing_train_step(config, model, tx, steps_per_epoch=4,
                                     donate=False,
                                     spatial_constraint=constraint)
    from pacingpseudo_tpu.parallel import replicate, shard_batch
    st_sp, m_sp = step_sp(replicate(state, mesh), shard_batch(batch, mesh),
                          key)

    for k in m1:
        assert np.allclose(float(m1[k]), float(m_sp[k]), rtol=2e-4,
                           atol=1e-5), (k, float(m1[k]), float(m_sp[k]))
