"""Device-resident data paths: train-step gather + one-dispatch validation."""
import jax
import jax.numpy as jnp
import numpy as np

from pacingpseudo_tpu.config import ExperimentConfig
from pacingpseudo_tpu.models import PacingPseudoModel
from pacingpseudo_tpu.train.optim import make_optimizer
from pacingpseudo_tpu.train.state import create_train_state
from pacingpseudo_tpu.train.step import (
    make_pacing_train_step,
    make_resident_chunked_train_step,
    make_resident_eval_fn,
)

C, S, H, N = 3, 32, 32, 2


def _setup(rng):
    config = ExperimentConfig(
        num_classes=C, ignored_index=C, session="Experiment",
        do_loss_ent=True, do_decoder_consistency=True, do_aux_path=False,
        do_memory=False, batch_size=N, epoch=10, compute_dtype="float32",
    ).validate()
    model = PacingPseudoModel(num_classes=C, init_ch=8, output_stride=8,
                              do_aux_path=False, dtype=jnp.float32)
    tx = make_optimizer(config, steps_per_epoch=4)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx,
        {"image": jnp.zeros((N, H, H, 1), jnp.float32)},
        with_memory=False)
    return config, model, tx, state


def _pool(rng, m=6):
    return {
        "image": jnp.asarray(rng.randn(m, S, S).astype(np.float16)),
        "label": jnp.asarray(rng.randint(0, C, (m, S, S)).astype(np.uint8)),
        "scribble": jnp.asarray(rng.randint(0, C + 1, (m, S, S)).astype(np.uint8)),
        "size": jnp.asarray(np.tile([S, S], (m, 1)), jnp.int32),
    }


def test_resident_train_gathers_match_direct_batches(rng):
    from pacingpseudo_tpu.aug.engine import make_train_augment_fn
    from pacingpseudo_tpu.aug.params import BaseAugParams, StrongAugParams

    config, model, tx, state = _setup(rng)
    pool = _pool(rng)
    bp = BaseAugParams(crop_size=(H, H), num_classes=C, ignored_index=C,
                       elastic_field_downscale=4, elastic_blur_radius=3)
    aug = make_train_augment_fn(bp, StrongAugParams.color(1.0), True)
    body = make_pacing_train_step(config, model, tx, steps_per_epoch=4,
                                  augment_fn=aug, jit=False)
    chunked = make_resident_chunked_train_step(body, 2)
    idx = jnp.asarray([[0, 3], [5, 1]], jnp.int32)
    key = jax.random.PRNGKey(4)

    # direct path FIRST (the chunked call donates/consumes `state`)
    st = state
    total = 0.0
    for i in range(2):
        raw = {k: jnp.take(v, idx[i], axis=0) for k, v in pool.items()}
        st, m = jax.jit(body)(st, raw, jax.random.fold_in(key, i))
        total += float(m["loss_total"])

    st_res, summed = chunked(state, pool, idx, key)
    assert np.allclose(float(summed["loss_total"]), total, rtol=1e-4, atol=1e-5)
    assert int(st_res.step) == 2


def test_resident_eval_matches_streaming(rng):
    config, model, tx, state = _setup(rng)
    pool = _pool(rng, m=5)  # 5 slices, batch 2 -> 3 blocks, last padded
    n_val = 5
    n_blocks = 3
    idx = np.minimum(np.arange(n_blocks * N), n_val - 1).reshape(n_blocks, N)
    valid = (np.arange(n_blocks * N) < n_val).reshape(n_blocks, N)

    eval_all = make_resident_eval_fn(config, model, upper_bound=False)
    acc = eval_all(state, pool, jnp.asarray(idx, jnp.int32), jnp.asarray(valid))

    # streaming reference with the same preprocessing
    from pacingpseudo_tpu.evals.dice import dice_per_class_jax
    from pacingpseudo_tpu.losses import partial_cross_entropy_loss
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    loss_sum = n_sum = 0.0
    dice_rows = []
    for b in range(n_blocks):
        raw = {k: np.asarray(jnp.take(v, jnp.asarray(idx[b]), axis=0))
               for k, v in pool.items()}
        img = raw["image"].astype(np.float32)
        img = (img - img.mean(axis=(1, 2), keepdims=True)) / (
            img.std(axis=(1, 2), keepdims=True) + 1e-8)
        out = model.apply(variables, jnp.asarray(img[..., None]), None,
                          train=False)
        logits = out["segmentation/logits"]
        # pad-duplicate samples are excluded from the loss (their target is
        # forced to ignored_index) — mirror that here
        scb = raw["scribble"].astype(np.int32)
        scb[~valid[b]] = C
        loss = float(partial_cross_entropy_loss(logits, jnp.asarray(scb), C))
        n_real = int(valid[b].sum())
        loss_sum += loss * n_real
        n_sum += n_real
        label_oh = jax.nn.one_hot(raw["label"].astype(np.int32), C)
        dice = np.asarray(dice_per_class_jax(
            jax.nn.softmax(logits, -1), label_oh))
        dice_rows.append(dice[valid[b]])
    dice_all = np.concatenate(dice_rows)
    expect_sum = np.nansum(dice_all, axis=0)
    expect_cnt = np.sum(~np.isnan(dice_all), axis=0)

    assert np.allclose(float(acc["loss_sum"]), loss_sum, rtol=1e-4, atol=1e-4)
    assert float(acc["n_sum"]) == n_sum
    assert np.allclose(np.asarray(acc["dice_sum"]), expect_sum, atol=1e-4)
    assert np.allclose(np.asarray(acc["dice_cnt"]), expect_cnt)


def test_sharded_pool_gather_exact(rng):
    """stage_resident_pool + make_resident_gather over the 8-device mesh
    reproduce a plain jnp.take with global indices, bit-exactly, including
    the padded-pool tail never being read."""
    from pacingpseudo_tpu.parallel import (
        data_mesh, make_resident_gather, stage_resident_pool)
    mesh = data_mesh(8)
    m = 21  # deliberately not divisible by 8
    pool_np = {
        "image": rng.randn(m, S, S).astype(np.float16),
        "label": rng.randint(0, C, (m, S, S)).astype(np.uint8),
        "scribble": rng.randint(0, C + 1, (m, S, S)).astype(np.uint8),
        "size": np.tile([S, S], (m, 1)).astype(np.int32),
    }
    pool = stage_resident_pool(pool_np, mesh)
    gather = jax.jit(make_resident_gather(mesh))
    idx = rng.permutation(m)[:16].astype(np.int32)
    out = gather(pool, jnp.asarray(idx))
    for k, v in pool_np.items():
        got = np.asarray(out[k])
        assert got.dtype == v.dtype
        assert np.array_equal(got, v[idx]), k


def test_resident_train_multidevice_matches_single(rng):
    """The full resident chunked train step over a sharded pool on the
    8-device mesh matches the single-device pool run (same global indices)."""
    from pacingpseudo_tpu.aug.engine import make_train_augment_fn
    from pacingpseudo_tpu.aug.params import BaseAugParams, StrongAugParams
    from pacingpseudo_tpu.parallel import (
        data_mesh, replicate, stage_resident_pool)

    config, model, tx, state = _setup(rng)
    pool_np = {k: np.asarray(v) for k, v in _pool(rng, m=9).items()}
    bp = BaseAugParams(crop_size=(H, H), num_classes=C, ignored_index=C,
                       elastic_field_downscale=4, elastic_blur_radius=3)
    aug = make_train_augment_fn(bp, StrongAugParams.color(1.0), True)
    body = make_pacing_train_step(config, model, tx, steps_per_epoch=4,
                                  augment_fn=aug, jit=False)
    idx = jnp.asarray([[0, 3], [5, 1]], jnp.int32)
    key = jax.random.PRNGKey(4)

    single = make_resident_chunked_train_step(body, 2)
    st1, m1 = single(state, {k: jnp.asarray(v) for k, v in pool_np.items()},
                     idx, key)

    # batch axis (N=2) must divide the mesh — use 2 of the 8 CPU devices
    mesh = data_mesh(2)
    _, _, _, state8 = _setup(rng)  # fresh state (single run donated its own)
    state8 = replicate(state8, mesh)
    pool8 = stage_resident_pool(pool_np, mesh)
    sharded = make_resident_chunked_train_step(body, 2, mesh=mesh)
    st8, m8 = sharded(state8, pool8, idx, key)

    assert np.allclose(float(m1["loss_total"]), float(m8["loss_total"]),
                       rtol=1e-4)
    # Cross-device reductions (BN stats, grad all-reduce) reorder float32
    # sums; near init Adam behaves sign-like (v ~ 0), so a tiny gradient
    # perturbation can flip an element's update by up to 2·lr.  Allow a few
    # lr=1e-4 steps of per-element jitter after 2 steps (measured max
    # ~2e-4); the loss above pins the trajectories to ~1e-5 relative.
    p1 = jax.tree.leaves(st1.params)
    p8 = jax.tree.leaves(st8.params)
    for a, b in zip(p1, p8):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4), a.shape


def test_resident_eval_multidevice_matches_single(rng):
    from pacingpseudo_tpu.parallel import (
        data_mesh, replicate, stage_resident_pool)
    config, model, tx, state = _setup(rng)
    pool_np = {k: np.asarray(v) for k, v in _pool(rng, m=5).items()}
    n_val, n_blocks = 5, 3
    idx = np.minimum(np.arange(n_blocks * N), n_val - 1).reshape(n_blocks, N)
    valid = (np.arange(n_blocks * N) < n_val).reshape(n_blocks, N)

    eval1 = make_resident_eval_fn(config, model, upper_bound=False)
    acc1 = eval1(state, {k: jnp.asarray(v) for k, v in pool_np.items()},
                 jnp.asarray(idx, jnp.int32), jnp.asarray(valid))

    mesh = data_mesh(2)
    eval8 = make_resident_eval_fn(config, model, upper_bound=False, mesh=mesh)
    acc8 = eval8(replicate(state, mesh), stage_resident_pool(pool_np, mesh),
                 jnp.asarray(idx, jnp.int32), jnp.asarray(valid))
    for k in acc1:
        assert np.allclose(np.asarray(acc1[k]), np.asarray(acc8[k]),
                           rtol=1e-5, atol=1e-5), k
