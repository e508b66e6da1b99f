"""End-to-end train-step smoke tests on synthetic data (CPU).

Covers: full pacing step (all losses on), upper-bound step, frozen-BN quirk
variant, eval steps, and that losses decrease over a few steps of
overfitting one batch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pacingpseudo_tpu.config import ExperimentConfig
from pacingpseudo_tpu.models import PacingPseudoModel
from pacingpseudo_tpu.train.optim import make_optimizer
from pacingpseudo_tpu.train.state import create_train_state
from pacingpseudo_tpu.train.step import (
    make_pacing_eval_step,
    make_pacing_train_step,
    make_upper_bound_eval_step,
    make_upper_bound_train_step,
)

H = W = 32
C = 3  # classes incl. background; ignore index = 3


def _config(**kw):
    base = dict(
        num_classes=C, ignored_index=C, epoch=10, batch_size=2,
        do_loss_ent=True, do_decoder_consistency=True,
        do_aux_path=True, do_memory=True,
        compute_dtype="float32", lr=1e-3,
    )
    base.update(kw)
    return ExperimentConfig(**base).validate()


def _batch(rng, n=2):
    img = jnp.asarray(rng.randn(n, H, W, 1), jnp.float32)
    scb_hard = rng.randint(0, C + 1, size=(n, H, W))
    label_hard = rng.randint(0, C, size=(n, H, W))
    return {
        "image": img,
        "image_strong": img + 0.05,
        "scribble": jax.nn.one_hot(scb_hard, C + 1),
        "label": jax.nn.one_hot(label_hard, C),
        "valid_mask": jnp.ones((n, H, W, 1), jnp.float32),
    }


def _model(config):
    return PacingPseudoModel(
        num_classes=config.num_classes,
        init_ch=8,  # small model: CPU-test speed (full size covered on TPU)
        output_stride=config.output_stride,
        do_aux_path=config.do_aux_path,
        hid_ch=config.hid_ch,
        dtype=jnp.float32,
    )


def _setup(config, rng):
    model = _model(config)
    batch = _batch(rng)
    tx = make_optimizer(config, steps_per_epoch=4)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx, batch,
        with_memory=config.do_memory, num_classes=config.num_classes,
        hid_ch=config.hid_ch)
    return model, tx, state, batch


def test_full_pacing_step_runs_and_learns(rng):
    config = _config()
    model, tx, state, batch = _setup(config, rng)
    step = make_pacing_train_step(config, model, tx, steps_per_epoch=4, donate=False)
    key = jax.random.PRNGKey(42)

    state1, m1 = step(state, batch, key)
    for k in ["loss_pce", "loss_ent", "loss_cr", "loss_aux_cls", "loss_memory",
              "loss_total", "lr"]:
        assert k in m1, k
        assert np.isfinite(float(m1[k])), k
    assert int(state1.step) == 1
    # memory bank was cold-started from the batch
    assert np.abs(np.asarray(state1.memory_bank)).sum() > 0

    # Overfit the same batch: pce after 15 steps must drop substantially.
    st = state1
    for _ in range(15):
        st, m = step(st, batch, key)
    assert float(m["loss_pce"]) < float(m1["loss_pce"]) * 0.9


def test_ramp_weights_grow_with_epoch(rng):
    config = _config(epoch=100)
    model, tx, state, batch = _setup(config, rng)
    step = make_pacing_train_step(config, model, tx, steps_per_epoch=1, donate=False)
    key = jax.random.PRNGKey(0)
    # epoch == state.step when steps_per_epoch=1; ramp weight at epoch 0 is
    # exp(-8) ~ 3e-4, so loss_ent starts tiny and grows.
    _, m0 = step(state, batch, key)
    st = state
    for _ in range(30):
        st, m30 = step(st, batch, key)
    # The ramp at epoch 30 is e^{-8(1-30/80)} / e^{-8} = e^3 times larger;
    # even with training progress the weighted loss_ent should exceed epoch-0's.
    assert float(m30["loss_ent"]) > float(m0["loss_ent"])


def test_loss_cr_variants_all_compile(rng):
    for variant in ["ce_loss", "l1_loss", "l2_loss", "kl_loss"]:
        config = _config(loss_cr_variants=variant, do_aux_path=False, do_memory=False)
        model, tx, state, batch = _setup(config, rng)
        step = make_pacing_train_step(config, model, tx, steps_per_epoch=4, donate=False)
        _, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss_cr"])), variant


def test_memory_update_modes(rng):
    for mode in ["all", "first"]:
        config = _config(memory_update_mode=mode)
        model, tx, state, batch = _setup(config, rng)
        step = make_pacing_train_step(config, model, tx, steps_per_epoch=4, donate=False)
        st, _ = step(state, batch, jax.random.PRNGKey(0))
        assert np.abs(np.asarray(st.memory_bank)).sum() > 0


def test_frozen_bn_quirk_variant(rng):
    config = _config(ref_quirk_bn_eval_after_first_epoch=True)
    model, tx, state, batch = _setup(config, rng)
    step_frozen = make_pacing_train_step(
        config, model, tx, steps_per_epoch=4, module_train=False, donate=False)
    st, m = step_frozen(state, batch, jax.random.PRNGKey(0))
    # batch_stats must NOT change in frozen mode
    for a, b in zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(st.batch_stats)):
        assert np.allclose(a, b)
    # params must still train
    diff = sum(float(np.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(state.params), jax.tree.leaves(st.params)))
    assert diff > 0


def test_pacing_eval_step(rng):
    config = _config()
    model, tx, state, batch = _setup(config, rng)
    eval_step = make_pacing_eval_step(config, model)
    loss_pce, dice, logits = eval_step(state, batch)
    assert np.isfinite(float(loss_pce))
    assert dice.shape == (2, C)
    assert logits.shape == (2, H, W, C)


def test_upper_bound_step_and_eval(rng):
    config = _config(session="Upperbound", do_loss_ent=False,
                     do_decoder_consistency=False, do_aux_path=False,
                     do_memory=False)
    model = _model(config)
    batch = _batch(rng)
    tx = make_optimizer(config, steps_per_epoch=4)
    state = create_train_state(jax.random.PRNGKey(0), model, tx, batch,
                               with_memory=False, siamese=False)
    step = make_upper_bound_train_step(config, model, tx, steps_per_epoch=4, donate=False)
    st, m = step(state, batch, jax.random.PRNGKey(1))
    assert {"loss_ce", "loss_dice", "loss_total", "lr"} <= set(m)
    assert np.isfinite(float(m["loss_total"]))

    for _ in range(15):
        st, m2 = step(st, batch, jax.random.PRNGKey(1))
    assert float(m2["loss_ce"]) < float(m["loss_ce"])

    eval_step = make_upper_bound_eval_step(config, model)
    loss_ce, loss_dice, dice, logits = eval_step(st, batch)
    assert dice.shape == (2, C)


def test_lr_decays_per_epoch(rng):
    config = _config(epoch=10, lr=1e-3, lr_decay="poly")
    model, tx, state, batch = _setup(config, rng)
    step = make_pacing_train_step(config, model, tx, steps_per_epoch=2, donate=False)
    lrs = []
    st = state
    for i in range(6):
        st, m = step(st, batch, jax.random.PRNGKey(0))
        lrs.append(float(m["lr"]))
    # epochs: steps 0,1 -> epoch 0; 2,3 -> 1; 4,5 -> 2
    assert lrs[0] == lrs[1] == pytest.approx(1e-3)
    assert lrs[2] == lrs[3] == pytest.approx(1e-3 * (1 - 1 / 10) ** 0.9)
    assert lrs[4] < lrs[2] < lrs[0]
