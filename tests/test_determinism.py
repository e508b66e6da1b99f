"""Determinism: same seed => identical training trajectory.

The reference only approximates determinism (seeds + cudnn.benchmark=False,
with a worker-RNG duplication quirk — SURVEY.md §5); explicit PRNG-key
threading makes it exact here.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pacingpseudo_tpu.aug.engine import make_train_augment_fn
from pacingpseudo_tpu.aug.params import BaseAugParams, StrongAugParams
from pacingpseudo_tpu.config import ExperimentConfig
from pacingpseudo_tpu.models import PacingPseudoModel
from pacingpseudo_tpu.train.optim import make_optimizer
from pacingpseudo_tpu.train.state import create_train_state
from pacingpseudo_tpu.train.step import make_pacing_train_step

C, S, H = 3, 40, 32


def _run_steps(seed):
    config = ExperimentConfig(
        num_classes=C, ignored_index=C, session="Experiment",
        do_loss_ent=True, do_decoder_consistency=True, do_aux_path=False,
        do_memory=False, batch_size=2, epoch=10, compute_dtype="float32",
        seed=seed,
    ).validate()
    model = PacingPseudoModel(num_classes=C, init_ch=8, output_stride=8,
                              do_aux_path=False, dtype=jnp.float32)
    bp = BaseAugParams(crop_size=(H, H), num_classes=C, ignored_index=C,
                       elastic_field_downscale=4, elastic_blur_radius=3)
    aug = make_train_augment_fn(bp, StrongAugParams.color(1.0), True)
    r = np.random.RandomState(0)  # data fixed; only config.seed varies keys
    raw = {
        "image": jnp.asarray(r.randn(2, S, S), jnp.float32),
        "label": jnp.asarray(r.randint(0, C, (2, S, S)), jnp.float32),
        "scribble": jnp.asarray(r.randint(0, C + 1, (2, S, S)), jnp.float32),
        "size": jnp.asarray([[H, H], [H, H]], jnp.int32),
    }
    tx = make_optimizer(config, 4)
    state = create_train_state(jax.random.PRNGKey(config.seed), model, tx,
                               {"image": jnp.zeros((2, H, H, 1), jnp.float32)},
                               with_memory=False)
    step = make_pacing_train_step(config, model, tx, 4, augment_fn=aug,
                                  donate=False)
    key = jax.random.PRNGKey(config.seed + 1)
    losses = []
    for _ in range(3):
        state, m = step(state, raw, key)
        losses.append(float(m["loss_total"]))
    return losses


def test_same_seed_same_trajectory():
    a = _run_steps(7)
    b = _run_steps(7)
    assert a == b  # bit-identical


def test_different_seed_differs():
    a = _run_steps(7)
    c = _run_steps(8)
    assert a != c
