"""Chunked multi-step dispatch: K scanned steps == K single steps."""
import jax
import jax.numpy as jnp
import numpy as np

from pacingpseudo_tpu.config import ExperimentConfig
from pacingpseudo_tpu.models import PacingPseudoModel
from pacingpseudo_tpu.train.optim import make_optimizer
from pacingpseudo_tpu.train.state import create_train_state
from pacingpseudo_tpu.train.step import (
    make_chunked_train_step,
    make_pacing_train_step,
)

C, H, W, N, K = 3, 32, 32, 2, 3


def test_chunked_equals_sequential(rng):
    config = ExperimentConfig(
        num_classes=C, ignored_index=C, session="Experiment",
        do_loss_ent=True, do_decoder_consistency=True, do_aux_path=True,
        do_memory=True, batch_size=N, epoch=10, compute_dtype="float32",
    ).validate()
    model = PacingPseudoModel(num_classes=C, init_ch=8, output_stride=8,
                              do_aux_path=True, dtype=jnp.float32)
    tx = make_optimizer(config, steps_per_epoch=4)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tx,
        {"image": jnp.zeros((N, H, W, 1), jnp.float32)},
        with_memory=True, num_classes=C)

    def mk_batch(i):
        r = np.random.RandomState(i)
        return {
            "image": np.asarray(r.randn(N, H, W, 1), np.float32),
            "image_strong": np.asarray(r.randn(N, H, W, 1), np.float32),
            "scribble": np.eye(C + 1, dtype=np.float32)[
                r.randint(0, C + 1, (N, H, W))],
            "valid_mask": np.ones((N, H, W, 1), np.float32),
        }

    batches = [mk_batch(i) for i in range(K)]
    key = jax.random.PRNGKey(9)

    body = make_pacing_train_step(config, model, tx, steps_per_epoch=4,
                                  jit=False)
    # sequential reference: fold_in(key, i) per step like the chunked scan
    st_seq = state
    seq_metrics = []
    for i, b in enumerate(batches):
        st_seq, m = jax.jit(body)(st_seq, {k: jnp.asarray(v) for k, v in b.items()},
                                  jax.random.fold_in(key, i))
        seq_metrics.append(m)

    chunked = make_chunked_train_step(body, K)
    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
               for k in batches[0]}
    st_chk, summed = chunked(state, stacked, key)

    # summed metrics equal the sum of sequential metrics
    for k in summed:
        expect = sum(float(m[k]) for m in seq_metrics)
        assert np.allclose(float(summed[k]), expect, rtol=1e-4, atol=1e-5), k
    # Params: scan-vs-sequential compilation reorders float ops, and Adam's
    # early steps are ~lr*sign(grad) — a last-bit gradient wiggle on a
    # near-zero-gradient element flips its whole lr-sized update.  Identical
    # losses above prove the math; params agree to within K Adam steps.
    lr = 1e-4
    for a, b in zip(jax.tree.leaves(st_seq.params), jax.tree.leaves(st_chk.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2 * K * lr)
    assert int(st_chk.step) == K
