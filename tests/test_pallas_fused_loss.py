"""Pallas fused-loss kernel: value + gradient parity vs the loss library.

Runs in interpreter mode on CPU (the same kernel compiles natively on TPU;
bench-side validation happens in tools/bench_kernels.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pacingpseudo_tpu.ops.pallas import fused_losses_reference, fused_pacing_losses

N, H, W, C = 2, 16, 128, 5
IGN = 5


def _data(rng):
    lw = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    ls = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    tgt = jnp.asarray(rng.randint(0, C + 1, (N, H, W)), jnp.int32)
    mask = jnp.asarray((rng.rand(N, H, W) > 0.3), jnp.float32)
    return lw, ls, tgt, mask


def test_forward_matches_reference(rng):
    lw, ls, tgt, mask = _data(rng)
    got = fused_pacing_losses(lw, ls, tgt, mask, IGN, True)
    want = fused_losses_reference(lw, ls, tgt, mask, IGN)
    for g, w_ in zip(got, want):
        assert np.allclose(float(g), float(w_), rtol=1e-5, atol=1e-6)


def test_gradients_match_autodiff(rng):
    lw, ls, tgt, mask = _data(rng)
    weights = (1.0, 0.37, 2.1)  # arbitrary per-loss weights (ramp values)

    def total_fused(lw, ls):
        a, b, c = fused_pacing_losses(lw, ls, tgt, mask, IGN, True)
        return weights[0] * a + weights[1] * b + weights[2] * c

    def total_ref(lw, ls):
        a, b, c = fused_losses_reference(lw, ls, tgt, mask, IGN)
        return weights[0] * a + weights[1] * b + weights[2] * c

    g_fused = jax.grad(total_fused, argnums=(0, 1))(lw, ls)
    g_ref = jax.grad(total_ref, argnums=(0, 1))(lw, ls)
    for gf, gr in zip(g_fused, g_ref):
        assert np.allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6)


def test_all_ignored_and_empty_mask(rng):
    lw, ls, _, _ = _data(rng)
    tgt = jnp.full((N, H, W), IGN, jnp.int32)
    mask = jnp.zeros((N, H, W), jnp.float32)
    pce, ent, sce = fused_pacing_losses(lw, ls, tgt, mask, IGN, True)
    assert float(pce) == 0.0 and float(ent) == 0.0 and float(sce) == 0.0
    g = jax.grad(lambda a: sum(fused_pacing_losses(a, ls, tgt, mask, IGN, True)))(lw)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("c", [2, 4])
def test_other_class_counts(rng, c):
    lw = jnp.asarray(rng.randn(1, 8, 128, c), jnp.float32)
    ls = jnp.asarray(rng.randn(1, 8, 128, c), jnp.float32)
    tgt = jnp.asarray(rng.randint(0, c + 1, (1, 8, 128)), jnp.int32)
    mask = jnp.ones((1, 8, 128), jnp.float32)
    got = fused_pacing_losses(lw, ls, tgt, mask, c, True)
    want = fused_losses_reference(lw, ls, tgt, mask, c)
    for g, w_ in zip(got, want):
        assert np.allclose(float(g), float(w_), rtol=1e-5, atol=1e-6)
