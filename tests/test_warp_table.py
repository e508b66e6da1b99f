"""Pallas warp-table construction (ops/pallas/warp_table.py) exactness.

The kernel must reproduce the XLA rolled-planes table bit for bit — the
downstream gather, cubic weights and class votes are unchanged, so table
equality implies full warp equality; we assert both, plus vmap (the
engine maps the warp over the batch).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pacingpseudo_tpu.ops.pallas.warp_table import (
    build_warp_table,
    build_warp_table_xla,
)
from pacingpseudo_tpu.ops.warp import fused_warp_sample_cubic


def _data(seed, h, w, classes=6):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(h, w), jnp.float32),
            jnp.asarray(rng.randint(0, classes, (h, w)), jnp.float32),
            jnp.asarray(rng.randint(0, classes, (h, w)), jnp.float32))


def test_table_exact_match():
    img, lab, scb = _data(0, 64, 96)
    ref = build_warp_table_xla(img, lab, scb)
    got = build_warp_table(img, lab, scb)  # interpret on CPU
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_full_warp_equality_and_vmap():
    n, h, w = 3, 48, 48
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(n, h, w), jnp.float32)
    labs = jnp.asarray(rng.randint(0, 6, (n, h, w)), jnp.float32)
    scbs = jnp.asarray(rng.randint(0, 6, (n, h, w)), jnp.float32)
    sy = jnp.asarray(rng.uniform(0, h - 1, (n, h, w)), jnp.float32)
    sx = jnp.asarray(rng.uniform(0, w - 1, (n, h, w)), jnp.float32)

    def warp(impl):
        return jax.vmap(
            lambda im, la, sc, y, x: fused_warp_sample_cubic(
                im, la, sc, y, x, 6, jnp.float32(h), jnp.float32(w),
                table_impl=impl)
        )(imgs, labs, scbs, sy, sx)

    i_x, l_x, s_x = warp("xla")
    i_p, l_p, s_p = warp("pallas")
    np.testing.assert_allclose(np.asarray(i_x), np.asarray(i_p),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(l_x), np.asarray(l_p))
    np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
