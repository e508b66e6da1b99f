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


def test_bf16_table_vote_bitexact_image_bounded():
    """warp_table_dtype='bf16' (aug/params.py): label/scribble class votes
    must be BIT-EXACT vs the f32 table (small-int class ids are exact in
    bf16 and the vote weights are f32 from coordinates); image taps round
    to bf16 before the f32 cubic accumulation, so the image differs by at
    most the bf16 rounding of the tap values (rel ~2^-8) times the
    renormalised kernel mass."""
    n, h, w = 3, 48, 48
    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randn(n, h, w), jnp.float32)
    labs = jnp.asarray(rng.randint(0, 6, (n, h, w)), jnp.float32)
    scbs = jnp.asarray(rng.randint(0, 6, (n, h, w)), jnp.float32)
    sy = jnp.asarray(rng.uniform(0, h - 1, (n, h, w)), jnp.float32)
    sx = jnp.asarray(rng.uniform(0, w - 1, (n, h, w)), jnp.float32)

    def warp(tdt):
        return jax.vmap(
            lambda im, la, sc, y, x: fused_warp_sample_cubic(
                im, la, sc, y, x, 6, jnp.float32(h), jnp.float32(w),
                table_dtype=tdt)
        )(imgs, labs, scbs, sy, sx)

    i32, l32, s32 = warp("f32")
    i16, l16, s16 = warp("bf16")
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))
    np.testing.assert_array_equal(np.asarray(s32), np.asarray(s16))
    # |bf16(v) - v| <= 2^-8 |v|; the cubic kernel's renormalised weights
    # sum to 1 with |w| mass <= ~1.6 (negative lobes), so bound generously.
    scale = float(np.abs(np.asarray(imgs)).max())
    assert float(np.abs(np.asarray(i32) - np.asarray(i16)).max()) \
        <= 2.0 ** -8 * scale * 2.0

    # the ignored-index sentinel (255) must also be exact in bf16
    assert float(jnp.bfloat16(255.0)) == 255.0
