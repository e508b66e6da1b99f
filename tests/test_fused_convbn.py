"""Parity tests for the fused Pallas ConvLayer (ops/pallas/fused_convbn).

Semantics contract: Conv2d -> BatchNorm(train) -> LeakyReLU exactly as the
reference ConvLayer (/root/reference/models/unet.py:178-193), on the
padded-canvas convention.  Kernels run in interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pacingpseudo_tpu.ops.pallas import fused_convbn
from pacingpseudo_tpu.ops.pallas.fused_convbn import (
    conv_bn_lrelu_reference, conv_bn_lrelu_train, fusable)

EPS, SLOPE = 1e-5, 1e-2


def _mk(seed, n, h, w, ci, co, c_log):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, ci).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.randn(co).astype(np.float32)) * 0.1
    sc = jnp.asarray(rng.rand(c_log).astype(np.float32) + 0.5)
    be = jnp.asarray(rng.randn(c_log).astype(np.float32) * 0.1)
    return xp, k, b, sc, be


@pytest.mark.parametrize("groups", [1, 4])
def test_forward_matches_reference(groups):
    co = 12 if groups == 1 else 16
    xp, k, b, sc, be = _mk(0, 2, 32, 24, 8, co, co // groups)
    zf, mf, vf = conv_bn_lrelu_train(xp, k, b, sc, be, EPS, groups, SLOPE)
    zr, mr, vr = conv_bn_lrelu_reference(xp, k, b, sc, be, EPS, groups, SLOPE)
    np.testing.assert_allclose(zf, zr, atol=1e-5)
    np.testing.assert_allclose(mf, mr, atol=1e-6)
    np.testing.assert_allclose(vf, vr, atol=1e-5)
    # padded border is zero
    assert float(jnp.abs(zf[:, 0]).max()) == 0.0
    assert float(jnp.abs(zf[:, :, -1]).max()) == 0.0


@pytest.mark.parametrize("groups", [1, 4])
def test_gradients_match_reference(groups):
    co = 12 if groups == 1 else 16
    xp, k, b, sc, be = _mk(1, 2, 32, 16, 8, co, co // groups)

    def loss(fn, xp, k, b, sc, be):
        zp, _, _ = fn(xp, k, b, sc, be, EPS, groups, SLOPE)
        return jnp.sum(zp * jnp.cos(0.1 * jnp.arange(zp.size
                                                     ).reshape(zp.shape)))

    gf = jax.grad(lambda *a: loss(conv_bn_lrelu_train, *a),
                  argnums=(0, 1, 2, 3, 4))(xp, k, b, sc, be)
    gr = jax.grad(lambda *a: loss(conv_bn_lrelu_reference, *a),
                  argnums=(0, 1, 2, 3, 4))(xp, k, b, sc, be)
    names = ("dx", "dkernel", "dbias", "dscale", "dbeta")
    overall = float(jnp.abs(gr[4]).max())
    for name, a, r in zip(names, gf, gr):
        scale = float(jnp.abs(r).max()) + 1e-6
        if name == "dbias" and groups == 1:
            # BN's mean subtraction makes a per-physical-channel bias a
            # no-op at groups=1: the true gradient is zero and both
            # implementations return roundoff noise around it.
            assert float(jnp.abs(a).max()) < 1e-3 * overall
            assert float(jnp.abs(r).max()) < 1e-3 * overall
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4 * scale, err_msg=name)


def test_bf16_close_to_f32_reference():
    xp, k, b, sc, be = _mk(2, 2, 32, 16, 8, 12, 12)
    zf, mf, vf = conv_bn_lrelu_train(xp.astype(jnp.bfloat16), k, b, sc, be,
                                     EPS, 1, SLOPE)
    zr, mr, vr = conv_bn_lrelu_train(xp, k, b, sc, be, EPS, 1, SLOPE)
    assert zf.dtype == jnp.bfloat16
    rel = float(jnp.abs(zf.astype(jnp.float32) - zr).max()
                / jnp.abs(zr).max())
    assert rel < 0.03
    np.testing.assert_allclose(mf, mr, atol=0.02)


def test_fusable_gate():
    assert fusable(128, 128, 3, 1, 1)
    assert fusable(32, 64, 3, 1, 1)
    assert not fusable(48, 64, 3, 1, 1)   # height half not tile-aligned
    assert not fusable(128, 128, 3, 2, 1)  # stride
    assert not fusable(128, 128, 3, 1, 2)  # dilation
    assert not fusable(128, 128, 1, 1, 1)  # 1x1


@pytest.mark.parametrize("cls_tag", ["plain", "s2d"])
def test_convlayer_fused_matches_unfused(cls_tag):
    from pacingpseudo_tpu.models.unet import ConvLayer, S2DConvLayer
    from pacingpseudo_tpu.ops.s2d import space_to_depth

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 64, 8).astype(np.float32))
    if cls_tag == "s2d":
        x = space_to_depth(x)
        model = S2DConvLayer(features=12)
    else:
        model = ConvLayer(features=12)

    prev = fused_convbn.get_conv_impl()
    try:
        fused_convbn.set_conv_impl("xla")
        v = model.init(jax.random.PRNGKey(0), x, True)
        fused_convbn.set_conv_impl("fused")
        v_f = model.init(jax.random.PRNGKey(0), x, True)
        # identical parameter tree and init draws across implementations
        assert jax.tree_util.tree_structure(v) == \
            jax.tree_util.tree_structure(v_f)
        assert all(jnp.array_equal(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v_f)))

        def run(impl):
            fused_convbn.set_conv_impl(impl)

            def loss(variables):
                out, st = model.apply(variables, x, True,
                                      mutable=["batch_stats"])
                return jnp.sum(out ** 2), (out, st)

            return jax.value_and_grad(loss, has_aux=True)(v)

        (_, (o_x, s_x)), g_x = run("xla")
        (_, (o_f, s_f)), g_f = run("fused")
        np.testing.assert_allclose(o_f, o_x, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(s_x),
                        jax.tree_util.tree_leaves(s_f)):
            np.testing.assert_allclose(a, b, atol=1e-5)
        overall = max(float(jnp.abs(le).max())
                      for le in jax.tree_util.tree_leaves(g_x["params"]))
        for (p, a), (_, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(g_x["params"]),
                       key=lambda t: str(t[0])),
                sorted(jax.tree_util.tree_leaves_with_path(g_f["params"]),
                       key=lambda t: str(t[0]))):
            if "conv" in str(p) and "bias" in str(p):
                # true gradient is zero (BN absorbs the bias); both sides
                # return roundoff noise around it
                assert float(jnp.abs(a).max()) < 1e-3 * overall
                assert float(jnp.abs(b).max()) < 1e-3 * overall
                continue
            scale = float(jnp.abs(a).max()) + 1e-6
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4 * scale,
                err_msg=jax.tree_util.keystr(p))
    finally:
        fused_convbn.set_conv_impl(prev)


def test_doubleconv_chain_matches_unfused():
    """DoubleConv hands the padded canvas between its two fused layers
    (padded_out -> padded_in); equality vs the unfused composition covers
    that chaining plus the stride/dilation gates."""
    from pacingpseudo_tpu.models.unet import DoubleConv

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 32, 32, 4).astype(np.float32))
    prev = fused_convbn.get_conv_impl()
    try:
        for stride1, dilation in [(1, 1), (2, 1), (1, 2)]:
            model = DoubleConv(features=8, stride1=stride1,
                               dilation=dilation)
            fused_convbn.set_conv_impl("xla")
            v = model.init(jax.random.PRNGKey(0), x, True)

            def run(impl):
                fused_convbn.set_conv_impl(impl)

                def loss(variables):
                    out, st = model.apply(variables, x, True,
                                          mutable=["batch_stats"])
                    return jnp.sum(out ** 2), (out, st)

                return jax.value_and_grad(loss, has_aux=True)(v)

            (_, (o_x, s_x)), g_x = run("xla")
            (_, (o_f, s_f)), g_f = run("fused")
            np.testing.assert_allclose(o_f, o_x, atol=2e-4,
                                       err_msg=f"s{stride1}d{dilation}")
            for a, b in zip(jax.tree_util.tree_leaves(s_x),
                            jax.tree_util.tree_leaves(s_f)):
                np.testing.assert_allclose(a, b, atol=1e-5)
            overall = max(float(jnp.abs(le).max())
                          for le in jax.tree_util.tree_leaves(g_x["params"]))
            for (p, a), (_, b) in zip(
                    sorted(jax.tree_util.tree_leaves_with_path(
                        g_x["params"]), key=lambda t: str(t[0])),
                    sorted(jax.tree_util.tree_leaves_with_path(
                        g_f["params"]), key=lambda t: str(t[0]))):
                if jax.tree_util.keystr(p).endswith("['conv']['bias']"):
                    assert float(jnp.abs(b).max()) < 2e-3 * overall
                    continue
                scale = float(jnp.abs(a).max()) + 1e-6
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=5e-4 * scale,
                    err_msg=f"s{stride1}d{dilation} "
                            + jax.tree_util.keystr(p))
    finally:
        fused_convbn.set_conv_impl(prev)


def test_eval_mode_ignores_fused_impl():
    from pacingpseudo_tpu.models.unet import ConvLayer

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 32, 4).astype(np.float32))
    model = ConvLayer(features=8)
    prev = fused_convbn.get_conv_impl()
    try:
        fused_convbn.set_conv_impl("xla")
        v = model.init(jax.random.PRNGKey(0), x, True)
        o_x = model.apply(v, x, False)
        fused_convbn.set_conv_impl("fused")
        o_f = model.apply(v, x, False)
        np.testing.assert_array_equal(np.asarray(o_x), np.asarray(o_f))
    finally:
        fused_convbn.set_conv_impl(prev)
