"""Matmul-moments BatchNorm (ops/fused_bn.py) parity vs flax nn.BatchNorm.

The custom VJP reformulates every BN reduction as an MXU matmul; these
tests pin exact semantic equivalence — forward values, gradients wrt
input/scale/bias, the EMA statistics, the S2D group extension, and the
bf16 compute path — against the plain flax implementation the model used
before (ConvLayer semantics, /root/reference/models/unet.py:178-193).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pacingpseudo_tpu.models.norm import MatmulBatchNorm
from pacingpseudo_tpu.ops.fused_bn import batch_norm_eval, batch_norm_train


class _FlaxRef(nn.Module):
    @nn.compact
    def __call__(self, x, use_running_average):
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="norm")(x)


def _rand(key, shape, dtype):
    return (jax.random.normal(key, shape) * 2.0 + 0.5).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_flax(dtype):
    x = _rand(jax.random.PRNGKey(0), (4, 16, 16, 24), dtype)
    ref = _FlaxRef()
    ours = MatmulBatchNorm()
    rv = ref.init(jax.random.PRNGKey(1), x, False)
    ov = ours.init(jax.random.PRNGKey(1), x, False)
    # same param shapes/names
    assert jax.tree.map(jnp.shape, rv["params"]["norm"]) == \
        jax.tree.map(jnp.shape, ov["params"])

    scale = jax.random.uniform(jax.random.PRNGKey(2), (24,), jnp.float32, 0.5, 2.0)
    bias = jax.random.normal(jax.random.PRNGKey(3), (24,))
    rv = {"params": {"norm": {"scale": scale, "bias": bias}},
          "batch_stats": rv["batch_stats"]}
    ov = {"params": {"scale": scale, "bias": bias},
          "batch_stats": ov["batch_stats"]}

    yr, rs = ref.apply(rv, x, False, mutable=["batch_stats"])
    yo, os_ = ours.apply(ov, x, False, mutable=["batch_stats"])
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(yr, np.float32),
                               np.asarray(yo, np.float32), atol=tol, rtol=tol)
    np.testing.assert_allclose(
        np.asarray(rs["batch_stats"]["norm"]["mean"]),
        np.asarray(os_["batch_stats"]["mean"]), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rs["batch_stats"]["norm"]["var"]),
        np.asarray(os_["batch_stats"]["var"]), atol=1e-5, rtol=1e-4)


def test_gradients_match_flax():
    x = _rand(jax.random.PRNGKey(0), (3, 8, 8, 20), jnp.float32)
    scale = jax.random.uniform(jax.random.PRNGKey(2), (20,), jnp.float32, 0.5, 2.0)
    bias = jax.random.normal(jax.random.PRNGKey(3), (20,))
    w = jax.random.normal(jax.random.PRNGKey(4), x.shape)

    def loss_ref(x, scale, bias):
        m = jnp.mean(x, axis=(0, 1, 2))
        v = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(m)
        y = (x - m) * jax.lax.rsqrt(v + 1e-5) * scale + bias
        return jnp.sum(y * w * jnp.abs(y))  # nonlinear: exercises xhat term

    def loss_ours(x, scale, bias):
        y, _, _ = batch_norm_train(x, scale, bias, 1e-5, 1)
        return jnp.sum(y * w * jnp.abs(y))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    go = jax.grad(loss_ours, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gr, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_group_statistics_match_reference_formula():
    """groups=4 == the S2D reshape(..., 4, c) formula (round-2 unet.py)."""
    c = 6
    x = _rand(jax.random.PRNGKey(5), (2, 8, 8, 4 * c), jnp.float32)
    scale = jax.random.uniform(jax.random.PRNGKey(6), (c,), jnp.float32, 0.5, 2.0)
    bias = jax.random.normal(jax.random.PRNGKey(7), (c,))

    y, m, v = batch_norm_train(x, scale, bias, 1e-5, 4)
    g = x.reshape(*x.shape[:-1], 4, c)
    m_ref = jnp.mean(g, axis=(0, 1, 2, 3))
    v_ref = jnp.mean(jnp.square(g), axis=(0, 1, 2, 3)) - jnp.square(m_ref)
    y_ref = ((x - jnp.tile(m_ref, 4)) * jax.lax.rsqrt(jnp.tile(v_ref, 4) + 1e-5)
             * jnp.tile(scale, 4) + jnp.tile(bias, 4))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)

    def loss_ours(x):
        y, _, _ = batch_norm_train(x, scale, bias, 1e-5, 4)
        return jnp.sum(jnp.square(y) * 0.5)

    def loss_ref(x):
        g = x.reshape(*x.shape[:-1], 4, c)
        m = jnp.mean(g, axis=(0, 1, 2, 3))
        v = jnp.mean(jnp.square(g), axis=(0, 1, 2, 3)) - jnp.square(m)
        y = ((x - jnp.tile(m, 4)) * jax.lax.rsqrt(jnp.tile(v, 4) + 1e-5)
             * jnp.tile(scale, 4) + jnp.tile(bias, 4))
        return jnp.sum(jnp.square(y) * 0.5)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_ours)(x)),
                               np.asarray(jax.grad(loss_ref)(x)),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("groups", [1, 4])
def test_reduce_impl_matches_matmul_impl(groups):
    """The A/B baseline (batch_norm_train_reduce, bench.py's
    PACING_BN_IMPL switch) is numerically the same op."""
    from pacingpseudo_tpu.ops.fused_bn import batch_norm_train_reduce
    c = 12
    x = _rand(jax.random.PRNGKey(11), (3, 8, 8, groups * c), jnp.float32)
    scale = jax.random.uniform(jax.random.PRNGKey(12), (c,), jnp.float32,
                               0.5, 2.0)
    bias = jax.random.normal(jax.random.PRNGKey(13), (c,))
    y1, m1, v1 = batch_norm_train(x, scale, bias, 1e-5, groups)
    y2, m2, v2 = batch_norm_train_reduce(x, scale, bias, 1e-5, groups)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               atol=1e-5, rtol=1e-4)

    def mk_loss(fn):
        def loss(x, scale, bias):
            y, _, _ = fn(x, scale, bias, 1e-5, groups)
            return jnp.sum(y * jnp.abs(y))
        return loss

    g1 = jax.grad(mk_loss(batch_norm_train), argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(mk_loss(batch_norm_train_reduce),
                  argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_bn_impl_switch_changes_trace_not_numerics():
    from pacingpseudo_tpu.models.norm import get_bn_impl, set_bn_impl
    x = _rand(jax.random.PRNGKey(14), (2, 8, 8, 8), jnp.float32)
    prev = get_bn_impl()
    try:
        outs = {}
        for impl in ("matmul", "reduce"):
            set_bn_impl(impl)
            m = MatmulBatchNorm()
            v = m.init(jax.random.PRNGKey(0), x, False)
            y, st = m.apply(v, x, False, mutable=["batch_stats"])
            outs[impl] = (np.asarray(y), np.asarray(st["batch_stats"]["mean"]))
        np.testing.assert_allclose(outs["matmul"][0], outs["reduce"][0],
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(outs["matmul"][1], outs["reduce"][1],
                                   atol=1e-5)
    finally:
        set_bn_impl(prev)


def test_eval_mode_uses_running_stats():
    x = _rand(jax.random.PRNGKey(8), (2, 4, 4, 10), jnp.float32)
    scale = jnp.ones((10,)) * 1.5
    bias = jnp.ones((10,)) * 0.25
    mean = jax.random.normal(jax.random.PRNGKey(9), (10,))
    var = jax.random.uniform(jax.random.PRNGKey(10), (10,), jnp.float32, 0.5, 2.0)
    y = batch_norm_eval(x, scale, bias, mean, var, 1e-5, 1)
    y_ref = (x - mean) * jax.lax.rsqrt(var + 1e-5) * 1.5 + 0.25
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_statistics_matmuls_request_highest_precision():
    """Round-5 on-chip parity gate caught the matmul statistics failing at
    f32 (max grad err 0.22): TPU lowers DEFAULT-precision f32 dot_generals
    as one bf16 pass, which the E[x^2]-m^2 cancellation amplifies.  The
    numeric failure only reproduces on real hardware, so pin the fix at
    the jaxpr level: every statistics product must request
    Precision.HIGHEST (fwd sums and bwd dot-sums)."""
    x = jnp.zeros((2, 4, 4, 8), jnp.float32)
    sc = jnp.ones((8,), jnp.float32)
    be = jnp.zeros((8,), jnp.float32)

    def fwd_bwd(x, sc, be):
        def loss(x, sc, be):
            y, m, v = batch_norm_train(x, sc, be, 1e-5, 1)
            return jnp.sum(y)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(x, sc, be)

    found = []

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                found.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)

    walk(jax.make_jaxpr(fwd_bwd)(x, sc, be).jaxpr)
    assert len(found) >= 4, f"expected fwd+bwd statistics dots, saw {found}"
    assert all(p == (jax.lax.Precision.HIGHEST,) * 2 for p in found), found
