"""Layout-v2 equivalence (ops/s2d.py PACING_LAYOUT_IMPL).

v2 re-expresses three ops that the round-5 batch-12 chip trace charges
with ~13 ms/step of `data formatting` layout copies
(study_r5/chipq/prof_b12): the decoder's interleaving group_concat, the
stage-2/3 reduce_window max pool, and group_max_pool's argmax residual.
The contract is strict: identical param trees, bit-exact pool values and
tie routing, and model outputs/gradients equal up to the float-order
reordering of the dec_block1 input-channel permutation.
"""
import flax.linen as nn_
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pacingpseudo_tpu.ops import s2d


@pytest.fixture
def layout_guard():
    """Restore the process-default layout impl after each test."""
    before = s2d.get_layout_impl()
    yield
    s2d.set_layout_impl(before)


def test_group_max_pool_v2_bitexact_on_ties(rng, layout_guard):
    # integer-valued input => exact ties everywhere, the hard case for
    # first-max routing
    x = rng.randint(0, 3, (2, 8, 8, 4 * 6)).astype(np.float32)
    xj = jnp.asarray(x)
    assert np.array_equal(s2d._group_max_pool(xj), s2d._group_max_pool_v2(xj))
    g1 = jax.grad(lambda z: jnp.sum(s2d._group_max_pool(z) ** 2))(xj)
    g2 = jax.grad(lambda z: jnp.sum(s2d._group_max_pool_v2(z) ** 2))(xj)
    assert np.array_equal(np.asarray(g1), np.asarray(g2))


def test_max_pool2x2_firstmax_matches_reduce_window(rng, layout_guard):
    y = rng.randint(0, 2, (2, 16, 16, 5)).astype(np.float32)
    y[:, :4] = 1.0  # fully tied region
    yj = jnp.asarray(y)
    assert np.array_equal(nn_.max_pool(yj, (2, 2), (2, 2)),
                          s2d.max_pool2x2_firstmax(yj))
    ga = jax.grad(lambda z: jnp.sum(nn_.max_pool(z, (2, 2), (2, 2)) ** 2))(yj)
    gb = jax.grad(lambda z: jnp.sum(s2d.max_pool2x2_firstmax(z) ** 2))(yj)
    assert np.array_equal(np.asarray(ga), np.asarray(gb))


def test_block_input_perm_identity(rng, layout_guard):
    a2 = jnp.asarray(rng.randn(1, 4, 4, 4 * 6).astype(np.float32))
    b2 = jnp.asarray(rng.randn(1, 4, 4, 4 * 3).astype(np.float32))
    idx = s2d.s2d_block_input_perm(6, 3)
    assert sorted(idx.tolist()) == list(range(4 * 9))
    assert np.array_equal(np.asarray(s2d.group_concat(a2, b2))[..., idx],
                          np.asarray(s2d.group_concat_plain(a2, b2)))


def _unet_and_input(rng):
    from pacingpseudo_tpu.models.unet import UNet
    m = UNet(num_classes=4, output_stride=8, s2d_hires=True,
             dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 64, 64, 1).astype(np.float32))
    return m, x


def test_unet_layout_v2_matches_v1(rng, layout_guard):
    m, x = _unet_and_input(rng)
    s2d.set_layout_impl("v1")
    v1 = m.init(jax.random.PRNGKey(0), x, train=False)
    o1 = m.apply(v1, x, train=False)["segmentation/logits"]
    t1, s1 = m.apply(v1, x, train=True, mutable=["batch_stats"])

    s2d.set_layout_impl("v2")
    v2 = m.init(jax.random.PRNGKey(0), x, train=False)
    # identical param trees: names, shapes, init draws
    assert jax.tree.structure(v1) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    o2 = m.apply(v1, x, train=False)["segmentation/logits"]
    t2, s2_ = m.apply(v1, x, train=True, mutable=["batch_stats"])

    assert np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)
    assert np.allclose(np.asarray(t1["segmentation/logits"]),
                       np.asarray(t2["segmentation/logits"]), atol=5e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2_)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_layout_v2_gradients_match_v1(rng, layout_guard):
    """Gradient equality bounded by the model's inherent BN-backward chaos
    floor (same calibration as test_s2d_model_gradients_match_plain)."""
    m, x = _unet_and_input(rng)
    s2d.set_layout_impl("v1")
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, eps=0.0):
        out, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                         x + eps, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out["segmentation/logits"]))

    g1 = jax.grad(loss)(v["params"])
    g_chaos = jax.grad(lambda p: loss(p, eps=1e-6))(v["params"])
    s2d.set_layout_impl("v2")
    g2 = jax.grad(loss)(v["params"])

    def rel_diffs(ga, gb):
        out = {}
        for (path, a), b in zip(
                jax.tree_util.tree_flatten_with_path(ga)[0],
                jax.tree.leaves(gb)):
            ps = jax.tree_util.keystr(path)
            if ps.endswith("['conv']['bias']"):
                continue  # analytically 0 pre-BN: pure cancellation noise
            out[ps] = float(jnp.abs(a - b).max() /
                            (jnp.abs(a).max() + 1e-12))
        return out

    floor = max(rel_diffs(g1, g_chaos).values())
    d = rel_diffs(g1, g2)
    worst = max(d, key=d.get)
    assert d[worst] < max(3 * floor, 1e-3), (worst, d[worst], floor)


def test_layout_v2_data_sharded_forward(rng, layout_guard):
    """v2 must compile and agree under the 8-device data mesh (the
    reshape-view pool and block concat shard trivially over N)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    m, x = _unet_and_input(rng)
    x8 = jnp.asarray(rng.randn(8, 64, 64, 1).astype(np.float32))
    s2d.set_layout_impl("v2")
    v = m.init(jax.random.PRNGKey(0), x8, train=False)
    ref = m.apply(v, x8, train=False)["segmentation/logits"]

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    xs = jax.device_put(x8, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, z: m.apply(p, z, train=False)
                  ["segmentation/logits"])(v, xs)
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=1e-4)
