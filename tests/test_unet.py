"""UNet shape/structure tests (reference: models/unet.py).

Verifies per-stage spatial sizes for every output_stride, end-point naming,
the upsample parity helper, and parameter-count sanity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pacingpseudo_tpu.models import UNet
from pacingpseudo_tpu.ops import bilinear_resize_align_corners


def _init_and_run(os_, h=64, w=64, elab=True, **kw):
    model = UNet(num_classes=4, output_stride=os_, elab_end_points=elab, **kw)
    x = jnp.zeros((1, h, w, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    return model, variables, out


@pytest.mark.parametrize("os_,stage56_stride", [(32, (16, 32)), (16, (16, 16)), (8, (8, 8))])
def test_endpoint_shapes(os_, stage56_stride):
    h = w = 64
    _, _, out = _init_and_run(os_, h, w)
    # encoder stage k (1..4) is at stride 2^(k-1)
    for k, s in zip(range(1, 5), [1, 2, 4, 8]):
        assert out[f"encoder/stage{k}"].shape[1:3] == (h // s, w // s)
    s5, s6 = stage56_stride
    assert out["encoder/stage5"].shape[1:3] == (h // s5, w // s5)
    assert out["encoder/stage6"].shape[1:3] == (h // s6, w // s6)
    # logits always at full resolution
    assert out["segmentation/logits"].shape == (1, h, w, 4)
    # channels: 32,64,128,256,512,512 at defaults (unet.py:27-31)
    for k, c in zip(range(1, 7), [32, 64, 128, 256, 512, 512]):
        assert out[f"encoder/stage{k}"].shape[-1] == c


def test_endpoint_names_without_elab():
    _, _, out = _init_and_run(8, 32, 32, elab=False)
    assert set(out.keys()) == {"segmentation/logits"}


def test_endpoint_names_with_elab():
    _, _, out = _init_and_run(8, 32, 32, elab=True)
    expect = {f"encoder/stage{k}" for k in range(1, 7)}
    expect |= {f"decoder/stage{k}" for k in range(1, 6)}
    expect |= {"segmentation/logits"}
    assert set(out.keys()) == expect


def test_param_count_matches_reference_exactly():
    """The torch reference UNet (input_ch=1, init_ch=32, max_ch=512,
    num_classes=4, any output_stride, upsample decoder) has exactly
    19,654,692 parameters (measured: sum(p.numel()) on reference
    models/unet.py).  Identical layer inventory => identical count."""
    model, variables, _ = _init_and_run(8, 32, 32)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert n_params == 19654692


def test_stride_conv_trans_conv_variant():
    _, _, out = _init_and_run(32, 64, 64, is_stride_conv=True, is_trans_conv=True)
    assert out["segmentation/logits"].shape == (1, 64, 64, 4)


def test_mismatched_variant_asserts():
    with pytest.raises(AssertionError):
        _init_and_run(32, 32, 32, is_stride_conv=True, is_trans_conv=False)


def test_bilinear_align_corners_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    ours = np.asarray(bilinear_resize_align_corners(jnp.asarray(x), 14, 18))
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    ref = torch.nn.functional.interpolate(tx, size=(14, 18), mode="bilinear", align_corners=True)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    assert np.allclose(ours, ref, atol=1e-5)


def test_upsample2x_matches_torch_upsample():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    ours = np.asarray(bilinear_resize_align_corners(jnp.asarray(x), 16, 16))
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    up = torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
    ref = np.moveaxis(up(tx).numpy(), 1, -1)
    assert np.allclose(ours, ref, atol=1e-5)


def test_batch_stats_updated_in_train_mode():
    model = UNet(num_classes=4, output_stride=32, elab_end_points=False)
    x = jnp.ones((2, 32, 32, 1), jnp.float32) * 3.0
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_s2d_hires_matches_plain_layout(rng):
    """The space-to-depth stage-1 execution (ops/s2d.py) is the SAME math:
    identical param trees (names, shapes, init draws) and equal outputs in
    both eval and train modes, including BN running-stat updates."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pacingpseudo_tpu.models.unet import UNet

    x = jnp.asarray(rng.randn(2, 64, 64, 1), jnp.float32)
    mp = UNet(num_classes=4, output_stride=8, elab_end_points=True,
              s2d_hires=False, dtype=jnp.float32)
    ms = UNet(num_classes=4, output_stride=8, elab_end_points=True,
              s2d_hires=True, dtype=jnp.float32)
    vp = mp.init(jax.random.PRNGKey(0), x, train=False)
    vs = ms.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(vp) == jax.tree.structure(vs)
    for a, b in zip(jax.tree.leaves(vp), jax.tree.leaves(vs)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    o1 = mp.apply(vp, x, train=False)
    o2 = ms.apply(vp, x, train=False)
    for k in o1:
        assert np.allclose(np.asarray(o1[k], np.float32),
                           np.asarray(o2[k], np.float32), atol=1e-4), k

    t1, s1 = mp.apply(vp, x, train=True, mutable=["batch_stats"])
    t2, s2 = ms.apply(vp, x, train=True, mutable=["batch_stats"])
    assert np.allclose(np.asarray(t1["segmentation/logits"]),
                       np.asarray(t2["segmentation/logits"]), atol=5e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_s2d_pool_gradient_matches_plain_on_ties(rng):
    """The S2D channel-group pool must reproduce nn.max_pool's BACKWARD
    tie-breaking (all gradient to the first maximum in window scan order),
    not jnp.max's even split — ties are pervasive on constant background
    regions (code-review round-2 finding)."""
    import flax.linen as nn_
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pacingpseudo_tpu.ops.s2d import group_max_pool, space_to_depth

    # mixed input: a constant (fully tied) region plus random values
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    x[:, :4, :, :] = 1.0
    xj = jnp.asarray(x)

    g_plain = jax.grad(lambda z: jnp.sum(
        nn_.max_pool(z, (2, 2), (2, 2)) ** 2))(xj)
    g_s2d = jax.grad(lambda z: jnp.sum(
        group_max_pool(space_to_depth(z)) ** 2))(xj)
    assert np.array_equal(np.asarray(g_plain), np.asarray(g_s2d))


def test_s2d_model_gradients_match_plain(rng):
    """End-to-end gradient equality between the layouts.

    Uses tie-free random input: exact-tie pooling gradients are pinned by
    test_s2d_pool_gradient_matches_plain_on_ties above, and NEAR-ties
    (float-noise-level activation differences flipping the argmax) cause
    discrete routing flips under ANY float-order change — not a layout
    semantic."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pacingpseudo_tpu.models.unet import UNet

    xj = jnp.asarray(rng.randn(2, 64, 64, 1).astype(np.float32))
    mp = UNet(num_classes=4, output_stride=8, s2d_hires=False, dtype=jnp.float32)
    ms = UNet(num_classes=4, output_stride=8, s2d_hires=True, dtype=jnp.float32)
    v = mp.init(jax.random.PRNGKey(0), xj, train=False)

    def loss(model, params):
        out, _ = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                             xj, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out["segmentation/logits"]))

    g1 = jax.grad(lambda p: loss(mp, p))(v["params"])
    g2 = jax.grad(lambda p: loss(ms, p))(v["params"])

    def rel_diffs(ga, gb):
        out = {}
        flat_a = jax.tree_util.tree_flatten_with_path(ga)[0]
        flat_b = jax.tree.leaves(gb)
        for (path, a), b in zip(flat_a, flat_b):
            ps = jax.tree_util.keystr(path)
            if ps.endswith("['conv']['bias']"):
                continue  # analytically 0 pre-BN: pure cancellation noise
            out[ps] = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12))
        return out

    d_s2d = rel_diffs(g1, g2)
    # Calibrate against the model's inherent gradient chaos: BN-train-mode
    # backward amplifies float-order noise; a 1e-6 input perturbation of
    # the PLAIN model alone produces ~2% worst-case gradient wiggle.  The
    # layouts are equivalent if their difference is bounded by that floor.
    def loss_pert(p):
        out, _ = mp.apply({"params": p, "batch_stats": v["batch_stats"]},
                          xj + 1e-6, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out["segmentation/logits"]))

    d_chaos = rel_diffs(g1, jax.grad(loss_pert)(v["params"]))
    floor = max(d_chaos.values())
    worst = max(d_s2d, key=d_s2d.get)
    assert d_s2d[worst] < max(3 * floor, 1e-3), (worst, d_s2d[worst], floor)
