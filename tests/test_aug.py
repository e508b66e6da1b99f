"""On-device augmentation engine tests (reference: datasets/augmentations.py).

Strategy (SURVEY.md §4): exact fixed-seed checks for the exactly-portable
transforms (flip, crop embedding, normalisation, identity), cross-checks
against cv2/scipy for rotation and scaling, and property tests
(determinism, shapes, ignore padding, valid-mask invariants) for the rest.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from pacingpseudo_tpu.aug import (
    BaseAugParams,
    StrongAugParams,
    augment_batch,
    eval_preprocess_batch,
)
from pacingpseudo_tpu.aug.engine import base_augment_sample, strong_augment_sample
from pacingpseudo_tpu.aug.presets import base_params_for, strong_params_for

S = 48          # source canvas
CH = CW = 32    # crop
C = 3
IGN = 3


def _params(**kw):
    base = dict(crop_size=(CH, CW), num_classes=C, ignored_index=IGN,
                p_scale=0.0, p_elastic=0.0, p_rotate=0.0,
                p_mirror_y=0.0, p_mirror_x=0.0, p_noise=0.0,
                elastic_blur_radius=8)
    base.update(kw)
    return BaseAugParams(**base)


def _sample(rng, h=CH, w=CW):
    img = np.zeros((S, S), np.float32)
    lab = np.full((S, S), IGN, np.float32)
    scb = np.full((S, S), IGN, np.float32)
    img[:h, :w] = rng.randn(h, w)
    lab[:h, :w] = rng.randint(0, C, (h, w))
    scb[:h, :w] = rng.randint(0, C + 1, (h, w))
    size = np.array([h, w], np.int32)
    return (jnp.asarray(img), jnp.asarray(lab), jnp.asarray(scb), jnp.asarray(size))


def _norm(x):
    return (x - x.mean()) / (x.std() + 1e-8)


def test_identity_when_all_probs_zero(rng):
    img, lab, scb, size = _sample(rng)
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(0), _params())
    # double MeanStdNorm == single (normalising a normalised image)
    expect = _norm(np.asarray(img)[:CH, :CW])
    assert np.allclose(np.asarray(out["image"]), expect, atol=1e-4)
    assert np.array_equal(np.asarray(out["label"]), np.asarray(lab)[:CH, :CW])
    assert np.array_equal(np.asarray(out["scribble"]), np.asarray(scb)[:CH, :CW])
    assert np.all(np.asarray(out["valid_mask"]) == 1.0)


def test_determinism(rng):
    img, lab, scb, size = _sample(rng)
    p = _params(p_scale=0.5, p_elastic=0.5, p_rotate=0.5, p_mirror_y=0.5,
                p_mirror_x=0.5, p_noise=0.5)
    k = jax.random.PRNGKey(3)
    a = base_augment_sample(img, lab, scb, size, k, p)
    b = base_augment_sample(img, lab, scb, size, k, p)
    for key in a:
        assert np.array_equal(np.asarray(a[key]), np.asarray(b[key])), key


def test_small_source_embeds_with_ignore_padding(rng):
    h = w = 20  # smaller than crop -> random embed, padding around
    img, lab, scb, size = _sample(rng, h, w)
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(1), _params())
    vm = np.asarray(out["valid_mask"])
    assert vm.sum() == h * w
    outside = vm == 0
    assert np.all(np.asarray(out["label"])[outside] == IGN)
    assert np.all(np.asarray(out["scribble"])[outside] == IGN)
    assert np.allclose(np.asarray(out["image"])[outside], 0.0)


def test_large_source_crops_window(rng):
    h = w = 44  # larger than crop -> random crop, fully valid
    img, lab, scb, size = _sample(rng, h, w)
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(2), _params())
    assert np.all(np.asarray(out["valid_mask"]) == 1.0)
    # the cropped labels must be a contiguous window of the source
    lab_np = np.asarray(lab)
    got = np.asarray(out["label"])
    found = any(
        np.array_equal(got, lab_np[dy:dy + CH, dx:dx + CW])
        for dy in range(h - CH + 1) for dx in range(w - CW + 1))
    assert found


def test_mirror_both_axes(rng):
    img, lab, scb, size = _sample(rng)
    p = _params(p_mirror_y=1.0, p_mirror_x=1.0)
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(0), p)
    expect = _norm(np.asarray(img)[:CH, :CW])[::-1, ::-1]
    assert np.allclose(np.asarray(out["image"]), expect, atol=1e-4)
    assert np.array_equal(np.asarray(out["label"]),
                          np.asarray(lab)[:CH, :CW][::-1, ::-1])


def test_rotation_matches_cv2(rng):
    """Pure rotation vs cv2.warpAffine (the reference's implementation,
    augmentations.py:299-317), bilinear vs bilinear, away from borders."""
    img, lab, scb, size = _sample(rng)
    deg = 23.0
    p = _params(p_rotate=1.0, degree_range=(deg, deg), image_interp="bilinear")
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(0), p)

    src = _norm(np.asarray(img)[:CH, :CW])
    m = cv2.getRotationMatrix2D((CW / 2, CH / 2), deg, 1.0)
    ref = cv2.warpAffine(src, m, (CW, CH), flags=cv2.INTER_LINEAR, borderValue=0.0)
    got = np.asarray(out["image"])
    # compare the central region (borders differ: cv2 blends border value,
    # we hard-clip), allowing interpolation tolerance
    sl = slice(8, -8)
    # re-normalise both (our pipeline applies MeanStdNorm after rotation)
    assert np.allclose(_norm(got[sl, sl]), _norm(ref[sl, sl]), atol=0.15)
    # labels: nearest-vs-vote differ only at class boundaries
    lab_ref = cv2.warpAffine(np.asarray(lab)[:CH, :CW], m, (CW, CH),
                             flags=cv2.INTER_NEAREST, borderValue=IGN)
    mismatch = np.mean(np.asarray(out["label"])[sl, sl] != lab_ref[sl, sl])
    assert mismatch < 0.2


def test_cubic_rotation_matches_cv2_inter_cubic(rng):
    """Bicubic image tap (engine default, Catmull-Rom a=-0.5) vs
    cv2.INTER_CUBIC (Keys a=-0.75, augmentations.py:307): same family,
    close kernels — interior pixels agree to kernel-difference tolerance."""
    img, lab, scb, size = _sample(rng)
    deg = 23.0
    p = _params(p_rotate=1.0, degree_range=(deg, deg))
    assert p.image_interp == "bicubic"
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(0), p)

    src = _norm(np.asarray(img)[:CH, :CW])
    m = cv2.getRotationMatrix2D((CW / 2, CH / 2), deg, 1.0)
    ref = cv2.warpAffine(src, m, (CW, CH), flags=cv2.INTER_CUBIC, borderValue=0.0)
    got = np.asarray(out["image"])
    sl = slice(8, -8)
    # white-noise input maximises the a=-0.5 vs a=-0.75 kernel difference,
    # so compare by correlation; exact-kernel agreement is pinned by
    # test_cubic_op_exactly_matches_cv2_kernel below.
    r = np.corrcoef(_norm(got[sl, sl]).ravel(), _norm(ref[sl, sl]).ravel())[0, 1]
    assert r > 0.99, r


def test_cubic_op_exactly_matches_cv2_kernel(rng):
    """With cubic_a=-0.75 the op IS cv2.INTER_CUBIC: a pure rotation warp
    agrees with cv2.warpAffine to its fixed-point table precision."""
    from pacingpseudo_tpu.ops.warp import fused_warp_sample_cubic
    src = rng.randn(CH, CW).astype(np.float32)
    deg = 23.0
    m = cv2.getRotationMatrix2D((CW / 2, CH / 2), deg, 1.0)
    ref = cv2.warpAffine(src, m, (CW, CH), flags=cv2.INTER_CUBIC, borderValue=0.0)
    # inverse map of the same affine
    yy, xx = np.mgrid[0:CH, 0:CW].astype(np.float64)
    minv = cv2.invertAffineTransform(m)
    sx = minv[0, 0] * xx + minv[0, 1] * yy + minv[0, 2]
    sy = minv[1, 0] * xx + minv[1, 1] * yy + minv[1, 2]
    inside = (sy >= 1) & (sy < CH - 2) & (sx >= 1) & (sx < CW - 2)
    lab = np.zeros((CH, CW), np.float32)
    got, _, _ = fused_warp_sample_cubic(
        jnp.asarray(src), jnp.asarray(lab), jnp.asarray(lab),
        jnp.asarray(sy, dtype=jnp.float32), jnp.asarray(sx, dtype=jnp.float32),
        2, bound_h=jnp.float32(CH), bound_w=jnp.float32(CW), cubic_a=-0.75)
    got = np.asarray(got)
    # cv2 clips coordinates differently at borders; compare interior taps,
    # excluding pixels where our live-range clip engaged (cv2 doesn't clip)
    unclipped = (got > src.min() + 1e-6) & (got < src.max() - 1e-6)
    m_ = inside & unclipped
    assert m_.sum() > 0.5 * CH * CW
    assert np.allclose(got[m_], ref[m_], atol=5e-3)


def test_scaling_matches_scipy_zoom(rng):
    """Pure down-scaling vs scipy map_coordinates with the same half-pixel
    mapping (the skimage.resize convention, augmentations.py:214)."""
    img, lab, scb, size = _sample(rng)
    sc = 0.75
    p = _params(p_scale=1.0, scale_range=(sc, sc), image_interp="bilinear")
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(5), p)

    src = _norm(np.asarray(img)[:CH, :CW])
    new_h = new_w = round(sc * CH)
    yy, xx = np.mgrid[0:new_h, 0:new_w].astype(np.float64)
    sy = np.clip((yy + 0.5) * CH / new_h - 0.5, 0, CH - 1)
    sx = np.clip((xx + 0.5) * CW / new_w - 0.5, 0, CW - 1)
    scaled = ndimage.map_coordinates(src, [sy, sx], order=1)
    # our output embeds `scaled` somewhere in the crop canvas
    got = np.asarray(out["image"])
    vm = np.asarray(out["valid_mask"]).astype(bool)
    assert vm.sum() == new_h * new_w
    ys, xs = np.where(vm)
    window = got[ys.min():ys.min() + new_h, xs.min():xs.min() + new_w]
    assert np.allclose(_norm(window), _norm(scaled), atol=1e-3)


def test_elastic_zero_alpha_is_identity(rng):
    img, lab, scb, size = _sample(rng)
    p = _params(p_elastic=1.0, alpha_range=(0.0, 0.0))
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(0), p)
    expect = _norm(np.asarray(img)[:CH, :CW])
    assert np.allclose(np.asarray(out["image"]), expect, atol=1e-4)


def test_elastic_displaces_but_preserves_classes(rng):
    img, lab, scb, size = _sample(rng)
    p = _params(p_elastic=1.0, alpha_range=(150.0, 150.0))
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(0), p)
    ident = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(0), _params())
    assert not np.allclose(np.asarray(out["image"]), np.asarray(ident["image"]), atol=1e-3)
    assert set(np.unique(np.asarray(out["label"]))) <= set(range(C + 1))


def test_batch_augment_bf16_table_labels_bitexact(rng):
    """End-to-end plumbing of warp_table_dtype (aug/params.py): under a
    bf16 gather table the one-hot label/scribble outputs are bit-exact vs
    f32 and the images agree to bf16-tap rounding."""
    import dataclasses
    n = 4
    raw = {
        "image": jnp.asarray(rng.randn(n, S, S), jnp.float32),
        "label": jnp.asarray(rng.randint(0, C, (n, S, S)), jnp.float32),
        "scribble": jnp.asarray(rng.randint(0, C + 1, (n, S, S)), jnp.float32),
        "size": jnp.asarray(np.tile([CH, CW], (n, 1)), jnp.int32),
    }
    p = _params(p_scale=0.5, p_rotate=0.5, p_elastic=0.5, p_mirror_y=0.5)
    sp = StrongAugParams.color(1.0)
    key = jax.random.PRNGKey(3)
    b32 = augment_batch(raw, key, dataclasses.replace(
        p, warp_table_dtype="f32"), sp, True)
    b16 = augment_batch(raw, key, dataclasses.replace(
        p, warp_table_dtype="bf16"), sp, True)
    np.testing.assert_array_equal(np.asarray(b32["label"]),
                                  np.asarray(b16["label"]))
    np.testing.assert_array_equal(np.asarray(b32["scribble"]),
                                  np.asarray(b16["scribble"]))
    # post-warp the image passes noise + renorm; bf16 tap rounding stays a
    # small relative perturbation of the normalized image
    np.testing.assert_allclose(np.asarray(b32["image"]),
                               np.asarray(b16["image"]), atol=0.05)


def test_batch_augment_shapes_and_strong(rng):
    n = 4
    raw = {
        "image": jnp.asarray(rng.randn(n, S, S), jnp.float32),
        "label": jnp.asarray(rng.randint(0, C, (n, S, S)), jnp.float32),
        "scribble": jnp.asarray(rng.randint(0, C + 1, (n, S, S)), jnp.float32),
        "size": jnp.asarray(np.tile([CH, CW], (n, 1)), jnp.int32),
    }
    p = _params(p_scale=0.2, p_rotate=0.2, p_mirror_y=0.5)
    sp = StrongAugParams.color(1.0)
    batch = augment_batch(raw, jax.random.PRNGKey(0), p, sp, True)
    assert batch["image"].shape == (n, CH, CW, 1)
    assert batch["image_strong"].shape == (n, CH, CW, 1)
    assert batch["label"].shape == (n, CH, CW, C)
    assert batch["scribble"].shape == (n, CH, CW, C + 1)
    assert batch["valid_mask"].shape == (n, CH, CW, 1)
    # strong stream differs from weak (p=0.8 each of three color ops across
    # 4 samples: astronomically unlikely to all no-op)
    assert not np.allclose(np.asarray(batch["image"]),
                           np.asarray(batch["image_strong"]))
    # per-sample keys differ: two samples shouldn't get identical augs
    assert not np.array_equal(np.asarray(batch["image"][0]),
                              np.asarray(batch["image"][1]))


def test_strong_gamma_retain_stats(rng):
    img = jnp.asarray(_norm(rng.randn(CH, CW).astype(np.float32)))
    p = StrongAugParams(p_brightness=0.0, p_contrast=0.0, p_gamma=1.0,
                        gamma_range=(0.5, 0.5), gamma_retain_stats=True)
    # The biased draw (augmentations.py:153-156) picks gamma in U(lo, 1) or
    # U(max(1, lo), hi) — retain_stats must restore mean/std either way, and
    # across several keys at least one draw must land a non-trivial gamma.
    any_changed = False
    for seed in range(6):
        out = strong_augment_sample(img, img, jax.random.PRNGKey(seed), p)
        assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 1e-3
        assert abs(float(jnp.std(out)) - float(jnp.std(img))) < 1e-3
        any_changed |= not np.allclose(np.asarray(out), np.asarray(img), atol=1e-3)
    assert any_changed


def test_strong_identity_when_all_off(rng):
    img = jnp.asarray(rng.randn(CH, CW).astype(np.float32))
    p = StrongAugParams(p_brightness=0.0, p_contrast=0.0, p_gamma=0.0)
    out = strong_augment_sample(img, img, jax.random.PRNGKey(0), p)
    assert np.allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_strong_brightness_shift(rng):
    img = jnp.asarray(rng.randn(CH, CW).astype(np.float32))
    p = StrongAugParams(p_brightness=1.0, brightness_range=(0.3, 0.3),
                        p_contrast=0.0, p_gamma=0.0)
    out = strong_augment_sample(img, img, jax.random.PRNGKey(0), p)
    assert np.allclose(np.asarray(out), np.asarray(img) + 0.3, atol=1e-5)


def test_strong_mixup_blends_partner(rng):
    img = jnp.zeros((CH, CW), jnp.float32)
    partner = jnp.ones((CH, CW), jnp.float32)
    p = StrongAugParams(p_brightness=0.0, p_contrast=0.0, p_gamma=0.0,
                        p_mixup=1.0, mixup_lam_range=(0.8, 0.8))
    out = strong_augment_sample(img, partner, jax.random.PRNGKey(0), p)
    assert np.allclose(np.asarray(out), 0.2, atol=1e-5)


def test_eval_preprocess(rng):
    n, h, w = 2, 24, 20
    raw = {
        "image": jnp.asarray(np.pad(rng.randn(n, h, w).astype(np.float32),
                                    ((0, 0), (0, S - h), (0, S - w))), jnp.float32),
        "label": jnp.full((n, S, S), IGN, jnp.float32).at[:, :h, :w].set(0.0),
        "scribble": jnp.full((n, S, S), IGN, jnp.float32),
        "size": jnp.asarray(np.tile([h, w], (n, 1)), jnp.int32),
    }
    out = eval_preprocess_batch(raw, C)
    img = np.asarray(out["image"])[0, :h, :w, 0]
    assert abs(img.mean()) < 1e-4 and abs(img.std() - 1) < 1e-3
    # padding stays zero; label one-hot zeroed outside region
    assert np.allclose(np.asarray(out["image"])[0, h:, :, 0], 0)
    assert np.allclose(np.asarray(out["label"])[0, h:, :, :], 0)


def test_presets_cover_all_datasets_and_variants():
    for ds in ["chaos", "acdc", "lvsc"]:
        bp = base_params_for(ds)
        assert bp.crop_size in ((256, 256), (224, 224))
    for preset in ["TransformsColor", "TransformsColorBlur",
                   "TransformsColorMixup", "TransformsColorLow"]:
        sp = strong_params_for(preset, strength=0.5)
        assert sp.brightness_range == (-0.4, 0.4)
    with pytest.raises(ValueError):
        strong_params_for("Bogus")


def test_rotation90_exact_label_permutation(rng):
    """Rotation90 (augmentations.py:319-335): with p=1 and a single choice k,
    the output is EXACTLY np.rot90(raw, k) — labels permuted with no
    resampling blur, image equal to norm(rot90(raw))."""
    for k in (1, 2, 3):
        img, lab, scb, size = _sample(rng)
        p = _params(p_rot90=1.0, rot90_choices=(k,))
        out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(7), p)
        raw_img = np.asarray(img)[:CH, :CW]
        raw_lab = np.asarray(lab)[:CH, :CW]
        raw_scb = np.asarray(scb)[:CH, :CW]
        assert np.array_equal(np.asarray(out["label"]), np.rot90(raw_lab, k)), k
        assert np.array_equal(np.asarray(out["scribble"]), np.rot90(raw_scb, k)), k
        assert np.allclose(np.asarray(out["image"]),
                           _norm(np.rot90(raw_img, k)), atol=1e-4), k


def test_rotation90_gate_off_is_identity(rng):
    img, lab, scb, size = _sample(rng)
    p = _params(p_rot90=0.0)
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(1), p)
    assert np.array_equal(np.asarray(out["label"]), np.asarray(lab)[:CH, :CW])


def test_rotation90_rect_source_swaps_extent(rng):
    """Odd k on a rectangular live region swaps the live extent, so the
    (32, 20) content becomes (20, 32) in the crop with ignore padding."""
    img, lab, scb, size = _sample(rng, h=32, w=20)
    p = _params(p_rot90=1.0, rot90_choices=(1,))
    out = base_augment_sample(img, lab, scb, size, jax.random.PRNGKey(2), p)
    lab_out = np.asarray(out["label"])
    expect = np.rot90(np.asarray(lab)[:32, :20], 1)       # (20, 32)
    # the (20, 32) content embeds at a random offset — locate it
    live = lab_out != IGN
    ys, xs = np.where(live)
    assert ys.max() - ys.min() + 1 == 20 and xs.max() - xs.min() + 1 == 32
    assert np.array_equal(lab_out[ys.min():ys.min() + 20,
                                  xs.min():xs.min() + 32], expect)


def test_cutout_zeroes_box_and_respects_gate(rng):
    """Cutout (augmentations.py:23-49): p=1 zeroes one length×length box
    (clipped at borders) and leaves every other pixel untouched; p=0 is the
    identity."""
    img = jnp.asarray(rng.randn(CH, CW).astype(np.float32)) + 5.0  # no zeros
    p_on = StrongAugParams(p_brightness=0.0, p_contrast=0.0, p_gamma=0.0,
                           p_cutout=1.0, cutout_length=10)
    out = np.asarray(strong_augment_sample(img, img, jax.random.PRNGKey(3), p_on))
    zero = out == 0.0
    ys, xs = np.where(zero)
    assert zero.any()
    # the zero set is one solid axis-aligned rectangle with sides <= length
    assert ys.max() - ys.min() < 10 and xs.max() - xs.min() < 10
    box = zero[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    assert box.all()
    untouched = ~zero
    assert np.array_equal(out[untouched], np.asarray(img)[untouched])

    p_off = StrongAugParams(p_brightness=0.0, p_contrast=0.0, p_gamma=0.0,
                            p_cutout=0.0)
    out_off = np.asarray(strong_augment_sample(img, img, jax.random.PRNGKey(3), p_off))
    assert np.array_equal(out_off, np.asarray(img))


# ---------------------------------------------------------------------------
# fused_warp_sample_cubic (ops/warp.py): single-gather bicubic image tap
# ---------------------------------------------------------------------------

def _naive_cubic(src, lab, scb, sy, sx, num_values, bh, bw):
    """Direct 16-tap Keys a=-0.5 warp with live-range-masked + renormalised
    boundary weights, plus the 4-tap bilinear class vote — the definition
    the packed single-gather implementation must reproduce."""
    a = -0.5

    def kw(f):
        def near(s):
            return (a + 2) * s ** 3 - (a + 3) * s ** 2 + 1

        def far(s):
            return a * (s ** 3 - 5 * s ** 2 + 8 * s - 4)
        return [far(1 + f), near(f), near(1 - f), far(2 - f)]

    sy = np.clip(sy, 0, bh - 1.0)
    sx = np.clip(sx, 0, bw - 1.0)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    fy, fx = sy - y0, sx - x0
    img = np.zeros_like(sy)
    wy = [kw(fy)[r] * ((y0 - 1 + r >= 0) & (y0 - 1 + r <= bh - 1)) for r in range(4)]
    wx = [kw(fx)[c] * ((x0 - 1 + c >= 0) & (x0 - 1 + c <= bw - 1)) for c in range(4)]
    ny, nx = sum(wy), sum(wx)
    for i in range(4):
        cy = np.clip(y0 - 1 + i, 0, bh - 1)
        for j in range(4):
            cx = np.clip(x0 - 1 + j, 0, bw - 1)
            img += wy[i] * wx[j] * src[cy, cx]
    img /= ny * nx
    live = src[:bh, :bw]
    img = np.clip(img, live.min(), live.max())

    def vote(plane):
        y1 = np.minimum(y0 + 1, bh - 1)
        x1 = np.minimum(x0 + 1, bw - 1)
        taps = [(y0, x0, (1 - fy) * (1 - fx)), (y0, x1, (1 - fy) * fx),
                (y1, x0, fy * (1 - fx)), (y1, x1, fy * fx)]
        best_v = None
        best_c = None
        for v in range(num_values):
            s = sum(w * (plane[yy, xx] == v) for yy, xx, w in taps)
            if best_v is None:
                best_v, best_c = s, np.zeros_like(s, int)
            else:
                new = s > best_v
                best_v = np.where(new, s, best_v)
                best_c = np.where(new, v, best_c)
        return best_c

    return img, vote(lab), vote(scb)


def test_cubic_warp_matches_naive(rng):
    from pacingpseudo_tpu.ops.warp import fused_warp_sample_cubic
    h = w = 24
    bh, bw = 20, 22  # live region smaller than the canvas
    src = rng.randn(h, w).astype(np.float32)
    lab = rng.randint(0, C + 1, (h, w)).astype(np.float32)
    scb = rng.randint(0, C + 2, (h, w)).astype(np.float32)
    # coordinates spanning interior, edges, corners and out-of-range
    sy = rng.uniform(-1.5, bh + 1.5, (16, 16)).astype(np.float32)
    sx = rng.uniform(-1.5, bw + 1.5, (16, 16)).astype(np.float32)
    sy[0, :4] = [0.0, bh - 1.0, 0.3, bh - 1.3]
    sx[0, :4] = [0.0, bw - 1.0, bw - 0.9, 0.2]

    img_j, lab_j, scb_j = fused_warp_sample_cubic(
        jnp.asarray(src), jnp.asarray(lab), jnp.asarray(scb),
        jnp.asarray(sy), jnp.asarray(sx), C + 2,
        bound_h=jnp.float32(bh), bound_w=jnp.float32(bw))
    img_n, lab_n, scb_n = _naive_cubic(
        src.astype(np.float64), lab, scb,
        sy.astype(np.float64), sx.astype(np.float64), C + 2, bh, bw)
    assert np.allclose(np.asarray(img_j), img_n, atol=2e-4)
    assert np.array_equal(np.asarray(lab_j), lab_n)
    assert np.array_equal(np.asarray(scb_j), scb_n)


def test_cubic_warp_labels_bitmatch_bilinear_vote(rng):
    """The cubic variant must reproduce fused_warp_sample's class votes
    exactly (only the image kernel differs)."""
    from pacingpseudo_tpu.ops.warp import fused_warp_sample, fused_warp_sample_cubic
    h = w = 32
    bh = bw = 32
    src = rng.randn(h, w).astype(np.float32)
    lab = rng.randint(0, C + 1, (h, w)).astype(np.float32)
    scb = rng.randint(0, C + 2, (h, w)).astype(np.float32)
    sy = rng.uniform(0, bh - 1, (h, w)).astype(np.float32)
    sx = rng.uniform(0, bw - 1, (h, w)).astype(np.float32)
    args = (jnp.asarray(src), jnp.asarray(lab), jnp.asarray(scb),
            jnp.asarray(sy), jnp.asarray(sx), C + 2)
    _, lab_b, scb_b = fused_warp_sample(*args, bound_h=jnp.float32(bh),
                                        bound_w=jnp.float32(bw))
    _, lab_c, scb_c = fused_warp_sample_cubic(*args, bound_h=jnp.float32(bh),
                                              bound_w=jnp.float32(bw))
    assert np.array_equal(np.asarray(lab_b), np.asarray(lab_c))
    assert np.array_equal(np.asarray(scb_b), np.asarray(scb_c))


def test_cubic_warp_identity_at_integer_coords(rng):
    from pacingpseudo_tpu.ops.warp import fused_warp_sample_cubic
    h = w = 16
    src = rng.randn(h, w).astype(np.float32)
    lab = rng.randint(0, C, (h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img, labo, _ = fused_warp_sample_cubic(
        jnp.asarray(src), jnp.asarray(lab), jnp.asarray(lab),
        jnp.asarray(yy), jnp.asarray(xx), C,
        bound_h=jnp.float32(h), bound_w=jnp.float32(w))
    assert np.allclose(np.asarray(img), src, atol=1e-5)
    assert np.array_equal(np.asarray(labo), lab)


def test_batch_augment_chunked_matches_unchunked(rng, monkeypatch):
    """The VMEM-residency chunking of the base-aug vmap (engine
    _vmap_in_chunks, round-5 batch-scaling fix) is a pure execution-order
    change: chunked and single-vmap traces must agree bit for bit."""
    from pacingpseudo_tpu.aug import engine

    n = 6
    raw = {
        "image": jnp.asarray(rng.randn(n, S, S), jnp.float32),
        "label": jnp.asarray(rng.randint(0, C, (n, S, S)), jnp.float32),
        "scribble": jnp.asarray(rng.randint(0, C + 1, (n, S, S)), jnp.float32),
        "size": jnp.asarray(np.tile([CH, CW], (n, 1)), jnp.int32),
    }
    p = _params(p_scale=0.3, p_rotate=0.3, p_elastic=0.3, p_mirror_y=0.5)
    sp = StrongAugParams.color(1.0)
    key = jax.random.PRNGKey(5)

    monkeypatch.setattr(engine, "_AUG_CHUNK", 3)  # bypass lazy default
    jax.clear_caches()  # _AUG_CHUNK is read at trace time
    chunked = {k: np.asarray(v)
               for k, v in augment_batch(raw, key, p, sp, True).items()}
    monkeypatch.setattr(engine, "_AUG_CHUNK", 0)  # plain vmap
    jax.clear_caches()
    plain = {k: np.asarray(v)
             for k, v in augment_batch(raw, key, p, sp, True).items()}
    jax.clear_caches()  # don't leak trace-cache state to other tests

    assert sorted(chunked) == sorted(plain)
    for k in plain:
        np.testing.assert_array_equal(chunked[k], plain[k], err_msg=k)
