"""On-device augmentation engine: one fused warp per sample, vmapped.

Re-design of the reference host-side augmentation chain
(datasets/augmentations.py, applied per worker process in
chaos_dataset.py:58-90) as a single jit-compatible XLA program:

* every *geometric* base transform — Scaling, ElasticTransform,
  RandomRotation, Mirroring, RandomCrop — is composed into ONE inverse
  coordinate map evaluated on the static crop canvas, so each tensor is
  gathered exactly once (images bilinear, labels/scribbles class-vote; see
  ops/warp.py);
* the probabilistic "apply with p" gates become parameter selections
  (scale=1, angle=0, alpha=0, no flip) — no control flow, no retraces;
* intensity ops (MeanStdNorm, GaussianNoise and the strong-stream
  Brightness/Contrast/Gamma/Blur/Mixup/LowRes) act on the fixed canvas;
* the strong stream is derived on device from the *same* base-transformed
  batch, preserving the reference's pixel-alignment invariant (strong
  transforms are intensity-only, chaos_aug_configs.py:63-186, applied after
  the shared base pipeline, chaos_dataset.py:69-76).

Inputs are host-padded source canvases: ``image/label/scribble`` of static
shape (S, S) plus the live extent ``size=(h, w)``; padding uses 0 for the
image and ``ignored_index`` for label/scribble.

Documented deviations from the reference (statistical, not semantic —
SURVEY.md §7 accepts DSC-level parity for the resample-order transforms):
  * single bilinear tap instead of chained cubic resamples;
  * the elastic displacement field is evaluated on the output canvas grid
    (not the intermediate scaled grid) — identically distributed smooth
    field, zero extra gathers;
  * the second MeanStdNorm computes statistics over the crop-visible region
    instead of the full pre-crop array.
"""
from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp

from pacingpseudo_tpu.aug.params import BaseAugParams, StrongAugParams
from pacingpseudo_tpu.ops.resize import bilinear_resize_align_corners
from pacingpseudo_tpu.ops.warp import (
    bilinear_sample,
    fused_warp_sample,
    fused_warp_sample_cubic,
    separable_gaussian_blur,
)

_EPS = 1e-8


def _region_stats(x, mask):
    """Mean/std over ``mask`` (population std, like np.std)."""
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(x * mask) / cnt
    var = jnp.sum(jnp.square(x - mean) * mask) / cnt
    return mean, jnp.sqrt(var)


def _bern(key, p):
    return jax.random.uniform(key) < p


def _uniform(key, lo, hi):
    return jax.random.uniform(key, minval=lo, maxval=hi)


def _randint_traced(key, maxval_inclusive):
    """randint in [0, maxval_inclusive] with a traced bound."""
    u = jax.random.uniform(key)
    return jnp.floor(u * (maxval_inclusive.astype(jnp.float32) + 1.0)).astype(jnp.int32)


# Residual amplitude factor of the low-res elastic pipeline vs the analytic
# model below, measured on the CPU backend (tools/aug_parity.py
# measure_elastic_field, N=64 fields at sigma 9/11/13): the discrete-kernel
# model alone leaves a ~2.2% one-sided deficit traced to the align_corners
# upsample scale ((S-1)/(fh-1) > ds) and edge effects.  Constant across the
# sigma range to <0.3%.
_ELASTIC_RESIDUAL = 0.978


def elastic_amplitude_correction(sigma, ds: int, radius: int):
    """Amplitude calibration for the 1/``ds``-resolution elastic field.

    The reference field is full-resolution white noise U(-1,1) blurred with a
    Gaussian of the *traced* ``sigma`` (augmentations.py:264-265, scipy
    truncate=4).  Ours is coarse noise blurred with ``sigma/ds`` then
    bilinearly upsampled; both are linear in the noise, so their RMS ratio is
    the ratio of the composed filters' L2 norms — computable in closed form
    from the discrete 1-D kernels.  For the bilinear phase t ~ U[0,1) between
    knots sharing blurred noise, E[((1-t)k_m + t k_{m+1})^2 summed] =
    (2*sum(k^2) + sum(k_m k_{m+1})) / 3.  Multiplying the field by this
    correction (x the measured residual) lands the RMS ratio at 1.0 across
    the sigma range (AUG_PARITY.json elastic_field), closing the ~6% deficit
    flagged in round 2.
    """
    # reference kernel: radius int(4*sigma + 0.5); static 64-tap support
    # covers sigma <= 15.9 (configs use 9..13)
    i = jnp.arange(-64, 65, dtype=jnp.float32)
    g = jnp.exp(-0.5 * jnp.square(i / jnp.maximum(sigma, 1e-6)))
    g = jnp.where(jnp.abs(i) <= jnp.floor(4.0 * sigma + 0.5), g, 0.0)
    g = g / jnp.sum(g)
    ref_l2 = jnp.sum(g * g)          # 1-D factor; 2-D RMS factor = ref_l2

    sc = jnp.maximum(sigma / ds, 1e-6)
    j = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(j / sc))
    k = k / jnp.sum(k)
    a = jnp.sum(k * k)
    b = jnp.sum(k[:-1] * k[1:])
    ours_l2 = (2.0 * a + b) / 3.0 / ds
    return ref_l2 / (ours_l2 * _ELASTIC_RESIDUAL)


def make_elastic_field(key, out_h: int, out_w: int, sigma, alpha,
                       ds: int, radius: int):
    """One calibrated displacement-field axis on the (out_h, out_w) canvas.

    Band-limited generation: coarse white noise, blur at ``sigma/ds``,
    bilinear upsample (MXU matmuls), amplitude ``alpha/ds`` x the closed-form
    calibration — matching the reference full-resolution field's RMS and
    (to +2px autocorrelation half-width) smoothness at ~1/64 the blur cost.
    """
    fh, fw = max(out_h // ds, 2), max(out_w // ds, 2)
    radius = min(radius, fh - 1, fw - 1)  # reflect-pad bound
    amp = alpha / ds * elastic_amplitude_correction(sigma, ds, radius)
    noise = jax.random.uniform(key, (fh, fw)) * 2.0 - 1.0
    low = separable_gaussian_blur(noise, sigma / ds, radius)
    up = bilinear_resize_align_corners(low[None, :, :, None], out_h, out_w)
    return up[0, :, :, 0] * amp


def base_augment_sample(image, label, scribble, size, key, p: BaseAugParams):
    """Apply the fused base pipeline to one sample.

    Args:
      image/label/scribble: (S, S) padded source canvases.
      size: (2,) int32 live extent (h, w).
      key: PRNG key for this sample.

    Returns:
      dict with ``image/label/scribble`` of shape ``crop_size`` and
      ``valid_mask`` marking the crop-visible region
      (augmentations.py:368-419 RandomCrop semantics).
    """
    ch, cw = p.crop_size
    keys = jax.random.split(key, 18)
    image = image.astype(jnp.float32)
    label = label.astype(jnp.float32)
    scribble = scribble.astype(jnp.float32)
    h_raw = size[0].astype(jnp.float32)
    w_raw = size[1].astype(jnp.float32)

    # ---- Rotation90 (augmentations.py:319-335): composed as the FIRST
    # forward transform — the k·90°-rotated array (live size swapped for
    # odd k) is what the rest of the pipeline sees; the rotation itself is
    # inverted exactly at the end of the coordinate chain (no resampling).
    if p.p_rot90 > 0:
        do_r90 = _bern(keys[16], p.p_rot90)
        choices = jnp.asarray(p.rot90_choices, jnp.int32)
        pick = jax.random.randint(keys[17], (), 0, len(p.rot90_choices))
        k90 = jnp.where(do_r90, choices[pick], 0)
    else:
        k90 = jnp.int32(0)
    odd = (k90 % 2) == 1
    h = jnp.where(odd, w_raw, h_raw)
    w = jnp.where(odd, h_raw, w_raw)

    # ---- MeanStdNorm #1 over the live region (augmentations.py:11-21;
    # the reference normalises the raw loaded slice).
    s_dim = image.shape[0]
    iy = jax.lax.broadcasted_iota(jnp.int32, image.shape, 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, image.shape, 1)
    region = ((iy < size[0]) & (ix < size[1])).astype(jnp.float32)
    mean1, std1 = _region_stats(image, region)
    img = (image - mean1) / (std1 + _EPS)

    # ---- Sample transform parameters (gated by probabilities).
    do_scale = _bern(keys[0], p.p_scale)
    scale = jnp.where(do_scale, _uniform(keys[1], *p.scale_range), 1.0)
    new_h = jnp.round(scale * h)
    new_w = jnp.round(scale * w)

    do_el = _bern(keys[2], p.p_elastic)
    sigma = _uniform(keys[3], *p.sigma_range)
    alpha = jnp.where(do_el, _uniform(keys[4], *p.alpha_range), 0.0)

    do_rot = _bern(keys[5], p.p_rotate)
    theta = jnp.where(
        do_rot,
        _uniform(keys[6], *p.degree_range) * (jnp.pi / 180.0),
        0.0)

    flip_y = _bern(keys[7], p.p_mirror_y)
    flip_x = _bern(keys[8], p.p_mirror_x)

    do_noise = _bern(keys[9], p.p_noise)
    noise_scale = jnp.where(do_noise, _uniform(keys[10], *p.noise_scale_range), 0.0)

    # ---- Crop offsets (augmentations.py:386-398): crop when the scaled
    # image exceeds the canvas, embed (random canvas offset) otherwise.
    h_margin = (new_h - ch).astype(jnp.int32)
    w_margin = (new_w - cw).astype(jnp.int32)
    off_y = jnp.where(
        h_margin > 0,
        _randint_traced(keys[11], jnp.maximum(h_margin, 0)),
        -_randint_traced(keys[12], jnp.maximum(-h_margin, 0)))
    off_x = jnp.where(
        w_margin > 0,
        _randint_traced(keys[13], jnp.maximum(w_margin, 0)),
        -_randint_traced(keys[14], jnp.maximum(-w_margin, 0)))

    # ---- Compose the inverse coordinate map on the output canvas grid.
    oy = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 0)
    ox = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 1)

    # crop: canvas pixel -> scaled-image coordinate
    yc = oy + off_y
    xc = ox + off_x
    crop_valid = (yc >= 0) & (yc <= new_h - 1) & (xc >= 0) & (xc <= new_w - 1)

    # mirror on the scaled image (axis 0 = rows, axis 1 = cols)
    yc = jnp.where(flip_y, new_h - 1.0 - yc, yc)
    xc = jnp.where(flip_x, new_w - 1.0 - xc, xc)

    # inverse rotation about the scaled-image centre (cv2 centre convention
    # (w/2, h/2), augmentations.py:306)
    cyc = new_h / 2.0
    cxc = new_w / 2.0
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    rel_x = xc - cxc
    rel_y = yc - cyc
    qx = cos_t * rel_x - sin_t * rel_y + cxc
    qy = sin_t * rel_x + cos_t * rel_y + cyc
    rot_valid = (qy >= 0) & (qy <= new_h - 1) & (qx >= 0) & (qx <= new_w - 1)

    # elastic displacement, evaluated on the static canvas grid; generated
    # at low resolution with calibrated amplitude (make_elastic_field)
    ds = p.elastic_field_downscale

    def _field(key):
        return make_elastic_field(key, ch, cw, sigma, alpha, ds,
                                  p.elastic_blur_radius)

    field_y = _field(keys[15])
    field_x = _field(jax.random.fold_in(keys[15], 1))
    qy = jnp.clip(qy + field_y, 0.0, new_h - 1.0)   # mode='nearest' clamp
    qx = jnp.clip(qx + field_x, 0.0, new_w - 1.0)

    # inverse scaling: scaled-image coordinate -> source coordinate
    # (skimage.resize half-pixel convention, augmentations.py:214)
    sy = (qy + 0.5) * (h / jnp.maximum(new_h, 1.0)) - 0.5
    sx = (qx + 0.5) * (w / jnp.maximum(new_w, 1.0)) - 0.5

    # invert Rotation90: (sy, sx) in the k·90°-rotated live array (h, w)
    # -> coordinates in the raw array (h_raw, w_raw).  np.rot90(a, k)
    # inverses: k=1 → (x, w_raw-1-y swapped), derived per k below.
    ry = jnp.select(
        [k90 == 0, k90 == 1, k90 == 2],
        [sy, sx, h_raw - 1.0 - sy],
        h_raw - 1.0 - sx)                       # k == 3
    rx = jnp.select(
        [k90 == 0, k90 == 1, k90 == 2],
        [sx, w_raw - 1.0 - sy, w_raw - 1.0 - sx],
        sy)                                      # k == 3
    sy, sx = ry, rx

    # ---- One fused gather pass for all three tensors (shared taps).
    num_vals = p.num_classes + 1
    warp = (functools.partial(fused_warp_sample_cubic,
                              table_impl=p.warp_table_impl,
                              table_dtype=p.warp_table_dtype)
            if p.image_interp == "bicubic" else fused_warp_sample)
    img_out, lab_out, scb_out = warp(
        img, label, scribble, sy, sx, num_vals, bound_h=h_raw, bound_w=w_raw)

    # rotation padding (image 0 / labels ignored_index, augmentations.py:294-312)
    ign = jnp.int32(p.ignored_index)
    img_out = jnp.where(rot_valid, img_out, 0.0)
    lab_out = jnp.where(rot_valid, lab_out, ign)
    scb_out = jnp.where(rot_valid, scb_out, ign)

    # noise (before the 2nd norm, augmentations.py:353-366)
    img_out = img_out + jax.random.normal(
        jax.random.fold_in(keys[15], 2), (ch, cw)) * noise_scale

    # ---- MeanStdNorm #2 over the crop-visible region.
    vmask = crop_valid.astype(jnp.float32)
    mean2, std2 = _region_stats(img_out, vmask)
    img_out = (img_out - mean2) / (std2 + _EPS)

    # crop embedding pads (augmentations.py:400-418)
    img_out = jnp.where(crop_valid, img_out, 0.0)
    lab_out = jnp.where(crop_valid, lab_out, ign)
    scb_out = jnp.where(crop_valid, scb_out, ign)

    return {
        "image": img_out,
        "label": lab_out,
        "scribble": scb_out,
        "valid_mask": vmask,
    }


# ---------------------------------------------------------------------------
# Strong (intensity) stream — reference chaos_aug_configs.py:63-186
# ---------------------------------------------------------------------------

def strong_augment_sample(image, partner, key, p: StrongAugParams):
    """Intensity-only strong transforms on a base-transformed (H, W) image.

    ``partner`` is another sample's normalised raw crop used by the Mixup
    variant (the reference mixes with a random dataset file,
    augmentations.py:51-81; on device we mix with a batch peer).
    """
    keys = jax.random.split(key, 16)
    img = image

    # Brightness (augmentations.py:98-111)
    do_b = _bern(keys[0], p.p_brightness)
    img = img + jnp.where(do_b, _uniform(keys[1], *p.brightness_range), 0.0)

    # Contrast (augmentations.py:113-129)
    do_c = _bern(keys[2], p.p_contrast)
    factor = jnp.where(do_c, _uniform(keys[3], *p.contrast_range), 1.0)
    mean_ = jnp.mean(img)
    mn, mx = jnp.min(img), jnp.max(img)
    img = jnp.clip((img - mean_) * factor + mean_, mn, mx)

    # Gamma with biased sampling + retain-stats (augmentations.py:131-166)
    do_g = _bern(keys[4], p.p_gamma)
    lo, hi = p.gamma_range
    pick_low = (jax.random.uniform(keys[5]) < 0.5) & (lo < 1.0)
    gamma = jnp.where(
        pick_low,
        _uniform(keys[6], lo, 1.0),
        _uniform(keys[6], max(1.0, lo), hi))
    gamma = jnp.where(do_g, gamma, 1.0)
    g_in = -img if p.gamma_invert else img
    mean_g, std_g = jnp.mean(g_in), jnp.std(g_in)
    mn_g, mx_g = jnp.min(g_in), jnp.max(g_in)
    g = jnp.power(jnp.clip((g_in - mn_g) / (mx_g - mn_g + _EPS), 0.0, 1.0), gamma)
    if p.gamma_retain_stats:
        g = (g - jnp.mean(g)) / (jnp.std(g) + _EPS)
        g = g * std_g + mean_g
    g = -g if p.gamma_invert else g
    img = jnp.where(do_g, g, img)

    # Variant extras --------------------------------------------------------
    if p.p_blur > 0:
        do_bl = _bern(keys[7], p.p_blur)
        sig = _uniform(keys[8], *p.blur_sigma_range)
        blurred = separable_gaussian_blur(img, sig, p.blur_radius)
        img = jnp.where(do_bl, blurred, img)

    if p.p_mixup > 0:
        do_m = _bern(keys[9], p.p_mixup)
        lam = jnp.where(do_m, _uniform(keys[10], *p.mixup_lam_range), 1.0)
        img = img * lam + partner * (1.0 - lam)

    if p.p_lowres > 0:
        # Simulate low resolution by snapping sample coordinates to a coarse
        # grid (nearest-downsample) and bilinearly reading the fine image —
        # the static-shape equivalent of resize-down(order 0)/up(order 3)
        # (augmentations.py:168-189).  Keys 11/12 are distinct from the blur
        # branch's 7/8 so blur and lowres gates stay independent when a
        # custom preset enables both.
        do_l = _bern(keys[11], p.p_lowres)
        s = _uniform(keys[12], *p.lowres_scale_range)
        hh, ww = img.shape
        oy = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0)
        ox = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1)
        cy = jnp.round(jnp.floor(oy / s) * s + (s - 1.0) / 2.0)
        cx = jnp.round(jnp.floor(ox / s) * s + (s - 1.0) / 2.0)
        low = bilinear_sample(img, cy, cx)
        img = jnp.where(do_l, low, img)

    if p.p_cutout > 0:
        # Cutout (augmentations.py:23-49): zero a length×length box whose
        # centre is uniform over the canvas; the box clips at the borders.
        do_cut = _bern(keys[13], p.p_cutout)
        hh, ww = img.shape
        cy0 = jax.random.randint(keys[14], (), 0, hh)
        cx0 = jax.random.randint(keys[15], (), 0, ww)
        half = p.cutout_length // 2
        ry = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
        rx = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
        in_box = ((ry >= cy0 - half) & (ry < cy0 + half) &
                  (rx >= cx0 - half) & (rx < cx0 + half))
        img = jnp.where(do_cut & in_box, 0.0, img)

    return img


# ---------------------------------------------------------------------------
# Batch-level entry points
# ---------------------------------------------------------------------------

# VMEM-residency chunk for the base-aug vmap.  The fused warp's one
# row-gather reads a (chunk*H*W, 24) f32 table; XLA keeps the table in
# VMEM when it fits (~6.3 MB/sample at 256^2) and the gather runs ~9x
# faster per slice than the HBM fallback.  Round-5 on-chip profiles
# (study_r5/chipq/prof_b{12,24,48}) measured the cliff directly: the
# batched gather costs 6.3 ms/step at batch 12 (table 75 MB, placed in
# VMEM, input annotated S(1)) but 55.8 ms at batch 24 and 111.5 ms at
# batch 48 (151/302 MB tables spill to HBM, ~5.6 GB/s random access) —
# the entire b24/b48 per-slice regression of BENCH_r02..r05.  Mapping
# the SAME per-sample program over batch chunks of 12 reproduces the
# VMEM-resident configuration at every batch size; chunking is a pure
# execution-order change (identical per-sample math).
#
# None = resolve lazily: env PACING_AUG_CHUNK if set, else 12 on a single
# device and DISABLED under a multi-device mesh — there the batch dim is
# already sharded (each device's table slice is VMEM-sized without help)
# and the lax.map reshape of a sharded dim would force GSPMD collectives.
_AUG_CHUNK = None


def _aug_chunk() -> int:
    global _AUG_CHUNK
    if _AUG_CHUNK is None:
        env = os.environ.get("PACING_AUG_CHUNK", "")
        _AUG_CHUNK = int(env) if env else (
            12 if jax.device_count() == 1 else 0)
    return _AUG_CHUNK


def _vmap_in_chunks(f, args):
    """vmap ``f`` over the leading axis, executed in lax.map chunks of
    ``_aug_chunk()`` so per-chunk gather tables stay VMEM-resident.  Falls
    back to one plain vmap when the batch is small or indivisible."""
    n = args[0].shape[0]
    chunk = _aug_chunk()
    if chunk <= 0 or n <= chunk or n % chunk != 0:
        return jax.vmap(f)(*args)
    k = n // chunk
    resh = tuple(a.reshape((k, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(lambda xs: jax.vmap(f)(*xs), resh)
    return jax.tree.map(lambda o: o.reshape((n,) + o.shape[2:]), out)


def _finalize(one_hot_classes, out, do_strong, strong_img=None):
    """Convert hard labels to the one-hot layout the losses expect
    (ToTorchTensor semantics, augmentations.py:421-446): label one-hot over
    ``C`` channels (ignored pixels become all-zero rows), scribble over
    ``C+1``."""
    c = one_hot_classes
    batch = {
        "image": out["image"][..., None],
        "label": jax.nn.one_hot(out["label"], c),
        "scribble": jax.nn.one_hot(out["scribble"], c + 1),
        "valid_mask": out["valid_mask"][..., None],
    }
    if do_strong:
        batch["image_strong"] = strong_img[..., None]
    return batch


@functools.partial(jax.jit, static_argnames=("base_params", "strong_params", "do_strong"))
def augment_batch(raw: Dict[str, jnp.ndarray], rng,
                  base_params: BaseAugParams,
                  strong_params: StrongAugParams = None,
                  do_strong: bool = False):
    """Augment a whole raw batch on device.

    Args:
      raw: dict of host-padded canvases — ``image/label/scribble``
        (N, S, S) and ``size`` (N, 2).
      rng: one PRNG key; split per sample (fixing the reference's
        worker-duplicated numpy RNG quirk by construction, SURVEY.md §5).

    Returns:
      Training batch: ``image`` (N, H, W, 1) f32, ``label`` (N, H, W, C),
      ``scribble`` (N, H, W, C+1), ``valid_mask`` (N, H, W, 1), and
      ``image_strong`` when ``do_strong``.
    """
    n = raw["image"].shape[0]
    keys = jax.random.split(rng, n + 1)
    sample_keys = keys[:n]

    base = _vmap_in_chunks(
        lambda im, la, sc, sz, k: base_augment_sample(im, la, sc, sz, k, base_params),
        (raw["image"], raw["label"], raw["scribble"], raw["size"], sample_keys))

    strong_img = None
    if do_strong:
        strong_keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(sample_keys)
        # Mixup partners: base-normalised image of a shifted batch peer.
        shift = jax.random.randint(keys[n], (), 1, jnp.maximum(n, 2))
        partners = jnp.roll(base["image"], shift, axis=0)
        strong_img = jax.vmap(
            lambda im, pa, k: strong_augment_sample(im, pa, k, strong_params)
        )(base["image"], partners, strong_keys)

    return _finalize(base_params.num_classes, base, do_strong, strong_img)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def eval_preprocess_batch(raw: Dict[str, jnp.ndarray], num_classes: int):
    """Validation/inference preprocessing: MeanStdNorm only (reference:
    train_chaos.py:234 / inference.py:127 use ``base_transforms=
    [MeanStdNorm()]``), on the padded canvas with a live-region mask.

    Returns image (N, S, S, 1), label one-hot (N, S, S, C), scribble one-hot
    (N, S, S, C+1), and ``region_mask`` (N, S, S, 1) for masked metrics.
    """
    image = raw["image"].astype(jnp.float32)
    n, s, _ = image.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, s, s), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, s, s), 2)
    region = ((row < raw["size"][:, 0, None, None]) &
              (col < raw["size"][:, 1, None, None])).astype(jnp.float32)
    cnt = jnp.maximum(region.sum(axis=(1, 2), keepdims=True), 1.0)
    mean = (image * region).sum(axis=(1, 2), keepdims=True) / cnt
    var = (jnp.square(image - mean) * region).sum(axis=(1, 2), keepdims=True) / cnt
    img = (image - mean) / (jnp.sqrt(var) + _EPS)
    img = img * region  # keep padding at 0 after normalisation
    return {
        "image": img[..., None],
        "label": jax.nn.one_hot(raw["label"].astype(jnp.int32), num_classes) *
                 region[..., None],
        "scribble": jax.nn.one_hot(raw["scribble"].astype(jnp.int32), num_classes + 1),
        "region_mask": region[..., None],
    }


@functools.partial(jax.jit, static_argnames=())
def eval_preprocess_image(image, size):
    """Inference-only preprocessing: MeanStdNorm over the live region.

    Slim sibling of :func:`eval_preprocess_batch` — the inference driver
    uploads only the image (f16) and sizes; labels/scribbles stay on the
    host where the metrics run (evals/infer.py).
    """
    image = image.astype(jnp.float32)
    n, s, _ = image.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, s, s), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, s, s), 2)
    region = ((row < size[:, 0, None, None]) &
              (col < size[:, 1, None, None])).astype(jnp.float32)
    cnt = jnp.maximum(region.sum(axis=(1, 2), keepdims=True), 1.0)
    mean = (image * region).sum(axis=(1, 2), keepdims=True) / cnt
    var = (jnp.square(image - mean) * region).sum(axis=(1, 2), keepdims=True) / cnt
    img = (image - mean) / (jnp.sqrt(var) + _EPS)
    return (img * region)[..., None]


def make_train_augment_fn(base_params: BaseAugParams,
                          strong_params: StrongAugParams = None,
                          do_strong: bool = False):
    """Bind static params: returns ``(raw_batch, rng) -> train_batch`` for
    fusing into the jitted train step (train/step.py augment_fn)."""

    def fn(raw, rng):
        return augment_batch(raw, rng, base_params, strong_params, do_strong)

    return fn
