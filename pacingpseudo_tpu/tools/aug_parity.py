"""Measured augmentation parity vs the reference host-side transform chain.

PARITY.md documents five deliberate statistical deviations of the fused
on-device augmentation engine (aug/engine.py) from the reference numpy/cv2/
scipy pipeline (/root/reference/datasets/augmentations.py:11-461).  Round 1
*argued* each deviation is DSC-irrelevant; this harness *measures* them:
it runs N samples through the actual reference transform objects (imported
from /root/reference with a faithful ``skimage.transform.resize`` shim —
skimage itself is not installed in this sandbox) and through
``aug.engine.augment_batch`` with matched parameters
(chaos_aug_configs.py:16-61 base chain, :63-186 strong variants), then
compares:

  * pooled intensity distributions (two-sample KS statistic) of the base
    and all four strong-variant outputs, over the crop-visible region;
  * image sharpness (gradient-magnitude distribution) — the observable for
    deviation #1 (one bilinear tap vs chained cubic resamples);
  * per-class label area fractions, label boundary density, ignored-pixel
    fraction and valid-mask coverage — the label-statistics observables;
  * elastic displacement field RMS and autocorrelation half-width at
    matched (sigma, alpha) — deviation #2 (1/8-resolution field);
  * the second-MeanStdNorm region convention — deviation #3 (distribution
    of the reference's crop-visible mean/std; ours is exactly 0/1);
  * mixup partner sourcing — deviation #4 (random dataset file vs batch
    peer), via the ColorMixup-variant KS;
  * the SimulationLowRes primitive on identical inputs and scales —
    deviation #5 (coordinate-snapped bilinear vs resize down(0)/up(3)).

CLI:  python -m pacingpseudo_tpu.tools.aug_parity --n 2000 --out AUG_PARITY.json
      [--datasets chaos acdc lvsc]

Measured per dataset: the chains differ only in the constants
(chaos_aug_configs.py:9-11 — 5 classes/256² crop; acdc_aug_configs.py:9-11 —
4 classes/224²; lvsc_aug_configs.py:9-13 — 2 classes/224²), but ACDC/LVSC
additionally feed heterogeneous slice extents through the crop/embed path,
so each dataset gets its own phantom size mix and measured bounds.

The numbers land in AUG_PARITY.json and the bounds are pinned by
tests/test_aug_parity.py (smaller N, looser thresholds).
"""
from __future__ import annotations

import argparse
import copy
import dataclasses
import json
import os
import sys
import types
from typing import Dict, List, Tuple

import numpy as np
import scipy.ndimage as ndi

REFERENCE_ROOT = "/root/reference"


@dataclasses.dataclass(frozen=True)
class ParitySpec:
    """Dataset constants + a phantom extent mix for the measurement."""
    dataset: str
    num_classes: int
    ignored: int
    crop: Tuple[int, int]
    sizes: Tuple[Tuple[int, int], ...]


SPECS = {
    # CHAOS slices are uniformly 256x256 (README.md:9); the mix still
    # exercises both RandomCrop branches via the Scaling transform.
    "chaos": ParitySpec("chaos", 5, 5, (256, 256),
                        ((256, 256), (256, 256), (224, 288), (288, 224),
                         (200, 200))),
    # ACDC/LVSC slice extents are heterogeneous (their drivers crop/embed
    # per slice, acdc_aug_configs.py:16-61, lvsc_aug_configs.py:18-63);
    # the mixes span smaller- and larger-than-crop in each axis.
    "acdc": ParitySpec("acdc", 4, 4, (224, 224),
                       ((224, 224), (256, 216), (184, 232), (288, 224),
                        (232, 184))),
    "lvsc": ParitySpec("lvsc", 2, 2, (224, 224),
                       ((224, 224), (192, 208), (256, 256), (208, 168),
                        (240, 224))),
}
CHAOS = SPECS["chaos"]

STRONG_VARIANTS = ("TransformsColor", "TransformsColorBlur",
                   "TransformsColorMixup", "TransformsColorLow")


# ---------------------------------------------------------------------------
# skimage shim — faithful to skimage.transform.resize >= 0.19, whose
# documented backend is scipy.ndimage.zoom(grid_mode=True) after an optional
# anti-aliasing Gaussian (sigma = (downscale_factor - 1) / 2, mode 'reflect'
# which maps to ndi 'mirror'), followed by clipping to the input range.
# The reference only calls resize(image, shape, order, clip=True) on float
# arrays (augmentations.py:186-187, :214-225).
# ---------------------------------------------------------------------------

def install_skimage_shim() -> None:
    if "skimage" in sys.modules:
        return

    def resize(image, output_shape, order=None, mode="reflect", cval=0.0,
               clip=True, anti_aliasing=None, **_):
        if isinstance(order, (tuple, list)):
            # Reference quirk: SimulationLowRes stores `up_order = up_order,`
            # (trailing comma -> 1-tuple, augmentations.py:173); the intended
            # interpolation order is the wrapped int.
            order = order[0]
        image = np.asarray(image, dtype=np.float64)
        factors = np.divide(image.shape, output_shape)
        ndi_mode = "mirror"  # skimage 'reflect' <-> np.pad 'reflect' <-> ndi 'mirror'
        if anti_aliasing is None:
            anti_aliasing = bool(np.any(factors > 1))
        filtered = image
        if anti_aliasing:
            sigma = np.maximum(0.0, (factors - 1.0) / 2.0)
            filtered = ndi.gaussian_filter(image, sigma, mode=ndi_mode, cval=cval)
        out = ndi.zoom(filtered, [1.0 / f for f in factors], order=order,
                       mode=ndi_mode, cval=cval, grid_mode=True)
        if clip:
            out = np.clip(out, image.min(), image.max())
        return out

    sk = types.ModuleType("skimage")
    tr = types.ModuleType("skimage.transform")
    tr.resize = resize
    sk.transform = tr
    sys.modules["skimage"] = sk
    sys.modules["skimage.transform"] = tr


def load_reference_augmentations():
    """Import the actual reference transform classes (PUBLIC UNTRUSTED
    CONTENT — executed only as the measurement baseline)."""
    install_skimage_shim()
    # Load by file path: the installed HuggingFace `datasets` package
    # shadows the reference's namespace package of the same name.
    name = "_reference_augmentations"
    if name in sys.modules:
        return sys.modules[name]
    import importlib.util
    path = os.path.join(REFERENCE_ROOT, "datasets", "augmentations.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Matched transform chains (chaos_aug_configs.py:16-61 and :63-186)
# ---------------------------------------------------------------------------

def reference_base_transforms(A, spec: ParitySpec = CHAOS):
    return [
        A.MeanStdNorm(),
        A.Scaling(scale_range=(0.7, 1.4), num_classes=spec.num_classes,
                  image_scale_order=3, label_scale_order=1, p=0.2),
        A.ElasticTransform(sigma_range=(9., 13.), alpha_range=(0., 200.),
                           img_order=3, lab_order=0, mode="nearest",
                           clip=True, p=0.2),
        A.RandomRotation(degree_range=(-30, 30), image_interp_order=3,
                         image_padding_val=0, label_interp_order=0,
                         label_padding_val=spec.ignored, p=0.2),
        A.Mirroring(axis=0, p=0.5),
        A.Mirroring(axis=1, p=0.5),
        A.GaussianNoise(noise_scale_range=(0, 0.1), p=0.15),
        A.MeanStdNorm(),
        A.RandomCrop(crop_size=spec.crop, image_padding_value=0,
                     label_padding_value=spec.ignored, p=1.),
    ]


def reference_strong_transforms(A, variant: str, strength: float = 1.0):
    s = strength * 0.8
    color = [
        A.Brightness(scale_range=(-s, s), p=0.8),
        A.Contrast(scale_range=(max(0., 1 - s), 1 + s), p=0.8),
        A.GammaAugmentation(gamma_range=(max(0., 1 - s), 1 + s),
                            retain_stats=True, invert_data=False, p=0.8),
    ]
    if variant == "TransformsColor":
        return color
    if variant == "TransformsColorBlur":
        return color + [A.GaussianBlur(kernel_scale_range=(1, 1.5), p=0.8)]
    if variant == "TransformsColorMixup":
        return color + [A.Mixup(lam_range=(0.8, 1.), p=0.8)]
    if variant == "TransformsColorLow":
        return color + [A.SimulationLowRes(downscale_range=(1.5, 2),
                                           down_order=0, up_order=3, p=0.8)]
    raise ValueError(variant)


# ---------------------------------------------------------------------------
# Sample generation + the two pipelines
# ---------------------------------------------------------------------------

def gen_samples(n: int, seed: int, spec: ParitySpec = CHAOS):
    """Phantom slices over the spec's size mix (crop AND embed paths)."""
    from pacingpseudo_tpu.data.synthetic import make_phantom
    from pacingpseudo_tpu.tools.scribbles import generate_scribble
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        size = spec.sizes[i % len(spec.sizes)]
        img, lab = make_phantom(rng, size, spec.num_classes)
        scb = generate_scribble(lab, spec.num_classes, spec.ignored)
        out.append((img.astype(np.float32), lab.astype(np.float32),
                    scb.astype(np.float32)))
    return out


def run_reference(samples, variant: str, seed: int, mixup_dir: str = None,
                  spec: ParitySpec = CHAOS):
    """The reference host chain exactly as CHAOSTwoStream.__getitem__ applies
    it (chaos_dataset.py:58-90): base list, then strong list on a deepcopy."""
    A = load_reference_augmentations()
    base_ts = reference_base_transforms(A, spec)
    strong_ts = reference_strong_transforms(A, variant)

    file_ls = None
    if any(isinstance(t, A.Mixup) for t in strong_ts):
        assert mixup_dir is not None
        os.makedirs(mixup_dir, exist_ok=True)
        file_ls = []
        # crop-sized files only: Mixup.center_crop (augmentations.py:76-81)
        # wraps around on sources smaller than the crop — feed it only
        # crop-shaped files (in the reference every CHAOS file is exactly
        # 256x256; for acdc/lvsc this matches the safe subset).
        pool = [im for im, _, _ in samples if im.shape == spec.crop][:64]
        for i, img in enumerate(pool):
            p = os.path.join(mixup_dir, f"mix{i:03d}.npz")
            if not os.path.exists(p):
                np.savez(p, img=img)
            file_ls.append(p)

    np.random.seed(seed)
    out = {"image": [], "label": [], "scribble": [], "valid_mask": [],
           "image_strong": []}
    for img, lab, scb in samples:
        d = {"image": img.copy(), "label": lab.copy(), "scribble": scb.copy()}
        for t in base_ts:
            d = t(d)
        ds = copy.deepcopy(d)
        for t in strong_ts:
            ds = t(ds, file_ls) if isinstance(t, A.Mixup) else t(ds)
        out["image"].append(np.asarray(d["image"], np.float32))
        out["label"].append(np.asarray(d["label"], np.float32))
        out["scribble"].append(np.asarray(d["scribble"], np.float32))
        out["valid_mask"].append(np.asarray(d["valid_mask"], np.float32))
        out["image_strong"].append(np.asarray(ds["image"], np.float32))
    return {k: np.stack(v) for k, v in out.items()}


def run_ours(samples, variant: str, seed: int, batch: int = 64,
             spec: ParitySpec = CHAOS):
    """The on-device engine with matched parameters, on the CPU backend."""
    import jax
    import jax.numpy as jnp
    from pacingpseudo_tpu.aug.engine import make_train_augment_fn
    from pacingpseudo_tpu.aug.presets import base_params_for, strong_params_for

    bp = base_params_for(spec.dataset)
    sp = strong_params_for(variant)
    fn = jax.jit(make_train_augment_fn(bp, sp, do_strong=True))

    canvas = max(max(im.shape) for im, _, _ in samples)
    canvas = int(np.ceil(canvas / 32) * 32)

    def pad(x, fill):
        c = np.full((canvas, canvas), fill, np.float32)
        c[: x.shape[0], : x.shape[1]] = x
        return c

    key = jax.random.PRNGKey(seed)
    out = {"image": [], "label": [], "scribble": [], "valid_mask": [],
           "image_strong": []}
    for i in range(0, len(samples), batch):
        chunk = samples[i: i + batch]
        if len(chunk) < batch:  # static shapes: pad the tail, trim after
            chunk = chunk + [chunk[-1]] * (batch - len(chunk))
        raw = {
            "image": jnp.asarray(np.stack([pad(im, 0.0) for im, _, _ in chunk])),
            "label": jnp.asarray(np.stack([pad(la, spec.ignored) for _, la, _ in chunk])),
            "scribble": jnp.asarray(np.stack([pad(sc, spec.ignored) for _, _, sc in chunk])),
            "size": jnp.asarray(np.stack([np.asarray(im.shape, np.int32)
                                          for im, _, _ in chunk])),
        }
        key, sub = jax.random.split(key)
        b = jax.device_get(fn(raw, sub))
        n_real = min(batch, len(samples) - i)
        # one-hot -> hard labels (all-zero rows are ignored pixels)
        lab_oh = b["label"][:n_real]
        lab = np.where(lab_oh.sum(-1) > 0, lab_oh.argmax(-1), spec.ignored)
        scb = b["scribble"][:n_real].argmax(-1)
        out["image"].append(b["image"][:n_real, ..., 0])
        out["label"].append(lab.astype(np.float32))
        out["scribble"].append(scb.astype(np.float32))
        out["valid_mask"].append(b["valid_mask"][:n_real, ..., 0])
        out["image_strong"].append(b["image_strong"][:n_real, ..., 0])
    return {k: np.concatenate(v) for k, v in out.items()}


# ---------------------------------------------------------------------------
# Statistics
# ---------------------------------------------------------------------------

def ks_distance(a: np.ndarray, b: np.ndarray, max_points: int = 500_000,
                seed: int = 0) -> float:
    """Two-sample Kolmogorov–Smirnov statistic (sup |ECDF_a - ECDF_b|)."""
    rng = np.random.RandomState(seed)
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    if a.size > max_points:
        a = a[rng.choice(a.size, max_points, replace=False)]
    if b.size > max_points:
        b = b[rng.choice(b.size, max_points, replace=False)]
    grid = np.sort(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), grid, side="right") / a.size
    cb = np.searchsorted(np.sort(b), grid, side="right") / b.size
    return float(np.max(np.abs(ca - cb)))


def grad_mag(images: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Gradient magnitudes over interior valid pixels (sharpness proxy)."""
    gy = images[:, 1:, :-1] - images[:, :-1, :-1]
    gx = images[:, :-1, 1:] - images[:, :-1, :-1]
    g = np.sqrt(gy ** 2 + gx ** 2)
    v = (valid[:, 1:, :-1] * valid[:, :-1, :-1] * valid[:, :-1, 1:]) > 0
    return g[v]


def label_statistics(labels: np.ndarray, valid: np.ndarray,
                     spec: ParitySpec = CHAOS) -> Dict[str, object]:
    nc, ign = spec.num_classes, spec.ignored
    area = [float(np.mean((labels == c) & (valid > 0))) for c in range(nc)]
    ignored_frac = float(np.mean(labels == ign))
    dh = (labels[:, :, 1:] != labels[:, :, :-1])
    dv = (labels[:, 1:, :] != labels[:, :-1, :])
    live_h = (labels[:, :, 1:] != ign) & (labels[:, :, :-1] != ign)
    live_v = (labels[:, 1:, :] != ign) & (labels[:, :-1, :] != ign)
    boundary = float((np.sum(dh & live_h) + np.sum(dv & live_v)) / labels.shape[0])
    return {"class_area": area, "ignored_frac": ignored_frac,
            "boundary_px_per_sample": boundary,
            "valid_coverage": float(np.mean(valid > 0))}


def _masked(images, valid):
    return images[valid > 0]


# ---------------------------------------------------------------------------
# Isolated deviation measurements
# ---------------------------------------------------------------------------

def measure_elastic_field(n: int = 64, sigma: float = 11.0,
                          alpha: float = 200.0, size: int = 256,
                          seed: int = 0) -> Dict[str, float]:
    """Deviation #2: full-res scipy field (augmentations.py:264-265) vs the
    engine's 1/8-resolution band-limited field (engine.py:187-194), matched
    (sigma, alpha).  Compares RMS displacement and the autocorrelation
    half-width (the lag where the normalized autocovariance falls below 0.5).
    """
    import jax
    from pacingpseudo_tpu.aug.engine import make_elastic_field
    from pacingpseudo_tpu.aug.params import BaseAugParams

    rng = np.random.RandomState(seed)
    ref_fields = np.stack([
        ndi.gaussian_filter(rng.rand(size, size) * 2 - 1, sigma) * alpha
        for _ in range(n)])

    dflt = BaseAugParams()
    ds = dflt.elastic_field_downscale

    @jax.jit
    def one(key):
        return make_elastic_field(key, size, size, sigma, alpha, ds,
                                  dflt.elastic_blur_radius)

    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    our_fields = np.stack([np.asarray(one(k)) for k in keys])

    def rms(f):
        return float(np.sqrt(np.mean(f ** 2)))

    def corr_halfwidth(fields):
        # normalized autocovariance along x, averaged over rows/samples
        f = fields - fields.mean(axis=(1, 2), keepdims=True)
        num = []
        for lag in range(0, size // 2):
            c = np.mean(f[:, :, : size - lag] * f[:, :, lag:])
            num.append(c)
        ac = np.asarray(num) / num[0]
        below = np.nonzero(ac < 0.5)[0]
        return float(below[0]) if below.size else float(size // 2)

    return {
        "sigma": sigma, "alpha": alpha,
        "ref_rms": rms(ref_fields), "ours_rms": rms(our_fields),
        "rms_ratio": rms(our_fields) / rms(ref_fields),
        "ref_corr_halfwidth_px": corr_halfwidth(ref_fields),
        "ours_corr_halfwidth_px": corr_halfwidth(our_fields),
    }


def measure_lowres_primitive(n: int = 32, seed: int = 0) -> Dict[str, float]:
    """Deviation #5: SimulationLowRes (augmentations.py:168-189 via the
    skimage shim) vs the engine's coordinate-snapped bilinear read
    (engine.py:305-320) on identical inputs and scales."""
    import jax
    import jax.numpy as jnp
    from pacingpseudo_tpu.data.synthetic import make_phantom
    from pacingpseudo_tpu.ops.warp import bilinear_sample

    A = load_reference_augmentations()
    rng = np.random.RandomState(seed)
    h = w = 256

    @jax.jit
    def ours(img, s):
        oy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        ox = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        cy = jnp.round(jnp.floor(oy / s) * s + (s - 1.0) / 2.0)
        cx = jnp.round(jnp.floor(ox / s) * s + (s - 1.0) / 2.0)
        return bilinear_sample(img, cy, cx)

    corrs, maes = [], []
    for i in range(n):
        img, _ = make_phantom(rng, (h, w), CHAOS.num_classes)
        img = (img - img.mean()) / (img.std() + 1e-8)
        s = float(rng.uniform(1.5, 2.0))
        lr = A.SimulationLowRes(downscale_range=(s, s), down_order=0,
                                up_order=3, p=1.0)
        ref = lr({"image": img.copy()})["image"]
        got = np.asarray(ours(jnp.asarray(img), s))
        corrs.append(float(np.corrcoef(ref.ravel(), got.ravel())[0, 1]))
        maes.append(float(np.mean(np.abs(ref - got))))
    return {"pearson_r_mean": float(np.mean(corrs)),
            "pearson_r_min": float(np.min(corrs)),
            "mae_mean": float(np.mean(maes))}


def measure_norm_region(ref_out: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Deviation #3: the reference normalizes over the full pre-crop array,
    so its crop-visible region has mean != 0 / std != 1; ours is exactly
    0/1 by construction.  Reports the reference's residual distribution."""
    means, stds = [], []
    for img, v in zip(ref_out["image"], ref_out["valid_mask"]):
        px = img[v > 0]
        means.append(float(px.mean()))
        stds.append(float(px.std()))
    means, stds = np.abs(np.asarray(means)), np.asarray(stds)
    return {
        "ref_abs_mean_p50": float(np.percentile(means, 50)),
        "ref_abs_mean_p95": float(np.percentile(means, 95)),
        "ref_std_p50": float(np.percentile(stds, 50)),
        "ref_std_p05": float(np.percentile(stds, 5)),
        "ref_std_p95": float(np.percentile(stds, 95)),
    }


def geometry_only_comparison(n: int, seed: int,
                             spec: ParitySpec = CHAOS) -> Dict[str, float]:
    """Deviation #1 isolated: geometric transforms forced on (p=1 for
    Scaling/Elastic/Rotation), noise off — the resample-order difference is
    the only systematic one left.  KS on intensities and on gradient
    magnitudes (accumulated-blur observable)."""
    A = load_reference_augmentations()
    samples = gen_samples(n, seed + 1, spec)

    base_ts = [
        A.MeanStdNorm(),
        A.Scaling(scale_range=(0.7, 1.4), num_classes=spec.num_classes,
                  image_scale_order=3, label_scale_order=1, p=1.0),
        A.ElasticTransform(sigma_range=(9., 13.), alpha_range=(0., 200.),
                           img_order=3, lab_order=0, mode="nearest",
                           clip=True, p=1.0),
        A.RandomRotation(degree_range=(-30, 30), image_interp_order=3,
                         image_padding_val=0, label_interp_order=0,
                         label_padding_val=spec.ignored, p=1.0),
        A.MeanStdNorm(),
        A.RandomCrop(crop_size=spec.crop, image_padding_value=0,
                     label_padding_value=spec.ignored, p=1.),
    ]
    np.random.seed(seed)
    ref_img, ref_v = [], []
    for img, lab, scb in samples:
        d = {"image": img.copy(), "label": lab.copy(), "scribble": scb.copy()}
        for t in base_ts:
            d = t(d)
        ref_img.append(np.asarray(d["image"], np.float32))
        ref_v.append(np.asarray(d["valid_mask"], np.float32))
    ref_img, ref_v = np.stack(ref_img), np.stack(ref_v)

    import jax
    import jax.numpy as jnp
    from pacingpseudo_tpu.aug.engine import augment_batch
    from pacingpseudo_tpu.aug.presets import base_params_for
    bp = dataclasses.replace(base_params_for(spec.dataset), p_scale=1.0,
                             p_elastic=1.0, p_rotate=1.0, p_mirror_y=0.0,
                             p_mirror_x=0.0, p_noise=0.0)
    our = run_ours_with_params(samples, bp, seed)

    return {
        "image_ks": ks_distance(_masked(ref_img, ref_v),
                                _masked(our["image"], our["valid_mask"])),
        "gradmag_ks": ks_distance(grad_mag(ref_img, ref_v),
                                  grad_mag(our["image"], our["valid_mask"])),
        "ref_gradmag_mean": float(np.mean(grad_mag(ref_img, ref_v))),
        "ours_gradmag_mean": float(np.mean(grad_mag(our["image"],
                                                    our["valid_mask"]))),
    }


def run_ours_with_params(samples, base_params, seed: int, batch: int = 64):
    """Base-only engine run with explicit params (no strong stream)."""
    import jax
    import jax.numpy as jnp
    from pacingpseudo_tpu.aug.engine import augment_batch

    canvas = max(max(im.shape) for im, _, _ in samples)
    canvas = int(np.ceil(canvas / 32) * 32)

    def pad(x, fill):
        c = np.full((canvas, canvas), fill, np.float32)
        c[: x.shape[0], : x.shape[1]] = x
        return c

    key = jax.random.PRNGKey(seed)
    images, valids = [], []
    for i in range(0, len(samples), batch):
        chunk = samples[i: i + batch]
        n_real = len(chunk)
        if len(chunk) < batch:
            chunk = chunk + [chunk[-1]] * (batch - len(chunk))
        raw = {
            "image": jnp.asarray(np.stack([pad(im, 0.0) for im, _, _ in chunk])),
            "label": jnp.asarray(np.stack([pad(la, base_params.ignored_index)
                                           for _, la, _ in chunk])),
            "scribble": jnp.asarray(np.stack([pad(sc, base_params.ignored_index)
                                              for _, _, sc in chunk])),
            "size": jnp.asarray(np.stack([np.asarray(im.shape, np.int32)
                                          for im, _, _ in chunk])),
        }
        key, sub = jax.random.split(key)
        b = jax.device_get(augment_batch(raw, sub, base_params))
        images.append(b["image"][:n_real, ..., 0])
        valids.append(b["valid_mask"][:n_real, ..., 0])
    return {"image": np.concatenate(images), "valid_mask": np.concatenate(valids)}


# ---------------------------------------------------------------------------
# Report
# ---------------------------------------------------------------------------

def build_dataset_report(n: int, seed: int, spec: ParitySpec,
                         workdir: str) -> Dict[str, object]:
    samples = gen_samples(n, seed, spec)
    report: Dict[str, object] = {}

    variants: Dict[str, object] = {}
    for variant in STRONG_VARIANTS:
        ref = run_reference(samples, variant, seed + 10,
                            mixup_dir=os.path.join(workdir,
                                                   f"mixup_{spec.dataset}"),
                            spec=spec)
        ours = run_ours(samples, variant, seed + 20, spec=spec)
        ref_px = _masked(ref["image"], ref["valid_mask"])
        our_px = _masked(ours["image"], ours["valid_mask"])
        entry = {
            "strong_image_ks": ks_distance(
                _masked(ref["image_strong"], ref["valid_mask"]),
                _masked(ours["image_strong"], ours["valid_mask"])),
        }
        if variant == STRONG_VARIANTS[0]:
            entry.update({
                "base_image_ks": ks_distance(ref_px, our_px),
                "base_gradmag_ks": ks_distance(
                    grad_mag(ref["image"], ref["valid_mask"]),
                    grad_mag(ours["image"], ours["valid_mask"])),
                "ref_labels": label_statistics(ref["label"], ref["valid_mask"], spec),
                "ours_labels": label_statistics(ours["label"], ours["valid_mask"], spec),
                "ref_scribbles": label_statistics(ref["scribble"], ref["valid_mask"], spec),
                "ours_scribbles": label_statistics(ours["scribble"], ours["valid_mask"], spec),
                "norm_region": measure_norm_region(ref),
            })
        variants[variant] = entry
    report["variants"] = variants

    report["geometry_only"] = geometry_only_comparison(
        max(n // 4, 64), seed + 30, spec)
    report["elastic_field"] = {
        f"sigma{int(s)}": measure_elastic_field(sigma=s, seed=seed + 40,
                                                size=spec.crop[0])
        for s in (9.0, 11.0, 13.0)
    }
    return report


def build_report(n: int = 2000, seed: int = 0,
                 workdir: str = "/tmp/aug_parity",
                 datasets: Tuple[str, ...] = ("chaos", "acdc", "lvsc")
                 ) -> Dict[str, object]:
    report: Dict[str, object] = {"n": n, "seed": seed}
    for ds in datasets:
        report[ds] = build_dataset_report(n, seed, SPECS[ds], workdir)
    # dataset-independent primitive (identical inputs, fixed 256 canvas)
    report["lowres_primitive"] = measure_lowres_primitive(seed=seed + 50)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="AUG_PARITY.json")
    ap.add_argument("--datasets", nargs="+", default=["chaos", "acdc", "lvsc"],
                    choices=list(SPECS))
    args = ap.parse_args(argv)

    report = build_report(args.n, args.seed, datasets=tuple(args.datasets))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    # The sandbox's sitecustomize pins jax_platforms='axon,cpu'
    # programmatically; pin CPU back before any op runs — this harness
    # must not claim the TPU chip (see .claude/skills/verify/SKILL.md).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    main()
