"""Measured augmentation parity vs the actual reference transform chain.

Pins bounds on every PARITY.md statistical deviation by running the real
reference transform objects (/root/reference/datasets/augmentations.py via
the documented skimage shim) against ``aug.engine`` with matched CHAOS
parameters (chaos_aug_configs.py:16-61).  The full-N numbers live in
AUG_PARITY.json (python -m pacingpseudo_tpu.tools.aug_parity); these tests
re-measure at a smaller N with ~2.5x headroom on the thresholds.
"""
import numpy as np
import pytest

from pacingpseudo_tpu.tools import aug_parity as ap


@pytest.fixture(scope="module")
def samples():
    return ap.gen_samples(96, seed=0)


@pytest.fixture(scope="module")
def composite(samples, tmp_path_factory):
    """Reference vs engine outputs for the full base + TransformsColor chain."""
    mixup_dir = str(tmp_path_factory.mktemp("mixup"))
    ref = ap.run_reference(samples, "TransformsColor", seed=10,
                           mixup_dir=mixup_dir)
    ours = ap.run_ours(samples, "TransformsColor", seed=20)
    return ref, ours


def test_base_intensity_distribution(composite):
    ref, ours = composite
    ks = ap.ks_distance(ref["image"][ref["valid_mask"] > 0],
                        ours["image"][ours["valid_mask"] > 0])
    assert ks < 0.10, f"base image KS {ks:.3f}"


def test_base_sharpness_distribution(composite):
    # deviation #1 observable (single bilinear tap vs chained cubic)
    ref, ours = composite
    ks = ap.ks_distance(ap.grad_mag(ref["image"], ref["valid_mask"]),
                        ap.grad_mag(ours["image"], ours["valid_mask"]))
    assert ks < 0.17, f"gradient-magnitude KS {ks:.3f}"


def test_strong_intensity_distribution(composite):
    ref, ours = composite
    ks = ap.ks_distance(ref["image_strong"][ref["valid_mask"] > 0],
                        ours["image_strong"][ours["valid_mask"] > 0])
    assert ks < 0.10, f"strong image KS {ks:.3f}"


def test_label_statistics(composite):
    ref, ours = composite
    rs = ap.label_statistics(ref["label"], ref["valid_mask"])
    os_ = ap.label_statistics(ours["label"], ours["valid_mask"])
    fg_ref = sum(rs["class_area"][1:])
    fg_ours = sum(os_["class_area"][1:])
    assert abs(fg_ours - fg_ref) / fg_ref < 0.10, (fg_ref, fg_ours)
    assert abs(os_["ignored_frac"] - rs["ignored_frac"]) < 0.03
    assert abs(os_["valid_coverage"] - rs["valid_coverage"]) < 0.04
    ratio = os_["boundary_px_per_sample"] / rs["boundary_px_per_sample"]
    assert 0.8 < ratio < 1.2, f"boundary density ratio {ratio:.3f}"


def test_scribble_statistics(composite):
    ref, ours = composite
    rs = ap.label_statistics(ref["scribble"], ref["valid_mask"])
    os_ = ap.label_statistics(ours["scribble"], ours["valid_mask"])
    fg_ref = sum(rs["class_area"][1:])
    fg_ours = sum(os_["class_area"][1:])
    assert abs(fg_ours - fg_ref) / max(fg_ref, 1e-9) < 0.20, (fg_ref, fg_ours)


def test_norm_region_residual(composite):
    # deviation #3: reference's crop-visible region retains |mean| residual;
    # ours is 0/1 by construction — bound the reference residual we differ by.
    ref, _ = composite
    r = ap.measure_norm_region(ref)
    assert r["ref_abs_mean_p50"] < 0.05
    assert r["ref_abs_mean_p95"] < 0.40
    assert 0.9 < r["ref_std_p50"] < 1.1


def test_elastic_field_statistics():
    # deviation #2: 1/8-res band-limited field vs full-res scipy field.
    # The closed-form amplitude calibration (engine.elastic_amplitude_
    # correction) lands the full-N RMS ratio at 0.999/1.000/1.002 for
    # sigma 9/11/13 (AUG_PARITY.json); bound with small-N headroom.
    for sigma in (9.0, 13.0):
        r = ap.measure_elastic_field(n=24, sigma=sigma, alpha=200.0, seed=3)
        assert 0.96 < r["rms_ratio"] < 1.04, r
        assert abs(r["ours_corr_halfwidth_px"] - r["ref_corr_halfwidth_px"]) <= 4, r


def test_lowres_primitive():
    # deviation #5: snapped-bilinear vs resize down(0, anti-aliased)/up(3)
    r = ap.measure_lowres_primitive(n=12, seed=4)
    assert r["pearson_r_mean"] > 0.90, r
    assert r["mae_mean"] < 0.35, r


@pytest.mark.parametrize("dataset", ["acdc", "lvsc"])
def test_dataset_chain_parity(dataset, tmp_path_factory):
    """ACDC/LVSC chains (224² crops, heterogeneous extents, 4-/2-class
    stats — acdc_aug_configs.py:16-61, lvsc_aug_configs.py:18-63) measured
    like the CHAOS composite; full-N numbers live in AUG_PARITY.json."""
    spec = ap.SPECS[dataset]
    samples = ap.gen_samples(80, seed=0, spec=spec)
    mixup_dir = str(tmp_path_factory.mktemp(f"mix_{dataset}"))
    ref = ap.run_reference(samples, "TransformsColor", seed=10,
                           mixup_dir=mixup_dir, spec=spec)
    ours = ap.run_ours(samples, "TransformsColor", seed=20, spec=spec)
    ks = ap.ks_distance(ref["image"][ref["valid_mask"] > 0],
                        ours["image"][ours["valid_mask"] > 0])
    assert ks < 0.10, f"{dataset} base image KS {ks:.3f}"
    sks = ap.ks_distance(ref["image_strong"][ref["valid_mask"] > 0],
                         ours["image_strong"][ours["valid_mask"] > 0])
    assert sks < 0.12, f"{dataset} strong image KS {sks:.3f}"
    rs = ap.label_statistics(ref["label"], ref["valid_mask"], spec)
    os_ = ap.label_statistics(ours["label"], ours["valid_mask"], spec)
    fg_ref = sum(rs["class_area"][1:])
    fg_ours = sum(os_["class_area"][1:])
    assert abs(fg_ours - fg_ref) / fg_ref < 0.12, (fg_ref, fg_ours)
    assert abs(os_["ignored_frac"] - rs["ignored_frac"]) < 0.03
    assert abs(os_["valid_coverage"] - rs["valid_coverage"]) < 0.04


def test_mixup_variant_distribution(samples, tmp_path_factory):
    # deviation #4: random-file partner vs batch-peer partner
    mixup_dir = str(tmp_path_factory.mktemp("mixup2"))
    ref = ap.run_reference(samples[:64], "TransformsColorMixup", seed=11,
                           mixup_dir=mixup_dir)
    ours = ap.run_ours(samples[:64], "TransformsColorMixup", seed=21)
    ks = ap.ks_distance(ref["image_strong"][ref["valid_mask"] > 0],
                        ours["image_strong"][ours["valid_mask"] > 0])
    assert ks < 0.12, f"mixup strong KS {ks:.3f}"
