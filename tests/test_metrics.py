"""Dice / HD95 metric tests (reference: utils/metrics.py, inference.py:196-258)."""
import numpy as np
import pytest

from pacingpseudo_tpu.evals import (
    compute_dice,
    compute_dice_hard,
    dice_per_class_jax,
    hd,
    hd95,
)
from pacingpseudo_tpu.evals.hd import compute_95hd


def _sample(rng, n=1, h=16, w=16, c=4):
    logits = rng.randn(n, h, w, c).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    hard = rng.randint(0, c, size=(n, h, w))
    one_hot = np.eye(c, dtype=np.float32)[hard]
    return probs, one_hot


def test_dice_numpy_vs_jax(rng):
    probs, one_hot = _sample(rng, n=3)
    jax_dice = np.asarray(dice_per_class_jax(probs, one_hot))
    for i in range(3):
        np_dice = compute_dice(probs[i], one_hot[i])
        assert np.allclose(jax_dice[i], np_dice, atol=1e-5, equal_nan=True)


def test_dice_nan_when_both_empty(rng):
    # class 3 never predicted nor present
    probs = np.zeros((1, 8, 8, 4), np.float32)
    probs[..., 0] = 1.0
    one_hot = np.zeros((1, 8, 8, 4), np.float32)
    one_hot[..., 0] = 1.0
    d = np.asarray(dice_per_class_jax(probs, one_hot))[0]
    assert np.allclose(d[0], 1.0, atol=1e-3)
    assert np.isnan(d[1]) and np.isnan(d[2]) and np.isnan(d[3])


def test_dice_hard_matches_soft_argmax(rng):
    probs, one_hot = _sample(rng)
    hard = probs[0].argmax(-1)
    label = one_hot[0].argmax(-1)
    a = compute_dice_hard(hard, label, 4)
    b = compute_dice(probs[0], one_hot[0])
    # same NaN pattern; values differ only in the eps convention
    assert np.allclose(a, b, atol=1e-3, equal_nan=True)


def test_hd95_identical_masks_zero():
    m = np.zeros((32, 32), bool)
    m[8:20, 8:20] = True
    assert hd95(m, m, (1.0, 1.0), 1) == 0.0
    assert hd(m, m, (1.0, 1.0), 1) == 0.0


def test_hd_translated_square():
    a = np.zeros((64, 64), bool)
    b = np.zeros((64, 64), bool)
    a[10:20, 10:20] = True
    b[10:20, 15:25] = True  # shifted 5 px in x
    assert np.isclose(hd(a, b, (1.0, 1.0), 1), 5.0)
    # spacing scales distances
    assert np.isclose(hd(a, b, (1.0, 2.0), 1), 10.0)


def test_hd95_leq_hd(rng):
    a = rng.rand(48, 48) > 0.6
    b = rng.rand(48, 48) > 0.6
    if a.any() and b.any():
        assert hd95(a, b, (1.62, 1.62), 1) <= hd(a, b, (1.62, 1.62), 1) + 1e-9


def test_compute_95hd_nan_gating():
    pred = np.zeros((16, 16), np.int64)   # all class 0 => class0 full, class1 empty
    label = np.zeros((16, 16), np.int64)
    label[4:8, 4:8] = 1
    out = compute_95hd(pred, label, 2, (1.0, 1.0))
    assert np.isnan(out[0])   # pred full for class 0
    assert np.isnan(out[1])   # pred empty for class 1


def test_hd95_brute_force_small(rng):
    """Cross-check the EDT implementation against an O(n^2) brute force."""
    a = np.zeros((24, 24), bool)
    b = np.zeros((24, 24), bool)
    a[5:12, 4:15] = True
    b[8:18, 9:20] = True
    spacing = (1.5, 0.7)

    def border(m):
        from scipy import ndimage
        fp = ndimage.generate_binary_structure(2, 1)
        return m ^ ndimage.binary_erosion(m, structure=fp, iterations=1)

    def directed(m1, m2):
        p1 = np.argwhere(border(m1)) * np.asarray(spacing)
        p2 = np.argwhere(border(m2)) * np.asarray(spacing)
        d = np.sqrt(((p1[:, None, :] - p2[None, :, :]) ** 2).sum(-1))
        return d.min(axis=1)

    expect = np.percentile(np.hstack([directed(a, b), directed(b, a)]), 95)
    got = hd95(a, b, spacing, 1)
    assert np.isclose(got, expect, rtol=1e-6)


def test_per_patient_aggregation():
    """Published protocol (README.md:106): per class, mean over each
    patient's slices (NaN-skipping), then mean over patients, then mean of
    classes 1..C-1."""
    from pacingpseudo_tpu.evals.infer import aggregate_per_patient, patient_key

    uids = ["patA_slice000", "patA_slice001", "patB_slice000"]
    arr = np.array([
        [0.9, 0.5, np.nan],
        [0.9, 0.7, 0.4],
        [0.9, 0.1, 0.2],
    ], np.float32)
    r = aggregate_per_patient(uids, arr, num_classes=3)
    # class1: patA=(0.5+0.7)/2=0.6, patB=0.1 -> 0.35
    # class2: patA=0.4 (NaN skipped), patB=0.2 -> 0.3
    assert r["num_patients"] == 2
    assert np.isclose(r["class_means"][1], 0.35)
    assert np.isclose(r["class_means"][2], 0.30)
    assert np.isclose(r["overall"], 0.325)

    # default key = first underscore token; regex override wins
    assert patient_key("patient001_frame01_slice05") == "patient001"
    assert patient_key("SC-HF-I-01_sl3") == "SC-HF-I-01"
    assert patient_key("p01s05", r"^(p\d+)s\d+$") == "p01"
    # no separator -> own group (per-slice fallback)
    assert patient_key("syn0042") == "syn0042"
