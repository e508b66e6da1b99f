"""Tests for tools/study_summary (three-arm study table renderer)."""
import json
import os

import numpy as np

from pacingpseudo_tpu.tools.study_summary import (
    per_slice_dice, render_table, summarise_arm)


def _write_arm(root, arm, dice, uids, valdice):
    rd = os.path.join(root, arm, "run-fold0")
    os.makedirs(rd, exist_ok=True)
    np.savez(os.path.join(rd, "valdice.npz"), valdice=valdice)
    od = os.path.join(root, arm, "outputs", "Inference", "chaost1",
                      "run-fold0")
    os.makedirs(od, exist_ok=True)
    np.savez(os.path.join(od, "eval_data.npz"), dicearr=dice,
             hd95arr=np.full_like(dice, 5.0), uids=np.array(uids))


def test_summarise_arm_and_table(tmp_path):
    root = str(tmp_path)
    dice = np.array([
        [0.9, 0.5, np.nan],
        [0.9, 0.7, 0.4],
        [0.9, 0.1, 0.2],
    ], np.float32)
    uids = ["patA_slice000", "patA_slice001", "patB_slice000"]
    vd = np.array([0.1, 0.4, 0.2, np.nan])
    _write_arm(root, "Control", dice, uids, vd)

    r = summarise_arm(root, "Control", "chaost1")
    assert r["best_val_dice"] == np.float32(0.4) and r["best_epoch"] == 1
    assert r["n_slices"] == 3 and r["n_patients"] == 2
    # per-slice: rows -> 0.5, 0.55, 0.15 -> 0.4
    assert np.isclose(r["test_dice_slice"], 0.4)
    # per-patient (README.md:106): c1 {A:0.6,B:0.1}->0.35; c2 {A:0.4,B:0.2}->0.3
    assert np.isclose(r["test_dice_patient"], 0.325)

    table = render_table([r, {"arm": "Experiment"}])
    assert "| Control | 0.4000 (1) | 0.4000 | 0.3250 | 5.0 |" in table
    assert "| Experiment | — | — | — | — |" in table


def test_per_slice_dice_all_nan_class():
    dice = np.array([[0.9, np.nan, 0.5]], np.float32)
    assert np.isclose(per_slice_dice(dice), 0.5)
