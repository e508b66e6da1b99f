"""Unit tests for tools/control_bias.py (the jax-Control-bias table)."""
import json
import os

from pacingpseudo_tpu.tools.control_bias import (
    _sign_test_p, _stats, collect_axis, collect_baseline, main)


def _write(path, payload):
    with open(path, "w") as f:
        json.dump(payload, f)


def test_sign_test():
    assert _sign_test_p([]) == 1.0
    assert _sign_test_p([0.0, 0.0]) == 1.0          # ties dropped
    assert abs(_sign_test_p([1, 1, 1]) - 0.25) < 1e-12
    assert abs(_sign_test_p([1, -1]) - 1.0) < 1e-12


def test_stats_paired():
    s = _stats([(1, 0.60, 0.62), (2, 0.50, 0.51)])
    assert s["n"] == 2
    assert abs(s["delta_mean"] - 0.015) < 1e-12
    assert s["torch_mean"] == 0.55


def test_collect_and_main(tmp_path):
    hunt = tmp_path / "hunt"
    abl = tmp_path / "ctrl"
    hunt.mkdir(); abl.mkdir()
    # 30-epoch curves: torch flat at 0.60 with one 0.70 spike; jax flat at
    # 0.61 -> best reads torch hot (+0.70 vs 0.63) while mean10+/tail20
    # read jax hot (+0.01) — exercises the statistic decomposition.
    t_curve = [0.60] * 30
    t_curve[20] = 0.70
    j_curve = [0.61] * 30
    j_curve[5] = 0.63
    _write(hunt / "jag_full_s1.json",
           {"torch_control": {"best_val_dice": 0.70, "curve": t_curve}})
    _write(hunt / "jag_fulljax_s1.json",
           {"jax_control": {"best_val_dice": 0.63, "curve": j_curve}})
    # seed 2 missing its jax half -> not paired
    _write(hunt / "jag_full_s2.json",
           {"torch_control": {"best_val_dice": 0.10}})
    # ablation file without curves -> best-only pairing
    _write(abl / "ctrlq_s1.json",
           {"torch_control": {"best_val_dice": 0.58},
            "jax_control": {"best_val_dice": 0.58}})

    base = collect_baseline(str(hunt))
    assert base == [(1, 0.70, 0.63)]
    base_m = collect_baseline(str(hunt), stat="mean10+")
    assert len(base_m) == 1
    _, tm, jm = base_m[0]
    assert abs(tm - (0.60 * 19 + 0.70) / 20) < 1e-12
    assert abs(jm - 0.61) < 1e-12
    base_t = collect_baseline(str(hunt), stat="tail20")
    assert abs(base_t[0][2] - 0.61) < 1e-12
    axis = collect_axis(str(abl), "ctrlq")
    assert axis == [(1, 0.58, 0.58)]
    # no curves in the ablation file -> curve statistics yield no pairs
    assert collect_axis(str(abl), "ctrlq", stat="mean10+") == []

    out = main(["--root", str(hunt), "--ablation_root", str(abl)])
    key = "baseline jagged (quirk on, wd 3e-4)"
    assert abs(out[key]["delta_mean"] - (-0.07)) < 1e-9
    assert abs(out[key]["mean10+"]["delta_mean"] - 0.005) < 1e-9
    # last-20 window (epochs 10..29) includes the torch spike at epoch 20
    assert abs(out[key]["tail20"]["delta_mean"] - 0.005) < 1e-9
    assert out["eval-quirk OFF"]["delta_mean"] == 0.0
    assert "mean10+" not in out["eval-quirk OFF"]
