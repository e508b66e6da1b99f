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
    _write(hunt / "jag_full_s1.json",
           {"torch_control": {"best_val_dice": 0.60}})
    _write(hunt / "jag_fulljax_s1.json",
           {"jax_control": {"best_val_dice": 0.63}})
    # seed 2 missing its jax half -> not paired
    _write(hunt / "jag_full_s2.json",
           {"torch_control": {"best_val_dice": 0.10}})
    _write(abl / "ctrlq_s1.json",
           {"torch_control": {"best_val_dice": 0.58},
            "jax_control": {"best_val_dice": 0.58}})

    base = collect_baseline(str(hunt))
    assert base == [(1, 0.60, 0.63)]
    axis = collect_axis(str(abl), "ctrlq")
    assert axis == [(1, 0.58, 0.58)]

    out = main(["--root", str(hunt), "--ablation_root", str(abl)])
    assert abs(out["baseline (quirk on, wd 3e-4)"]["delta_mean"] - 0.03) < 1e-9
    assert out["eval-quirk OFF"]["delta_mean"] == 0.0
