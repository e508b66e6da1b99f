"""hunt_summary aggregation/picker tests (no training involved)."""
import json
import os

from pacingpseudo_tpu.tools import hunt_summary


def _write(root, name, seed, diff, ratio, vg, arms):
    r = {"_config": {"epochs": 80, "n_train": 96, "n_val": 48, "batch": 8,
                     "seed": seed, "difficulty": diff,
                     "scribble_ratio": ratio, "val_gamma": vg}}
    for arm, best in arms.items():
        r[arm] = {"best_val_dice": best, "best_epoch": 10,
                  "final_val_dice": best - 0.01, "curve": [], "minutes": 1.0}
    with open(os.path.join(root, f"{name}_s{seed}.json"), "w") as f:
        json.dump(r, f)


def test_merge_seeds_and_arms_and_pick(tmp_path):
    root = str(tmp_path)
    # Config A: clear torch gap, two seeds + a separate jax-arms file that
    # must MERGE into the same (config, seed) cell.
    _write(root, "a", 1, "jagged", 0.3, 1.0,
           {"torch_control": 0.40, "torch_pacing": 0.50})
    _write(root, "ajax", 1, "jagged", 0.3, 1.0,
           {"jax_control": 0.41, "jax_pacing": 0.52})
    _write(root, "a", 2, "jagged", 0.3, 1.0,
           {"torch_control": 0.42, "torch_pacing": 0.48})
    # Config B: no gap.
    _write(root, "b", 1, "hard", 1.0, 1.0,
           {"torch_control": 0.60, "torch_pacing": 0.60})
    # Garbage json must be skipped, not crash.
    with open(os.path.join(root, "junk.json"), "w") as f:
        f.write("[1, 2]")

    runs = hunt_summary.load_runs(root)
    assert ("jagged", 0.3, 1.0) in runs and ("hard", 1.0, 1.0) in runs
    assert set(runs[("jagged", 0.3, 1.0)]) == {1, 2}
    # seed-1 cell carries BOTH torch and jax arms after the merge
    assert "jax_pacing" in runs[("jagged", 0.3, 1.0)][1]
    assert "torch_pacing" in runs[("jagged", 0.3, 1.0)][1]

    tbl = hunt_summary.table(runs)
    assert "jagged" in tbl and "±" in tbl  # multi-seed rows show sd

    flags, gap = hunt_summary.pick(runs, min_gap=0.02)
    assert flags == "--difficulty jagged --scribble_ratio 0.3 --val_gamma 1"
    assert abs(gap - 0.08) < 1e-9  # mean of (+0.10, +0.06)

    none_flags, _ = hunt_summary.pick(runs, min_gap=0.5)
    assert none_flags is None


def test_stat_axis(tmp_path):
    root = str(tmp_path)
    # 30-epoch curves where best and mean10+ disagree: control spikes once
    # (best 0.70) but averages 0.40; pacing is flat 0.55.
    r = {"_config": {"seed": 1, "difficulty": "jagged", "scribble_ratio": 1.0,
                     "val_gamma": 1.0},
         "torch_control": {"best_val_dice": 0.70,
                           "curve": [0.40] * 29 + [0.70]},
         "torch_pacing": {"best_val_dice": 0.55, "curve": [0.55] * 30}}
    with open(os.path.join(root, "c_s1.json"), "w") as f:
        json.dump(r, f)
    runs = hunt_summary.load_runs(root)
    # best: pacing loses by 0.15 -> no pick
    flags, _ = hunt_summary.pick(runs, min_gap=0.02, stat="best")
    assert flags is None
    # mean10+: control mean = (0.40*19 + 0.70)/20 = 0.415 -> gap +0.135
    flags, gap = hunt_summary.pick(runs, min_gap=0.02, stat="mean10+")
    assert flags is not None and abs(gap - 0.135) < 1e-9
    tbl = hunt_summary.table(runs, stat="mean10+")
    assert "statistic: mean10+" in tbl and "0.415" in tbl


def test_jaxcache_sets_config(tmp_path, monkeypatch):
    import jax

    from pacingpseudo_tpu.utils.jaxcache import enable_persistent_cache
    target = str(tmp_path / "cache")
    assert enable_persistent_cache(target) == target
    assert jax.config.jax_compilation_cache_dir == target
    monkeypatch.setenv("PACING_JAX_CACHE", "")
    assert enable_persistent_cache() == ""  # env empty string disables
