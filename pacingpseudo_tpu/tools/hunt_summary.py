"""Summarise / pick from the pacing-wins phantom-regime hunt.

The hunt (scripts/phantom_hunt.sh) sweeps regime knobs — phantom family,
scribble shortening ratio (the reference's own ablation axis,
utils_shorten_scribble_length.py), train/test intensity shift — running
the TORCH REFERENCE ORACLE (tools/torch_reference_study.py) per
candidate.  The goal (VERDICT r4 item 2): a regime where torch pacing >
torch control by a clear margin, then show the jax build reproduces both
arms within seed noise — the strongest quality-parity evidence available
until real CHAOS/ACDC/LVSC data is mounted (the published gap is +0.26
DSC, reference README.md:114-115).

Usage:
  python -m pacingpseudo_tpu.tools.hunt_summary --root study_r4/hunt
      [--pick]        # print ONLY the winning config's CLI flags
      [--min_gap G]   # pick gate (default 0.02 DSC)
      [--stat S]      # best | mean10+ | tail20 (default: all tables,
                      #   pick on best for back-compat)

Round-5 addendum: ``best_val_dice`` is an upward-biased extreme-value
statistic on the noisy Control curves (see tools/control_bias.py), so the
table renders under the robust trajectory statistics too — in the jagged
regime the torch pacing-vs-control gap is +0.032 (4/5 seeds) at best but
+0.270 (5/5 seeds) at mean-of-epochs-10+: pacing stabilises trajectories
that Control repeatedly collapses.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np

from pacingpseudo_tpu.tools.control_bias import STATS


def load_runs(root: str):
    """{config_key: {seed: results_dict}} from <root>/*.json."""
    runs: dict = defaultdict(dict)
    for path in sorted(glob.glob(os.path.join(root, "*.json"))):
        try:
            with open(path) as f:
                r = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(r, dict) or "_config" not in r:
            continue  # not a torch_reference_study artifact
        cfg = r.get("_config", {})
        key = (cfg.get("difficulty", "hard"),
               float(cfg.get("scribble_ratio", 1.0)),
               float(cfg.get("val_gamma", 1.0)))
        seed = int(cfg.get("seed", 0))
        if seed in runs[key]:  # merge arms from separate invocations
            runs[key][seed].update(
                {k: v for k, v in r.items() if k != "_config"})
        else:
            runs[key][seed] = {k: v for k, v in r.items() if k != "_config"}
    return runs


def _best(r, arm, stat="best"):
    a = r.get(arm)
    if not a:
        return np.nan
    v = STATS[stat](a)
    return np.nan if v is None else v


def table(runs, stat="best") -> str:
    lines = [f"| difficulty | ratio | val_gamma | seeds | torch ctrl | "
             f"torch pace | torch gap | jax ctrl | jax pace | jax gap |"
             f"  <!-- statistic: {stat} -->",
             "|---|---|---|---|---|---|---|---|---|---|"]
    for key in sorted(runs):
        diff, ratio, vg = key
        per_seed = runs[key]
        seeds = sorted(per_seed)

        def agg(arm):
            vals = [_best(per_seed[s], arm, stat) for s in seeds]
            vals = [v for v in vals if np.isfinite(v)]
            if not vals:
                return "—", np.nan
            m = float(np.mean(vals))
            sd = float(np.std(vals))
            return (f"{m:.3f}±{sd:.3f}" if len(vals) > 1 else f"{m:.3f}"), m

        tc_s, tc = agg("torch_control")
        tp_s, tp = agg("torch_pacing")
        jc_s, jc = agg("jax_control")
        jp_s, jp = agg("jax_pacing")
        tg = f"{tp - tc:+.3f}" if np.isfinite(tp - tc) else "—"
        jg = f"{jp - jc:+.3f}" if np.isfinite(jp - jc) else "—"
        lines.append(f"| {diff} | {ratio:g} | {vg:g} | {len(seeds)} | "
                     f"{tc_s} | {tp_s} | {tg} | {jc_s} | {jp_s} | {jg} |")
    return "\n".join(lines)


def pick(runs, min_gap: float, stat="best"):
    """Config with the largest mean torch gap above the gate, as CLI flags."""
    best_key, best_gap = None, min_gap
    for key, per_seed in runs.items():
        gaps = []
        for s, r in per_seed.items():
            g = (_best(r, "torch_pacing", stat)
                 - _best(r, "torch_control", stat))
            if np.isfinite(g):
                gaps.append(g)
        if gaps and float(np.mean(gaps)) > best_gap:
            best_key, best_gap = key, float(np.mean(gaps))
    if best_key is None:
        return None, None
    diff, ratio, vg = best_key
    return (f"--difficulty {diff} --scribble_ratio {ratio:g} "
            f"--val_gamma {vg:g}"), best_gap


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="study_r4/hunt")
    ap.add_argument("--pick", action="store_true")
    ap.add_argument("--min_gap", type=float, default=0.02)
    ap.add_argument("--stat", default=None, choices=sorted(STATS),
                    help="render/pick on one statistic; default renders "
                         "all three tables and picks on 'best'")
    args = ap.parse_args(argv)

    runs = load_runs(args.root)
    pick_stat = args.stat or "best"
    if args.pick:
        flags, gap = pick(runs, args.min_gap, pick_stat)
        if flags is None:
            print("NONE")
        else:
            print(flags)
        return 0
    for stat in ([args.stat] if args.stat else list(STATS)):
        print(table(runs, stat))
        print()
    flags, gap = pick(runs, args.min_gap, pick_stat)
    if flags:
        print(f"winner (mean torch {pick_stat} gap {gap:+.3f}): {flags}")
    else:
        print(f"no config clears the +{args.min_gap} torch-gap gate")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
