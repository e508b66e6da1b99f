"""Control-bias analysis: is the jax Control arm systematically hot?

VERDICT r4 weak item 2: across the round-3 oracle and the round-4 hunt,
the jax Control (pCE-only) arm finished >= the torch reference's Control
in most seeds (~+0.01..0.04 best-val DSC).  This tool quantifies the bias
from PAIRED runs (identical batch stream + identical torch-drawn initial
weights per seed, tools/torch_reference_study.py) and from the ablation
axes (BN eval-forever quirk off, weight decay off) run Control-only:

  python -m pacingpseudo_tpu.tools.control_bias --root study_r4/hunt \
      --ablation_root study_r5/ctrl

Per axis it reports per-seed paired deltas (jax - torch), mean +- sd, the
two-sided sign-test p-value, and whether the mean delta is inside the
+-0.005 DSC bound VERDICT asked for.  The reference files it pairs:
``jag_full_s{N}.json`` (torch arms) with ``jag_fulljax_s{N}.json`` (jax
arms) for the baseline, and single files holding both Control arms for
each ablation axis.
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re


def _load(path):
    with open(path) as f:
        return json.load(f)


def _sign_test_p(deltas):
    """Two-sided exact binomial sign test (ties dropped)."""
    pos = sum(1 for d in deltas if d > 0)
    neg = sum(1 for d in deltas if d < 0)
    n = pos + neg
    if n == 0:
        return 1.0
    k = max(pos, neg)
    tail = sum(math.comb(n, i) for i in range(k, n + 1)) / 2.0 ** n
    return min(1.0, 2.0 * tail)


def _stats(pairs):
    deltas = [j - t for _, t, j in pairs]
    n = len(deltas)
    mean = sum(deltas) / n
    sd = (sum((d - mean) ** 2 for d in deltas) / max(n - 1, 1)) ** 0.5
    tm = sum(t for _, t, _ in pairs) / n
    jm = sum(j for _, _, j in pairs) / n
    return {"n": n, "torch_mean": tm, "jax_mean": jm, "delta_mean": mean,
            "delta_sd": sd, "deltas": deltas,
            "sign_p": _sign_test_p(deltas)}


def collect_baseline(root):
    """Pair jag_full_s{N} (torch) with jag_fulljax_s{N} (jax)."""
    pairs = []
    for tf in sorted(glob.glob(os.path.join(root, "jag_full_s*.json"))):
        m = re.search(r"_s(\d+)\.json$", tf)
        jf = os.path.join(root, f"jag_fulljax_s{m.group(1)}.json")
        if not os.path.exists(jf):
            continue
        t = _load(tf).get("torch_control")
        j = _load(jf).get("jax_control")
        if t and j:
            pairs.append((int(m.group(1)), t["best_val_dice"],
                          j["best_val_dice"]))
    return pairs


def collect_axis(root, prefix):
    """Single files <prefix>_s{N}.json holding both Control arms."""
    pairs = []
    for f in sorted(glob.glob(os.path.join(root, f"{prefix}_s*.json"))):
        m = re.search(r"_s(\d+)\.json$", f)
        d = _load(f)
        t, j = d.get("torch_control"), d.get("jax_control")
        if t and j:
            pairs.append((int(m.group(1)), t["best_val_dice"],
                          j["best_val_dice"]))
    return pairs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="study_r4/hunt",
                    help="dir with the paired baseline hunt jsons")
    ap.add_argument("--ablation_root", default="study_r5/ctrl",
                    help="dir with the Control-only ablation jsons")
    ap.add_argument("--bound", type=float, default=0.005)
    args = ap.parse_args(argv)

    axes = [("baseline (quirk on, wd 3e-4)", collect_baseline(args.root))]
    for prefix, label in [("ctrlq", "eval-quirk OFF"),
                          ("ctrlwd0", "weight decay 0"),
                          ("ctrlfused", "streams fused (jax impl axis)")]:
        pairs = collect_axis(args.ablation_root, prefix)
        if pairs:
            axes.append((label, pairs))

    print("| axis | seeds | torch ctrl | jax ctrl | paired delta "
          "(jax-torch) | sign p | within +-%.3f |" % args.bound)
    print("|---|---|---|---|---|---|---|")
    out = {}
    for label, pairs in axes:
        if not pairs:
            print(f"| {label} | 0 | — | — | — | — | — |")
            continue
        s = _stats(pairs)
        out[label] = s
        per_seed = " ".join(f"{d:+.3f}" for d in s["deltas"])
        print(f"| {label} | {s['n']} | {s['torch_mean']:.4f} | "
              f"{s['jax_mean']:.4f} | {s['delta_mean']:+.4f}±"
              f"{s['delta_sd']:.4f} [{per_seed}] | {s['sign_p']:.3f} | "
              f"{'YES' if abs(s['delta_mean']) <= args.bound else 'no'} |")
    return out


if __name__ == "__main__":
    main()
