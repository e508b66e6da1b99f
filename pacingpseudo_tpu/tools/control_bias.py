"""Control-bias analysis: is the jax Control arm systematically hot?

VERDICT r4 weak item 2: across the round-3 oracle and the round-4 hunt,
the jax Control (pCE-only) arm finished >= the torch reference's Control
in most seeds (~+0.01..0.04 best-val DSC).  This tool quantifies the bias
from PAIRED runs (identical batch stream + identical torch-drawn initial
weights per seed, tools/torch_reference_study.py) and from the ablation
axes (BN eval-forever quirk off, weight decay off) run Control-only:

  python -m pacingpseudo_tpu.tools.control_bias --root study_r4/hunt \
      --ablation_root study_r5/ctrl

The key decomposition (round-5 finding): ``best_val_dice`` is a MAX over
an 80-point validation curve whose epoch-to-epoch sd reaches 0.07-0.20 in
the jagged regime — an upward-biased extreme-value statistic whose bias
grows with curve variance.  So the table reports each axis under three
statistics:

  * ``best``    — max over the curve (the statistic the hunt tables used,
                  and where the "hot" impression came from);
  * ``mean10+`` — mean of the curve from epoch 10 on (low-variance,
                  trajectory-level paired comparison);
  * ``tail20``  — mean of the last 20 epochs (converged behaviour).

If the bias is real training dynamics, it shows up in mean10+/tail20; if
it is extreme-value bias, best is positive while mean10+ straddles zero.
Per axis/statistic it reports per-seed paired deltas (jax - torch),
mean +- sd, the two-sided sign-test p-value, and whether the mean delta is
inside the +-0.005 DSC bound VERDICT asked for.  The reference files it
pairs: ``jag_full_s{N}.json`` (torch arms) with ``jag_fulljax_s{N}.json``
(jax arms) for the jagged baseline, the win015valgamma1 pair family for
the easy regime, and single files holding both Control arms for each
ablation axis.
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re

#: statistic name -> extractor over an arm result dict.  Curve-based
#: statistics return None when the file predates curve recording; those
#: pairs are skipped for that statistic only.
def _stat_best(arm):
    return arm.get("best_val_dice")


def _curve(arm):
    c = arm.get("curve")
    return c if isinstance(c, list) and c else None


def _stat_mean10(arm):
    c = _curve(arm)
    if c is None or len(c) <= 10:
        return None
    t = c[10:]
    return sum(t) / len(t)


def _stat_tail20(arm):
    c = _curve(arm)
    if c is None:
        return None
    t = c[-20:]
    return sum(t) / len(t)


STATS = {"best": _stat_best, "mean10+": _stat_mean10, "tail20": _stat_tail20}


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


def _pair_arms(torch_arm, jax_arm, seed, stat):
    t = STATS[stat](torch_arm)
    j = STATS[stat](jax_arm)
    if t is None or j is None:
        return None
    return (seed, t, j)


def collect_baseline(root, stat="best", torch_prefix="jag_full",
                     jax_prefix="jag_fulljax"):
    """Pair <torch_prefix>_s{N} (torch arms) with <jax_prefix>_s{N}."""
    pairs = []
    for tf in sorted(glob.glob(os.path.join(root, f"{torch_prefix}_s*.json"))):
        m = re.search(r"_s(\d+)\.json$", tf)
        jf = os.path.join(root, f"{jax_prefix}_s{m.group(1)}.json")
        if not os.path.exists(jf):
            continue
        t = _load(tf).get("torch_control")
        j = _load(jf).get("jax_control")
        if t and j:
            p = _pair_arms(t, j, int(m.group(1)), stat)
            if p:
                pairs.append(p)
    return pairs


def collect_axis(root, prefix, stat="best"):
    """Single files <prefix>_s{N}.json holding both Control arms."""
    pairs = []
    for f in sorted(glob.glob(os.path.join(root, f"{prefix}_s*.json"))):
        m = re.search(r"_s(\d+)\.json$", f)
        d = _load(f)
        t, j = d.get("torch_control"), d.get("jax_control")
        if t and j:
            p = _pair_arms(t, j, int(m.group(1)), stat)
            if p:
                pairs.append(p)
    return pairs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="study_r4/hunt",
                    help="dir with the paired baseline hunt jsons")
    ap.add_argument("--ablation_root", default="study_r5/ctrl",
                    help="dir with the Control-only ablation jsons")
    ap.add_argument("--bound", type=float, default=0.005)
    args = ap.parse_args(argv)

    def axis_rows(label, collect):
        rows = []
        for stat in STATS:
            pairs = collect(stat)
            if pairs:
                rows.append((label, stat, _stats(pairs)))
        return rows

    rows = axis_rows("baseline jagged (quirk on, wd 3e-4)",
                     lambda s: collect_baseline(args.root, s))
    rows += axis_rows("baseline easy (win015 valgamma1)",
                      lambda s: collect_baseline(
                          args.root, s, torch_prefix="win015valgamma1",
                          jax_prefix="win015valgamma1jax"))
    for prefix, label in [("ctrlq", "eval-quirk OFF"),
                          ("ctrlwd0", "weight decay 0"),
                          ("ctrlfused", "streams fused (jax impl axis)")]:
        rows += axis_rows(label,
                          lambda s, p=prefix: collect_axis(
                              args.ablation_root, p, s))

    print("| axis | statistic | seeds | torch ctrl | jax ctrl | "
          "paired delta (jax-torch) | sign p | within +-%.3f |" % args.bound)
    print("|---|---|---|---|---|---|---|---|")
    out = {}
    for label, stat, s in rows:
        # Back-compat: out[label] is the best-statistic dict; curve-based
        # statistics nest inside it.
        if stat == "best":
            out[label] = dict(s)
        elif label in out:
            out[label][stat] = s
        else:
            out[label] = {stat: s}
        per_seed = " ".join(f"{d:+.3f}" for d in s["deltas"])
        print(f"| {label} | {stat} | {s['n']} | {s['torch_mean']:.4f} | "
              f"{s['jax_mean']:.4f} | {s['delta_mean']:+.4f}±"
              f"{s['delta_sd']:.4f} [{per_seed}] | {s['sign_p']:.3f} | "
              f"{'YES' if abs(s['delta_mean']) <= args.bound else 'no'} |")

    # Extreme-value verdict: positive best-delta alongside a
    # zero-straddling mean10+ delta means the "hot" reading is max-bias.
    base = out.get("baseline jagged (quirk on, wd 3e-4)", {})
    if base.get("deltas") and isinstance(base.get("mean10+"), dict):
        b, m = base["delta_mean"], base["mean10+"]["delta_mean"]
        print()
        if b > args.bound and abs(m) <= args.bound:
            print(f"VERDICT: best-val delta {b:+.4f} but trajectory-mean "
                  f"delta {m:+.4f} (within +-{args.bound}): the 'jax "
                  "Control runs hot' reading is extreme-value bias of "
                  "max(curve) on high-variance curves, not a training-"
                  "dynamics difference.")
        else:
            print(f"VERDICT: best-val delta {b:+.4f}, trajectory-mean "
                  f"delta {m:+.4f} — see per-axis rows.")
    return out


if __name__ == "__main__":
    main()
