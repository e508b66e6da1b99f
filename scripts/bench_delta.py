#!/usr/bin/env python
"""Render the r02 -> r04 perf delta table (VERDICT r4 item 1 deliverable).

Reads the round-2 driver record (BENCH_r02.json, the standing perf
baseline) and a fresh bench.py JSON line (study_r4/chipq/
bench_r4_initial.json or any file whose last JSON-looking line is the
bench output), and prints the NOTES.md markdown: headline + per-change
attribution from the A/B fields (warp-table impl, BN impl, fused conv
impl) plus the batch-scaling comparison.

Usage: python scripts/bench_delta.py [new_bench.json] [--r02 BENCH_r02.json]
"""
import argparse
import json
import sys


def load_bench_line(path):
    """Accept either a raw bench.py stdout capture or a driver BENCH_r*.json
    wrapper ({"parsed": {...}})."""
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "parsed" in doc:
            return doc["parsed"]
        if isinstance(doc, dict) and "metric" in doc:
            return doc
    except json.JSONDecodeError:
        pass
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                doc = json.loads(line)
                if "metric" in doc:
                    return doc
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no bench JSON line found in {path}")


def fmt_ms(v):
    return "—" if v is None else f"{v:.2f} ms"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("new", nargs="?",
                    default="study_r4/chipq/bench_r4_initial.json")
    ap.add_argument("--r02", default="BENCH_r02.json")
    args = ap.parse_args()

    old = load_bench_line(args.r02)
    new = load_bench_line(args.new)

    rows = []
    o_v, n_v = old["value"], new["value"]
    rows.append(("headline slices/sec/chip (batch 12)",
                 f"{o_v}", f"{n_v}", f"{(n_v / o_v - 1) * 100:+.1f}%"))
    if old.get("mfu") and new.get("mfu"):
        rows.append(("MFU", f"{old['mfu']:.3f}", f"{new['mfu']:.3f}",
                     f"{(new['mfu'] / old['mfu'] - 1) * 100:+.1f}%"))
    ob, nb = old.get("breakdown_ms", {}), new.get("breakdown_ms", {})
    for k in ("step", "aug", "model_fwd_bwd_opt"):
        if k in ob and k in nb:
            rows.append((f"{k} ms", f"{ob[k]:.2f}", f"{nb[k]:.2f}",
                         f"{(nb[k] / ob[k] - 1) * 100:+.1f}%"))

    print("| quantity | r02 | r04 | delta |")
    print("|---|---|---|---|")
    for q, a, b, d in rows:
        print(f"| {q} | {a} | {b} | {d} |")

    # Per-change attribution from the new run's own A/Bs (r02 had none).
    print("\n**Per-change A/Bs (this run, identical step, trace-time "
          "switch):**\n")
    print("| change | off | on | delta |")
    print("|---|---|---|---|")
    ab = new.get("aug_ms_by_warp_impl") or {}
    if ab.get("xla") is not None and ab.get("pallas") is not None:
        d = (ab["pallas"] / ab["xla"] - 1) * 100
        print(f"| warp-table construction (aug ms) | {fmt_ms(ab['xla'])} "
              f"(xla) | {fmt_ms(ab['pallas'])} (pallas) | {d:+.1f}% |")
    bn = new.get("step_ms_by_bn_impl") or {}
    if bn.get("reduce") is not None and bn.get("matmul") is not None:
        d = (bn["matmul"] / bn["reduce"] - 1) * 100
        print(f"| MXU-matmul BN statistics (step ms) | "
              f"{fmt_ms(bn['reduce'])} (reduce) | {fmt_ms(bn['matmul'])} "
              f"(matmul) | {d:+.1f}% |")
    cv = new.get("step_ms_by_conv_impl") or {}
    if cv.get("xla") is not None and cv.get("fused") is not None:
        d = (cv["fused"] / cv["xla"] - 1) * 100
        print(f"| fused Pallas ConvLayer (step ms) | {fmt_ms(cv['xla'])} "
              f"(xla) | {fmt_ms(cv['fused'])} (fused) | {d:+.1f}% |")

    osc = old.get("batch_scaling_slices_per_sec") or {}
    nsc = new.get("batch_scaling_slices_per_sec") or {}
    if osc or nsc:
        print("\n**Batch scaling (slices/sec/chip):**\n")
        keys = sorted({*osc, *nsc}, key=int)
        print("| batch | r02 | r04 |")
        print("|---|---|---|")
        for k in keys:
            print(f"| {k} | {osc.get(k, '—')} | {nsc.get(k, '—')} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
