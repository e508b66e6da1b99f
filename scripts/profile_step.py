#!/usr/bin/env python
"""Profile the full pacing train step on the TPU and aggregate op times.

Builds the exact bench.py step (full Experiment config, on-device aug,
bf16) at a given batch size, captures a jax.profiler trace of a scanned
chain, then parses the emitted trace.json.gz and prints the op-duration
aggregation by (category, fusion name prefix) — the round-2 workflow that
located the loss-gather / memory-scan / BN-reduce stalls.

Usage:  python scripts/profile_step.py [--batch 12] [--steps 8]
        [--out /tmp/prof_b12]
Claims the TPU chip; don't run while another TPU process is live.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

# Invoked as `python scripts/profile_step.py` the interpreter puts scripts/
# (not the repo root) on sys.path — bootstrap the package like
# scripts/gen_lvsc_data.py does.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(trace_dir: str, top: int = 40):
    """Aggregate 'XLA Ops' rows by op name from a profiler trace.json.gz."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"no trace.json.gz under {trace_dir}", file=sys.stderr)
        return []
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Find thread ids whose name mentions XLA Ops (device op lanes).
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in str(e.get("args", {}).get("name", "")):
                op_tids.add((e.get("pid"), e.get("tid")))
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        # collapse fusion instance suffixes: fusion.123 -> fusion
        base = re.sub(r"\.\d+$", "", name)
        dur = float(e.get("dur", 0.0))  # µs
        cnt, tot = agg.get(base, (0, 0.0))
        agg[base] = (cnt + 1, tot + dur)
    rows = sorted(((tot, cnt, name) for name, (cnt, tot) in agg.items()),
                  reverse=True)
    total = sum(r[0] for r in rows)
    print(f"trace: {path}")
    print(f"total device op time: {total / 1e3:.2f} ms over {len(rows)} op kinds")
    for tot, cnt, name in rows[:top]:
        print(f"{tot / 1e3:9.3f} ms  {100 * tot / max(total, 1e-9):5.1f}%  "
              f"x{cnt:<5d} {name[:110]}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--parse_only", type=str, default="",
                    help="skip running; just aggregate this trace dir")
    ap.add_argument("--aug_only", action="store_true",
                    help="profile the augmentation program alone")
    ap.add_argument("--warp_impl", type=str, default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="warp-table construction A/B (aug/params.py)")
    args = ap.parse_args()

    if args.parse_only:
        aggregate_trace(args.parse_only)
        return

    # Mechanical chip safety, like every other chip client (bench.py,
    # chip_parity.py, the CLI drivers): refuse fast on a dead relay and
    # hold the exclusive chip flock for the duration of the trace.
    from pacingpseudo_tpu.utils.chiplock import preflight_chip
    preflight_chip(owner_note=f"profile_step.py b{args.batch}",
                   wait_s=float(os.environ.get("CHIP_LOCK_WAIT", "900")))

    out = args.out or f"/tmp/prof_b{args.batch}{'_aug' if args.aug_only else ''}"
    os.makedirs(out, exist_ok=True)

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pacingpseudo_tpu.aug.engine import augment_batch, make_train_augment_fn
    from pacingpseudo_tpu.aug.presets import base_params_for, strong_params_for
    from pacingpseudo_tpu.config import ExperimentConfig
    from pacingpseudo_tpu.models import PacingPseudoModel
    from pacingpseudo_tpu.train.optim import make_optimizer
    from pacingpseudo_tpu.train.state import create_train_state
    from pacingpseudo_tpu.train.step import make_pacing_train_step

    B, CANVAS, C = args.batch, 256, 5
    rng = np.random.RandomState(0)
    raw = {
        "image": jnp.asarray(rng.randn(B, CANVAS, CANVAS), jnp.float32),
        "label": jnp.asarray(rng.randint(0, C, (B, CANVAS, CANVAS)), jnp.float32),
        "scribble": jnp.asarray(rng.randint(0, C + 1, (B, CANVAS, CANVAS)),
                                jnp.float32),
        "size": jnp.asarray(np.tile([CANVAS, CANVAS], (B, 1)), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    import dataclasses
    bp = dataclasses.replace(base_params_for("chaos"),
                             warp_table_impl=args.warp_impl)
    sp = strong_params_for("TransformsColor", 1.0)

    if args.aug_only:
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(raw, key, k):
            def body(c, i):
                b = augment_batch(raw, jax.random.fold_in(key, i), bp, sp, True)
                return c + jnp.sum(b["image"]) + jnp.sum(b["label"]) \
                    + jnp.sum(b["scribble"]) + jnp.sum(b["image_strong"]), None
            out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return out

        float(run_k(raw, key, k=args.steps))
        t0 = time.time()
        float(run_k(raw, key, k=args.steps))
        dt = (time.time() - t0) / args.steps
        print(f"aug batch {B} [{args.warp_impl}]: {dt * 1e3:.2f} ms/step "
              f"(incl. sync floor)")
        with jax.profiler.trace(out):
            float(run_k(raw, key, k=args.steps))
    else:
        config = ExperimentConfig(
            dataset="chaos", session="Experiment", num_classes=C,
            ignored_index=C, do_loss_ent=True, do_decoder_consistency=True,
            do_aux_path=True, do_memory=True, batch_size=B,
            compute_dtype="bfloat16").validate()
        model = PacingPseudoModel(num_classes=C, output_stride=8,
                                  do_aux_path=True, dtype=jnp.bfloat16)
        tx = make_optimizer(config, 160)
        state = create_train_state(
            jax.random.PRNGKey(0), model, tx,
            {"image": jnp.zeros((B, CANVAS, CANVAS, 1), jnp.float32)},
            with_memory=True, num_classes=C)
        augment_fn = make_train_augment_fn(bp, sp, do_strong=True)
        step = make_pacing_train_step(config, model, tx, 160,
                                      augment_fn=augment_fn, donate=False)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(state, raw, key, k):
            def body(carry, i):
                st, _ = carry
                st, m = step(st, raw, jax.random.fold_in(key, i))
                return (st, m["loss_total"]), None
            (st, last), _ = jax.lax.scan(body, (state, jnp.zeros(())),
                                         jnp.arange(k))
            return st, last

        state, last = run_k(state, raw, key, k=args.steps)
        float(last)
        with jax.profiler.trace(out):
            t0 = time.time()
            state, last = run_k(state, raw, key, k=args.steps)
            float(last)
            dt = (time.time() - t0) / args.steps
        print(f"batch {B}: {B / dt:.1f} slices/s ({dt * 1e3:.2f} ms/step, "
              f"incl. sync floor)")
    time.sleep(1.0)
    aggregate_trace(out)


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        print(f"profile_step refusing to run: {e}", file=sys.stderr)
        sys.exit(2)
