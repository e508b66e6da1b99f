#!/usr/bin/env python
"""Repeated, interleaved A/B of the ops/s2d.py layout impls (v1 vs v2).

Two independent bench captures now both measured v2 faster e2e
(68.61 vs 69.03, then 66.69 vs 68.33 ms/step) but each was a single
timing, the same order as run-to-run variance.  This script settles the
default with N interleaved repetitions per impl on the SAME process /
chip session (bench.py scan-chain methodology): compile both variants
once, then alternate v1/v2 timing so drift affects both arms equally.

Emits one JSON line: per-rep tables, means, and the paired verdict.
"""
import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 12
H = W = CANVAS = 256
C = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="study_r5/chipq/layout_rep_ab.json")
    args = ap.parse_args()

    from pacingpseudo_tpu.utils.chiplock import preflight_chip
    preflight_chip(owner_note="layout_rep_ab.py", wait_s=900.0)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pacingpseudo_tpu.aug.presets import base_params_for, strong_params_for
    from pacingpseudo_tpu.aug.engine import make_train_augment_fn
    from pacingpseudo_tpu.config import ExperimentConfig
    from pacingpseudo_tpu.models import PacingPseudoModel
    from pacingpseudo_tpu.ops.s2d import set_layout_impl
    from pacingpseudo_tpu.train.optim import make_optimizer
    from pacingpseudo_tpu.train.state import create_train_state
    from pacingpseudo_tpu.train.step import make_pacing_train_step

    config = ExperimentConfig(
        dataset="chaos", session="Experiment", num_classes=C, ignored_index=C,
        do_loss_ent=True, do_decoder_consistency=True, do_aux_path=True,
        do_memory=True, batch_size=BATCH, compute_dtype="bfloat16",
    ).validate()
    model = PacingPseudoModel(
        num_classes=C, output_stride=8, do_aux_path=True, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    raws = []
    for _ in range(2):
        raws.append({
            "image": jnp.asarray(rng.randn(BATCH, CANVAS, CANVAS), jnp.float32),
            "label": jnp.asarray(
                rng.randint(0, C, (BATCH, CANVAS, CANVAS)), jnp.float32),
            "scribble": jnp.asarray(
                rng.randint(0, C + 1, (BATCH, CANVAS, CANVAS)), jnp.float32),
            "size": jnp.asarray(np.tile([CANVAS, CANVAS], (BATCH, 1)), jnp.int32),
        })
    augment_fn = make_train_augment_fn(
        base_params_for("chaos"), strong_params_for("TransformsColor", 1.0),
        do_strong=True)
    steps_per_epoch = 160
    tx = make_optimizer(config, steps_per_epoch)
    tmpl = {"image": jnp.zeros((BATCH, H, W, 1), jnp.float32)}
    key = jax.random.PRNGKey(1)
    K = args.steps

    compiled = {}
    state0 = None
    for impl in ("v1", "v2"):
        set_layout_impl(impl)
        st = create_train_state(jax.random.PRNGKey(0), model, tx, tmpl,
                                with_memory=True, num_classes=C)
        if state0 is None:
            state0 = st
        step_inner = make_pacing_train_step(
            config, model, tx, steps_per_epoch, augment_fn=augment_fn,
            donate=False)

        def run_k(state, raw, k, _step=step_inner):
            def body(carry, i):
                s, _ = carry
                s, metrics = _step(s, raw, jax.random.fold_in(key, i))
                return (s, metrics["loss_total"]), None
            (s, last), _ = jax.lax.scan(body, (state, jnp.zeros(())),
                                        jnp.arange(K))
            return s, last

        compiled[impl] = (jax.jit(run_k, static_argnames=("k",))
                          .lower(st, raws[0], K).compile())
        print(f"compiled {impl}", file=sys.stderr)
        try:
            from xla_flags_ab import audit_copies  # sibling script
            txt = compiled[impl].as_text()
            hp = os.path.splitext(args.out)[0] + f"_{impl}_hlo.txt"
            with open(hp, "w") as f:
                f.write(txt)
            for row in audit_copies(txt)[:8]:
                print(f"{impl} copy:", row, file=sys.stderr)
        except Exception as e:
            print(f"{impl} HLO dump failed: {e}", file=sys.stderr)
    set_layout_impl("v1")

    @jax.jit
    def sync_floor(x):
        return jnp.sum(x)

    float(sync_floor(raws[1]["image"]))

    def floor_ms():
        t0 = time.time()
        float(sync_floor(raws[0]["image"]))
        return time.time() - t0

    # warm both
    for impl in ("v1", "v2"):
        _, last = compiled[impl](state0, raws[0])
        float(last)

    times = {"v1": [], "v2": []}
    for rep in range(args.reps):
        for impl in ("v1", "v2") if rep % 2 == 0 else ("v2", "v1"):
            fl = floor_ms()
            t0 = time.time()
            _, last = compiled[impl](state0, raws[1])
            float(last)
            ms = max(time.time() - t0 - fl, 1e-9) / K * 1e3
            times[impl].append(round(ms, 2))
        print(f"rep {rep}: v1={times['v1'][-1]} v2={times['v2'][-1]}",
              file=sys.stderr)

    mean = {k: round(statistics.mean(v), 2) for k, v in times.items()}
    sd = {k: round(statistics.stdev(v), 3) if len(v) > 1 else 0.0
          for k, v in times.items()}
    deltas = [a - b for a, b in zip(times["v1"], times["v2"])]
    out = {
        "metric": "layout v1 vs v2 step ms (interleaved reps, b12)",
        "reps": args.reps, "k_steps": K,
        "ms_v1": times["v1"], "ms_v2": times["v2"],
        "mean_ms": mean, "sd_ms": sd,
        "paired_delta_v1_minus_v2": [round(d, 2) for d in deltas],
        "v2_wins": sum(d > 0 for d in deltas),
        "speedup_pct": round((mean["v1"] - mean["v2"]) / mean["v1"] * 100, 2),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
