#!/usr/bin/env python
"""On-chip A/B of XLA TPU compiler flags against the flagship train step.

Round-5 trace analysis (study_r5/chipq/prof_b12) charges ~11.4 ms of the
68.35 ms step to `copy` ops — layout transpositions XLA inserts between
producers (pad/max fusions, S2D bitcasts) and conv consumers at the
128x128 stage.  The source-level rewrite (ops/s2d.py layout v2) recovered
only 0.6%, so the remaining copies are layout-assignment decisions made
inside the compiler.  This script attacks them at the flag level:

  1. probes which candidate `xla_tpu_*` option-override knobs the (remote)
     TPU compiler accepts, using a tiny throwaway program;
  2. AOT-compiles the EXACT bench train-step chain (bench.py methodology:
     k-step lax.scan, sync via host materialisation, sync-floor subtracted)
     under each accepted flag set and times it;
  3. dumps the baseline optimized HLO (compiled.as_text()) and aggregates
     its copy instructions by bytes so the copy bill can be read without a
     profiler run.

Emits one JSON line with {flag_set: step_ms} plus the copy audit, and
writes the full HLO text next to the JSON for offline inspection.

Methodology matches bench.py:120-190 (same config, same shapes, same
scan-chain timing); numbers are comparable to step_ms_by_*_impl tables.
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 12
H = W = CANVAS = 256
C = 5


# Candidate single-flag overrides.  Names are probed for acceptance first —
# a rejected name is recorded as null and skipped, so guesses are free.
CANDIDATES = {
    # Bigger scoped-VMEM budget lets the fusion cost model keep larger
    # producer/consumer regions fused (v5e has 128 MiB physical).
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # Scheduling: overlap DMA/copies with compute.
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    # Fusion aggressiveness knobs seen in public TPU configs.
    "aggr_fusion": {"xla_tpu_enable_aggressive_loop_fusion": "true"},
    "rwb_fusion": {"xla_tpu_rwb_fusion": "true"},
    "dot_dot": {"xla_tpu_dot_dot_fusion": "true"},
    "licm2": {"xla_tpu_licm_size_inflation_ratio": "2"},
    # Layout assignment experiments.
    "nofold_transpose": {"xla_tpu_enable_experimental_layout_assignment": "true"},
}

# Wider acceptance sweep for --probe_only: each name costs ~1 s to probe on
# a tiny program; rejects are free knowledge about this compiler build.
PROBE_EXTRA = [
    "xla_tpu_enable_copy_fusion",
    "xla_tpu_copy_fusion_pad_unpad_ratio",
    "xla_tpu_async_copy_bandwidth_scaling_factor",
    "xla_tpu_vector_load_fusion_window",
    "xla_tpu_vector_store_fusion_window",
    "xla_tpu_use_bundle_aware_cost_model_for_fusions",
    "xla_tpu_enable_dot_strength_reduction",
    "xla_tpu_nested_dot_fusion",
    "xla_tpu_order_dot_fusions_by_flops",
    "xla_tpu_scavenge_vmem_for_fusions",
    "xla_tpu_enable_vmem_prefetching",
    "xla_tpu_prefetch_depth",
    "xla_tpu_enable_multi_output_fusion",
    "xla_tpu_enable_experimental_exhaustive_output_fusion",
    "xla_tpu_transpose_folding",
    "xla_tpu_enable_bf16_conversion_folding",
    "xla_tpu_reduce_scatter_fusion",
    "xla_tpu_use_lp_llo_scheduler",
    "xla_tpu_memory_bound_loop_optimizer",
    "xla_tpu_enable_aggressive_broadcast_priority_update",
    "xla_tpu_alternate_memory_benefit_scaling_factor",
    "xla_tpu_enable_async_copy_elision",
    "xla_tpu_enable_fusion_cost_model",
    "xla_tpu_fuse_pad_into_conv",
    "xla_tpu_conv_vmem_scaling",
    "xla_tpu_decompose_all_gather_to_all_reduce",
    "xla_tpu_relayout_group_size_threshold_for_reduce_scatter",
    "xla_tpu_layout_assignment_mode",
    "xla_tpu_use_tc_device_shape",
    "xla_tpu_enable_host_aware_passes",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="study_r5/chipq/xla_flags_ab.json")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--combo", action="store_true",
                    help="also time the union of all individually-helpful flags")
    ap.add_argument("--probe_only", action="store_true",
                    help="only probe PROBE_EXTRA names for acceptance (bool"
                         " 'true' then '1' fallback), no step timing")
    ap.add_argument("--flags", nargs="*", default=None,
                    help="explicit key=value overrides to time instead of"
                         " CANDIDATES (name derived from the pair)")
    args = ap.parse_args()

    from pacingpseudo_tpu.utils.chiplock import preflight_chip
    preflight_chip(owner_note="xla_flags_ab.py", wait_s=900.0)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pacingpseudo_tpu.aug.presets import base_params_for, strong_params_for
    from pacingpseudo_tpu.aug.engine import make_train_augment_fn
    from pacingpseudo_tpu.config import ExperimentConfig
    from pacingpseudo_tpu.models import PacingPseudoModel
    from pacingpseudo_tpu.train.optim import make_optimizer
    from pacingpseudo_tpu.train.state import create_train_state
    from pacingpseudo_tpu.train.step import make_pacing_train_step

    # ---- 1. probe flag acceptance on a throwaway program -------------------
    tiny = jax.jit(lambda a: a @ a).lower(jnp.ones((128, 128), jnp.bfloat16))

    if args.probe_only:
        table = {}
        for name in PROBE_EXTRA:
            for val in ("true", "1"):
                try:
                    tiny.compile(compiler_options={name: val})
                    table[name] = f"accepts {val}"
                    break
                except Exception as e:
                    table[name] = f"rejected: {str(e)[:80]}"
            print(f"{name}: {table[name]}", file=sys.stderr)
        print(json.dumps(table, indent=1))
        return

    # A failed compile (unknown flag -> remote tpu_compile_helper crash)
    # can poison the in-process axon client: the next compile never issues
    # its request (observed 21:26-21:41 this session — all threads futex-
    # parked, no TCP to the relay).  So the TIMED run never probes: it
    # takes --flags (k=v pairs) or the list probed earlier in a SEPARATE
    # --probe_only process.
    rejected = {}
    if args.flags:
        accepted = {}
        for kv in args.flags:
            k, _, v = kv.partition("=")
            accepted[k.replace("xla_tpu_", "") + "=" + v] = {k: v}
    else:
        accepted = {n: o for n, o in CANDIDATES.items()
                    if n not in ("aggr_fusion", "nofold_transpose")}
    print(f"timing flag sets: {sorted(accepted)}", file=sys.stderr)

    # ---- 2. build the bench-identical step chain ----------------------------
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
    state0 = create_train_state(jax.random.PRNGKey(0), model, tx, tmpl,
                                with_memory=True, num_classes=C)
    step_inner = make_pacing_train_step(config, model, tx, steps_per_epoch,
                                        augment_fn=augment_fn, donate=False)
    key = jax.random.PRNGKey(1)
    K = args.steps

    def run_k(state, raw, k):
        def body(carry, i):
            st, _ = carry
            st, metrics = step_inner(st, raw, jax.random.fold_in(key, i))
            return (st, metrics["loss_total"]), None
        (st, last), _ = jax.lax.scan(body, (state, jnp.zeros(())),
                                     jnp.arange(K))
        return st, last

    lowered = jax.jit(run_k, static_argnames=("k",)).lower(state0, raws[0], K)

    @jax.jit
    def sync_floor(x):
        return jnp.sum(x)

    float(sync_floor(raws[1]["image"]))
    t0 = time.time()
    float(sync_floor(raws[0]["image"]))
    floor = time.time() - t0

    def time_compiled(compiled):
        st, last = compiled(state0, raws[0])
        float(last)  # warm + sync
        t0 = time.time()
        st, last = compiled(state0, raws[1])
        float(last)
        return round(max(time.time() - t0 - floor, 1e-9) / K * 1e3, 2)

    results, errors = {}, {}
    print("compiling baseline...", file=sys.stderr)
    t0 = time.time()
    base_compiled = lowered.compile()
    print(f"baseline compiled in {time.time()-t0:.0f}s", file=sys.stderr)
    results["baseline"] = time_compiled(base_compiled)
    print(f"baseline: {results['baseline']} ms/step", file=sys.stderr)

    # ---- 3. copy audit from the optimized HLO -------------------------------
    hlo_path = os.path.splitext(args.out)[0] + "_baseline_hlo.txt"
    copy_audit = []
    try:
        txt = base_compiled.as_text()
        with open(hlo_path, "w") as f:
            f.write(txt)
        copy_audit = audit_copies(txt)
        for row in copy_audit[:12]:
            print("copy:", row, file=sys.stderr)
    except Exception as e:
        print(f"HLO dump failed: {type(e).__name__}: {e}", file=sys.stderr)
        hlo_path = None

    for name, opts in accepted.items():
        try:
            print(f"compiling {name}...", file=sys.stderr)
            t0 = time.time()
            compiled = lowered.compile(compiler_options=dict(opts))
            print(f"{name} compiled in {time.time()-t0:.0f}s", file=sys.stderr)
            results[name] = time_compiled(compiled)
            del compiled
        except Exception as e:
            results[name] = None
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"{name}: {results.get(name)} ms/step", file=sys.stderr)

    helpful = {k: v for k, v in results.items()
               if k != "baseline" and v is not None
               and v < results["baseline"] * 0.995}
    if args.combo and len(helpful) > 1:
        union = {}
        for name in helpful:
            union.update(accepted[name])
        try:
            compiled = lowered.compile(compiler_options=union)
            results["combo:" + "+".join(sorted(helpful))] = time_compiled(compiled)
        except Exception as e:
            errors["combo"] = f"{type(e).__name__}: {str(e)[:200]}"

    out = {
        "metric": "step_ms_by_xla_flags (k-scan chain, b12, bench methodology)",
        "baseline_ms": results["baseline"],
        "step_ms_by_flag": results,
        "accepted": {k: v for k, v in accepted.items()},
        "rejected": rejected,
        "errors": errors,
        "hlo_dump": hlo_path,
        "copy_audit_top": copy_audit[:20],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: results[k] for k in results}))


_DTYPE_BYTES = {"pred": 0.125, "s8": 1, "u8": 1, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "f32": 4, "s32": 4, "u32": 4,
                "f64": 8, "s64": 8, "u64": 8}


def audit_copies(hlo_text):
    """Aggregate `copy(...)` instructions in optimized HLO by (shape,
    layout), with byte sizes, sorted descending — the offline view of the
    profiler's `copy` row.  TPU layouts carry tiling like
    ``{3,2,1,0:T(8,128)(2,1)}``; the layout string is kept so the
    disagreeing major-to-minor orders are visible."""
    import re
    from collections import Counter
    pat = re.compile(
        r"=\s+((?:bf16|f16|f32|s8|u8|s16|u16|s32|u32|f64|s64|u64|pred)"
        r"\[[0-9,]*\])(\{[^{}]*\})?\s+copy\(")
    counts = Counter(f"{s}{l or ''}" for s, l in pat.findall(hlo_text))
    rows = []
    for shape, n in counts.items():
        m = re.match(r"(\w+)\[([0-9,]*)\]", shape)
        if not m:
            continue
        dt, dims = m.groups()
        numel = 1
        for d in dims.split(","):
            if d:
                numel *= int(d)
        rows.append({"shape": shape, "count": n,
                     "mbytes_total": round(numel * _DTYPE_BYTES.get(dt, 4)
                                           * n / 1e6, 2)})
    rows.sort(key=lambda r: -r["mbytes_total"])
    rows.insert(0, {"shape": "<async copy-start total>",
                    "count": len(re.findall(r"\bcopy-start\(", hlo_text)),
                    "mbytes_total": None})
    return rows


if __name__ == "__main__":
    main()
