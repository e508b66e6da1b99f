"""Five-fold cross-validation sweep runner.

The reference's published protocol (README tables; SURVEY.md §6) is a
manual loop: train each fold, run inference.py per fold, average per-class
Dice over patients, average anatomies excluding background, then average
folds.  This driver automates it end-to-end for any dataset/session combo:

  python -m pacingpseudo_tpu.cli.sweep --dataset chaos --modality t1 \\
      --session Experiment --tag sweep1 --folds 0 1 2 3 4 \\
      --do_loss_ent --do_decoder_consistency --do_aux_path --do_memory

Writes ``sweep_summary.json`` + a README-style markdown table with per-fold
and overall DSC / HD95.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np


def _config_hash(args, config_from_args) -> str:
    """Hash of every result-affecting knob, stamped into each cached
    fold{N}.json: re-running the same --tag/--sweep_out with different
    hyperparameters regenerates instead of silently reusing stale folds
    (ADVICE r4).  Run-placement fields (tag/root/fold/resume/...) are
    excluded so moving a sweep or resuming it keeps the cache valid."""
    args = type(args)(**vars(args))  # shallow copy; config_from_args mutates
    args.fold = 0
    d = dataclasses.asdict(config_from_args(args))
    for k in ("fold", "tag", "root", "resume", "run_dir", "profile_dir",
              "ckp_interval", "steps_per_dispatch", "device_resident_data",
              "num_devices", "spatial_shards"):
        d.pop(k, None)
    d["patient_regex"] = args.patient_regex
    # Dataset-defining and debug knobs that live on args, not the config —
    # exactly the staleness class the hash exists to catch.  Must be
    # captured BEFORE main() zeroes synthetic_data post-generation.
    for k in ("synthetic_data", "synthetic_difficulty",
              "synthetic_scribble_style", "synthetic_scribble_ratio",
              "synthetic_size_jitter", "max_steps_per_epoch"):
        d[k] = getattr(args, k, None)
    blob = json.dumps(d, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def main(argv=None):
    from pacingpseudo_tpu.cli.train import build_parser, config_from_args

    p = build_parser()
    p.add_argument("--folds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--sweep_out", type=str, default="")
    p.add_argument("--patient_regex", type=str, default="",
                   help="uid -> patient id regex for the per-patient "
                        "aggregation (evals/infer.py patient_key)")
    args = p.parse_args(argv)

    from pacingpseudo_tpu.config import DATASETS
    from pacingpseudo_tpu.evals.infer import run_inference
    from pacingpseudo_tpu.train.loop import train_driver
    from pacingpseudo_tpu.utils.chiplock import preflight_chip
    from pacingpseudo_tpu.utils.jaxcache import enable_persistent_cache

    preflight_chip(owner_note=f"cli.sweep {args.session} {args.tag}",
                   wait_s=float(os.environ.get("CHIP_LOCK_WAIT", "0")))
    enable_persistent_cache()

    # Hash BEFORE the generation block zeroes synthetic_data, so the pool
    # definition is part of the fold-cache key.  NOTE: a summary re-invoke
    # must therefore pass the SAME synthetic flags as the training runs.
    cfg_hash = _config_hash(args, config_from_args)

    if args.synthetic_data:
        from pacingpseudo_tpu.data.synthetic import write_synthetic_dataset
        spec = DATASETS[args.dataset]
        write_synthetic_dataset(
            args.data_root, args.dataset, args.synthetic_data,
            tuple(args.input_size) if args.input_size else spec.input_size,
            spec.num_classes, spec.ignored_index,
            modality=args.modality, seed=args.seed,
            size_jitter=args.synthetic_size_jitter,
            difficulty=args.synthetic_difficulty,
            scribble_style=args.synthetic_scribble_style,
            scribble_ratio=args.synthetic_scribble_ratio)
        args.synthetic_data = 0

    eval_ds = args.dataset
    if eval_ds == "chaos":
        eval_ds = "chaost1" if args.modality == "t1" else "chaost2"

    out_dir = args.sweep_out or os.path.join(args.root, f"sweep-{args.tag}")
    os.makedirs(out_dir, exist_ok=True)

    results = {}
    for fold in args.folds:
        # Per-fold resumability: a finished fold leaves fold{N}.json and is
        # skipped on re-invocation, so a crash (or relay outage) mid-sweep
        # only costs the in-flight fold.
        fold_json = os.path.join(out_dir, f"fold{fold}.json")
        if os.path.exists(fold_json):
            with open(fold_json) as f:
                cached = json.load(f)
            if cached.get("_config_hash") == cfg_hash:
                results[fold] = cached
                print(f"fold {fold}: cached ({fold_json})")
                continue
            print(f"fold {fold}: cached result has config hash "
                  f"{cached.get('_config_hash')} != {cfg_hash}; regenerating")
        args.fold = fold
        config = config_from_args(args).validate()
        run_dir = train_driver(config, args.data_root,
                               max_steps_per_epoch=args.max_steps_per_epoch or None)
        best = os.path.join(run_dir, "best_ckp")
        infer_dir = os.path.join(run_dir, "inference")
        os.makedirs(infer_dir, exist_ok=True)
        res = run_inference(
            dataset=eval_ds, fold=fold, checkpoint_path=best,
            data_root=args.data_root, run_dir=infer_dir,
            batch_size=max(args.batch_size, 1),
            model_kwargs=dict(
                input_ch=args.input_ch, init_ch=args.init_ch,
                max_ch=args.max_ch, output_stride=args.output_stride,
                is_stride_conv=args.is_stride_conv,
                is_trans_conv=args.is_trans_conv),
            compute_dtype=args.compute_dtype,
            patient_regex=args.patient_regex)
        results[fold] = {"_config_hash": cfg_hash,
                         "dice": res["dice"], "hd95": res["hd95"],
                         "dice_per_patient": res["dice_per_patient"],
                         "hd95_per_patient": res["hd95_per_patient"],
                         "num_patients": res["num_patients"],
                         "run_dir": run_dir}
        with open(fold_json, "w") as f:
            json.dump(results[fold], f, indent=2)

    dices = [results[f]["dice"] for f in args.folds]
    hd95s = [results[f]["hd95"] for f in args.folds]
    summary = {
        "dataset": eval_ds,
        "session": args.session,
        "folds": {str(f): results[f] for f in args.folds},
        # per-slice averages (what both drivers log) AND the published
        # per-patient protocol (README.md:106) side by side
        "overall_dice": float(np.mean(dices)),
        "overall_hd95": float(np.nanmean(hd95s)),
        "overall_dice_per_patient": float(np.mean(
            [results[f]["dice_per_patient"] for f in args.folds])),
        "overall_hd95_per_patient": float(np.nanmean(
            [results[f]["hd95_per_patient"] for f in args.folds])),
    }

    with open(os.path.join(out_dir, "sweep_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    cols = " | ".join(f"Fold {f}" for f in args.folds)
    drow = " | ".join(f"{d:.4f}" for d in dices)
    hrow = " | ".join(f"{h:.2f}" for h in hd95s)
    table = (f"| Metric | {cols} | Overall |\n"
             f"|---|{'---|' * (len(args.folds) + 1)}\n"
             f"| DSC | {drow} | {summary['overall_dice']:.4f} |\n"
             f"| HD95 (mm) | {hrow} | {summary['overall_hd95']:.2f} |\n")
    with open(os.path.join(out_dir, "sweep_table.md"), "w") as f:
        f.write(table)
    print(table)
    return summary


if __name__ == "__main__":
    main()
