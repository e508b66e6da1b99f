"""Inference/eval CLI — argv-compatible with the reference inference.py.

``python inference.py --dataset chaost1 --fold 0 --checkpoint_file <run_dir>
[--best_ckp]`` reproduces the reference surface (inference.py:30-95):
checkpoint resolution (best vs final-epoch), the fold/checkpoint alignment
assert, per-slice DSC + HD95 with per-dataset pixel spacing, and the
``eval_data.npz`` output (dicearr, hd95arr).

TPU design: slices are batched (default 8 — the reference's bs=1 wastes the
chip), the forward + hard argmax run on device, and hard predictions stream
to the host where HD95 (scipy EDT, medpy-compatible — evals/hd.py) runs in
a thread pool overlapping the next device batch.
"""
from __future__ import annotations

import argparse
import logging
import os
import random

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="pacingpseudo_tpu inference")
    p.add_argument("--gpu", type=str, default="1",
                   help="accepted for CLI compatibility; ignored")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--root", type=str, default="./outputs")
    p.add_argument("--session", type=str, default="Inference")
    p.add_argument("--fold", type=int, required=True)
    p.add_argument("--checkpoint_file", type=str, required=True)
    p.add_argument("--best_ckp", action="store_true", default=False)
    p.add_argument("--dataset", type=str, default="acdc",
                   choices=["acdc", "chaost1", "chaost2", "lvsc"])
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    # Backbone (inference.py:76-95)
    p.add_argument("--input_ch", type=int, default=1)
    p.add_argument("--init_ch", type=int, default=32)
    p.add_argument("--max_ch", type=int, default=512)
    p.add_argument("--output_stride", type=int, default=8, choices=[32, 16, 8])
    p.add_argument("--is_stride_conv", action="store_true", default=False)
    p.add_argument("--is_trans_conv", action="store_true", default=False)
    # TPU-native extensions
    p.add_argument("--data_root", type=str, default="./data")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="shard activation height over a 'space' mesh axis "
                        "(devices split as data x space; parallel/spatial.py)")
    p.add_argument("--patient_regex", type=str, default="",
                   help="regex whose first capture group maps a slice uid to "
                        "its patient id for the per-patient aggregation "
                        "(default: first '_'-separated token)")
    p.add_argument("--save_pred", action="store_true", default=False,
                   help="also write each slice's hard prediction to "
                        "<run_dir>/preds/<uid>.npz (uint8, cropped to the "
                        "slice's true extent)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    random.seed(args.seed)
    np.random.seed(args.seed)

    # Mechanical single-chip safety (see utils/chiplock.py).
    from pacingpseudo_tpu.utils.chiplock import preflight_chip
    preflight_chip(owner_note=f"cli.inference {args.dataset} fold{args.fold}",
                   wait_s=float(os.environ.get("CHIP_LOCK_WAIT", "0")))

    from pacingpseudo_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    # fold/checkpoint alignment (inference.py:269)
    assert f"fold{args.fold}" in args.checkpoint_file, (
        f"checkpoint path must contain fold{args.fold}")

    from pacingpseudo_tpu.train.checkpoint import resolve_checkpoint_path
    ckpt_path = args.checkpoint_file
    if os.path.isdir(ckpt_path) and not os.path.isdir(
            os.path.join(ckpt_path, "_CHECKPOINT_METADATA")):
        resolved = resolve_checkpoint_path(ckpt_path, args.dataset, args.best_ckp)
        if os.path.isdir(resolved):
            ckpt_path = resolved

    run_dir = os.path.join(args.root, args.session, args.dataset,
                           os.path.basename(os.path.normpath(args.checkpoint_file)))
    os.makedirs(run_dir, exist_ok=True)
    logging.basicConfig(
        filename=os.path.join(run_dir, "log.txt"), level=logging.INFO,
        filemode="w", format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S", force=True)
    import sys
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    logging.info("args: %s", vars(args))
    logging.info("checkpoint: %s", ckpt_path)

    from pacingpseudo_tpu.evals.infer import run_inference
    return run_inference(
        dataset=args.dataset,
        fold=args.fold,
        checkpoint_path=ckpt_path,
        data_root=args.data_root,
        run_dir=run_dir,
        batch_size=args.batch_size,
        model_kwargs=dict(
            input_ch=args.input_ch,
            init_ch=args.init_ch,
            max_ch=args.max_ch,
            output_stride=args.output_stride,
            is_stride_conv=args.is_stride_conv,
            is_trans_conv=args.is_trans_conv,
        ),
        compute_dtype=args.compute_dtype,
        num_workers=args.num_workers,
        spatial_shards=args.spatial_shards,
        patient_regex=args.patient_regex,
        save_pred=os.path.join(run_dir, "preds") if args.save_pred else "",
    )


if __name__ == "__main__":
    main()
