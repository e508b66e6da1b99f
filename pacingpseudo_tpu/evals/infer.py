"""Inference harness: on-device forward + Dice, host-threaded HD95.

Mirrors the reference evaluation loop (inference.py:97-194): per-slice
per-class Dice (hard-label convention) and HD95 with per-dataset pixel
spacing, accumulated by AvgMeters that skip NaNs, written to
``eval_data.npz`` as (num_slices, num_classes) arrays, fold averages logged
excluding background.

TPU changes: slices run in fixed-size batches (the reference uses
batch_size=1, inference.py:72); the forward, softmax and argmax stay on
device; hard predictions stream to the host where the scipy-EDT HD95
(evals/hd.py, medpy-parity) runs in a worker pool that overlaps the next
device batch — the host/device split called for in SURVEY.md §7.
"""
from __future__ import annotations

import concurrent.futures
import logging
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pacingpseudo_tpu.aug.engine import eval_preprocess_image
from pacingpseudo_tpu.config import DATASETS
from pacingpseudo_tpu.data import BatchLoader, SliceDataset, read_test_split
from pacingpseudo_tpu.evals.dice import compute_dice_hard
from pacingpseudo_tpu.evals.hd import compute_95hd
from pacingpseudo_tpu.models.unet import UNet
from pacingpseudo_tpu.train.checkpoint import (
    restore_batch_stats,
    restore_params,
    saved_is_siamese,
)
from pacingpseudo_tpu.utils import AvgMeter


def run_inference(dataset: str, fold: int, checkpoint_path: str,
                  data_root: str, run_dir: str, batch_size: int = 8,
                  model_kwargs: Dict = None, compute_dtype: str = "bfloat16",
                  num_workers: int = 4, spatial_shards: int = 1):
    spec = DATASETS[dataset]
    num_classes = spec.num_classes
    spacing = spec.spacing
    logging.info("Number of classes: %d", num_classes)
    logging.info("Spacing: %s", (spacing,))

    model_kwargs = dict(model_kwargs or {})
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    model = UNet(num_classes=num_classes, elab_end_points=False, dtype=dtype,
                 **model_kwargs)

    test_files = read_test_split(data_root, dataset, fold)
    ds = SliceDataset(test_files, num_classes, spec.ignored_index)
    loader = BatchLoader(ds, batch_size, shuffle=False, drop_last=False,
                         num_threads=num_workers)
    logging.info("Length %d", len(loader))

    # Initialise template variables, then load the checkpoint (with the
    # siamese backbone-extraction fallback, inference.py:138-146).
    cs = ds.canvas_size
    tmpl = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, cs, cs, 1), jnp.float32), train=False)
    params = restore_params(checkpoint_path, tmpl["params"])
    backbone_only = saved_is_siamese(checkpoint_path)
    batch_stats = restore_batch_stats(checkpoint_path, tmpl["batch_stats"],
                                      backbone_only)
    variables = {"params": params, "batch_stats": batch_stats}

    # Optional spatial sharding (parallel/spatial.py): with n devices and
    # --spatial_shards s, activations shard batch x height over a
    # ('data', 'space') mesh — GSPMD conv halo exchanges, same predictions.
    spatial_constraint = None
    n_space = max(1, int(spatial_shards))
    if n_space > 1:
        n_avail = len(jax.devices())
        if n_avail // n_space < 1:
            logging.info("clamping spatial_shards %d -> %d (devices)",
                         n_space, n_avail)
            n_space = n_avail
        if n_space > 1:
            from pacingpseudo_tpu.parallel.spatial import (
                make_spatial_constraint, train_mesh)
            mesh = train_mesh(max(n_avail // n_space, 1), n_space)
            spatial_constraint = make_spatial_constraint(mesh)
            logging.info("inference mesh: data=%d x space=%d",
                         mesh.shape["data"], mesh.shape["space"])

    @jax.jit
    def forward_hard(image_f16, size):
        image = eval_preprocess_image(image_f16, size)
        if spatial_constraint is not None:
            image = spatial_constraint({"image": image})["image"]
        out = model.apply(variables, image, train=False)
        # uint8 halves-again the prediction download (num_classes <= 255)
        return jnp.argmax(out["segmentation/logits"], axis=-1).astype(jnp.uint8)

    dicearr: List[List[float]] = []
    hd95arr: List[List[float]] = []
    meter_dice = [AvgMeter() for _ in range(num_classes)]
    meter_hd95 = [AvgMeter() for _ in range(num_classes)]

    def host_metrics(pred, label, h, w):
        p = pred[:h, :w]
        l = label[:h, :w].astype(np.int64)
        return (compute_dice_hard(p, l, num_classes),
                compute_95hd(p, l, num_classes, spacing))

    tic = time.time()
    n_slices = 0
    with concurrent.futures.ThreadPoolExecutor(max(num_workers, 1)) as pool:
        pending = []
        in_flight = []  # double buffer: overlap device batch i+1 with D2H of i

        def _drain(entry):
            nonlocal n_slices
            dev_preds, raw = entry
            preds = np.asarray(dev_preds)
            for i in range(preds.shape[0]):
                h, w = int(raw["size"][i][0]), int(raw["size"][i][1])
                pending.append(pool.submit(
                    host_metrics, preds[i], raw["label"][i], h, w))
                n_slices += 1

        for raw in loader:
            raw.pop("uid")
            # upload only the image (f16) + sizes; labels stay host-side
            dev_preds = forward_hard(
                jnp.asarray(raw["image"].astype(np.float16)),
                jnp.asarray(raw["size"]))
            in_flight.append((dev_preds, raw))
            if len(in_flight) > 1:
                _drain(in_flight.pop(0))
        while in_flight:
            _drain(in_flight.pop(0))
        for fut in pending:
            dicelog, hd95log = fut.result()
            dicearr.append(dicelog)
            hd95arr.append(hd95log)
            for cls in range(num_classes):
                if not np.isnan(dicelog[cls]):
                    meter_dice[cls].update(dicelog[cls])
                if not np.isnan(hd95log[cls]):
                    meter_hd95[cls].update(hd95log[cls])
    toc = time.time()

    dicearr_np = np.asarray(dicearr, np.float32)
    hd95arr_np = np.asarray(hd95arr, np.float32)
    np.savez(os.path.join(run_dir, "eval_data"),
             dicearr=dicearr_np, hd95arr=hd95arr_np)

    foldavgdice = float(np.mean([meter_dice[c].avg for c in range(1, num_classes)]))
    foldavghd95 = float(np.mean([meter_hd95[c].avg for c in range(1, num_classes)]))
    logging.info("Dataset: %s", dataset)
    logging.info("Number of classes: %d", num_classes)
    logging.info("Fold %d, overall Dice: %.4f, overall HD95: %.2f",
                 fold, foldavgdice, foldavghd95)
    logging.info("Shape of the Dice array: %s", dicearr_np.shape)
    logging.info("Shape of the HD95 array: %s", hd95arr_np.shape)
    logging.info("%d slices in %.1fs (%.1f slices/s)",
                 n_slices, toc - tic, n_slices / max(toc - tic, 1e-9))
    return {"dice": foldavgdice, "hd95": foldavghd95,
            "dicearr": dicearr_np, "hd95arr": hd95arr_np}
