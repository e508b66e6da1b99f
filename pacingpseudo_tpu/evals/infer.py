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

import collections
import concurrent.futures
import logging
import os
import re
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


def patient_key(uid: str, patient_regex: str = "") -> str:
    """Patient identifier for the published per-patient aggregation.

    The reference README tables average each anatomy over *patients*, then
    over anatomies (README.md:106); slice uids carry the patient as their
    first ``_``-separated token in the common layouts (chaos ``<pat>_<sl>``,
    acdc ``patientXXX_frame_slice``, lvsc ``<SC-..-NN>_...``).  A custom
    ``patient_regex`` (first capture group) overrides the default split.
    Uids with no separator each form their own group, degrading gracefully
    to per-slice aggregation.
    """
    if patient_regex:
        m = re.match(patient_regex, uid)
        if m and m.groups():
            return m.group(1)
    return uid.split("_")[0]


def aggregate_per_patient(uids, arr: np.ndarray, num_classes: int,
                          patient_regex: str = "") -> Dict[str, object]:
    """Published-protocol aggregation (README.md:106, inference.py:185-192):
    per class, average the slice values within each patient (NaN-skipping,
    like the per-slice AvgMeters), then average over patients; the overall
    number averages classes 1..C-1 (background excluded)."""
    import warnings
    groups: Dict[str, List[int]] = {}
    for i, uid in enumerate(uids):
        groups.setdefault(patient_key(str(uid), patient_regex), []).append(i)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
        per_patient = {pat: np.nanmean(arr[idx], axis=0)
                       for pat, idx in groups.items()}   # (num_classes,) each
        class_means = np.nanmean(np.stack(list(per_patient.values())), axis=0)
        overall = float(np.nanmean(class_means[1:num_classes]))
    return {
        "overall": overall,
        "class_means": [float(x) for x in class_means],
        "num_patients": len(groups),
    }


def run_inference(dataset: str, fold: int, checkpoint_path: str,
                  data_root: str, run_dir: str, batch_size: int = 8,
                  model_kwargs: Dict = None, compute_dtype: str = "bfloat16",
                  num_workers: int = 4, spatial_shards: int = 1,
                  patient_regex: str = "", max_backlog: int = 4096,
                  save_pred: str = ""):
    """See module docstring.  ``save_pred``: when set, each slice's hard
    prediction (uint8, cropped to its true extent) is written to
    ``<save_pred>/<uid>.npz`` (key ``pred``) as it streams off the device —
    constant host memory even at LVSC scale.  The reference driver has no
    prediction-export path (it logs metrics only, inference.py:150-194);
    this supports downstream use (challenge submission, qualitative
    review); ``tools.medio.write_nifti`` can stack a patient's slices
    (sorted by uid) into a volume the challenge evaluators accept."""
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
    uids: List[str] = []
    meter_dice = [AvgMeter() for _ in range(num_classes)]
    meter_hd95 = [AvgMeter() for _ in range(num_classes)]

    if save_pred:
        os.makedirs(save_pred, exist_ok=True)

    def host_metrics(pred, label, h, w, uid):
        p = pred[:h, :w]
        l = label[:h, :w].astype(np.int64)
        if save_pred:
            np.savez_compressed(os.path.join(save_pred, f"{uid}.npz"),
                                uid=uid, pred=p.astype(np.uint8))
        return (compute_dice_hard(p, l, num_classes),
                compute_95hd(p, l, num_classes, spacing))

    def _collect(fut):
        dicelog, hd95log = fut.result()
        dicearr.append(dicelog)
        hd95arr.append(hd95log)
        for cls in range(num_classes):
            if not np.isnan(dicelog[cls]):
                meter_dice[cls].update(dicelog[cls])
            if not np.isnan(hd95log[cls]):
                meter_hd95[cls].update(hd95log[cls])

    tic = time.time()
    n_slices = 0
    with concurrent.futures.ThreadPoolExecutor(max(num_workers, 1)) as pool:
        # HD95 futures drain incrementally (results are consumed in submit
        # order) with a hard backlog bound — LVSC streams ~29k slices and
        # must not accumulate one future per slice (VERDICT r2).
        pending = collections.deque()
        in_flight = []  # double buffer: overlap device batch i+1 with D2H of i

        def _drain(entry):
            nonlocal n_slices
            dev_preds, raw = entry
            preds = np.asarray(dev_preds)
            for i in range(preds.shape[0]):
                h, w = int(raw["size"][i][0]), int(raw["size"][i][1])
                pending.append(pool.submit(
                    host_metrics, preds[i], raw["label"][i], h, w,
                    str(raw["uid"][i])))
                uids.append(str(raw["uid"][i]))
                n_slices += 1
            while pending and pending[0].done():
                _collect(pending.popleft())
            while len(pending) > max_backlog:
                _collect(pending.popleft())

        for raw in loader:
            # upload only the image (f16) + sizes; labels stay host-side
            dev_preds = forward_hard(
                jnp.asarray(raw["image"].astype(np.float16)),
                jnp.asarray(raw["size"]))
            in_flight.append((dev_preds, raw))
            if len(in_flight) > 1:
                _drain(in_flight.pop(0))
        while in_flight:
            _drain(in_flight.pop(0))
        while pending:
            _collect(pending.popleft())
    toc = time.time()

    dicearr_np = np.asarray(dicearr, np.float32)
    hd95arr_np = np.asarray(hd95arr, np.float32)
    # uids persist so the published per-patient protocol stays computable
    # from the artifact (the reference's eval_data.npz drops them)
    np.savez(os.path.join(run_dir, "eval_data"),
             dicearr=dicearr_np, hd95arr=hd95arr_np,
             uids=np.asarray(uids))

    foldavgdice = float(np.mean([meter_dice[c].avg for c in range(1, num_classes)]))
    foldavghd95 = float(np.mean([meter_hd95[c].avg for c in range(1, num_classes)]))
    pat_dice = aggregate_per_patient(uids, dicearr_np, num_classes, patient_regex)
    pat_hd95 = aggregate_per_patient(uids, hd95arr_np, num_classes, patient_regex)
    logging.info("Dataset: %s", dataset)
    logging.info("Number of classes: %d", num_classes)
    logging.info("Fold %d, overall Dice: %.4f, overall HD95: %.2f",
                 fold, foldavgdice, foldavghd95)
    logging.info("Per-patient (%d patients) Dice: %.4f, HD95: %.2f "
                 "(README.md:106 protocol)", pat_dice["num_patients"],
                 pat_dice["overall"], pat_hd95["overall"])
    logging.info("Shape of the Dice array: %s", dicearr_np.shape)
    logging.info("Shape of the HD95 array: %s", hd95arr_np.shape)
    logging.info("%d slices in %.1fs (%.1f slices/s)",
                 n_slices, toc - tic, n_slices / max(toc - tic, 1e-9))
    return {"dice": foldavgdice, "hd95": foldavghd95,
            "dice_per_patient": pat_dice["overall"],
            "hd95_per_patient": pat_hd95["overall"],
            "num_patients": pat_dice["num_patients"],
            "dicearr": dicearr_np, "hd95arr": hd95arr_np, "uids": uids}
