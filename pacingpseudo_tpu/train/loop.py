"""Experiment orchestration: run dirs, logging, TB, the epoch loop.

The single parameterised driver replacing the reference's per-dataset
copy-paste scripts (SURVEY.md §2 end-note): ``train_driver(config,
data_root)`` runs either the pacing (Control/Experiment) or the Upperbound
session on any dataset.

Loop structure mirrors train_chaos.py:242-429 / upper_bound_chaos.py:146-243:
per-epoch LR decay (inside the jitted step), train inner loop, TensorBoard
scalars + figure panels, full-label validation Dice, per-epoch ``valdice``
array, best/interval/final checkpoints — plus resume, config.json dumping
(replacing the reference's script self-copy, train_chaos.py:445) and a
slices/sec throughput meter (the BASELINE.json north-star metric).

Throughput design: raw host batches go straight to device; augmentation,
both forwards, all losses, backward, optimizer and the memory bank run in
ONE jitted program per step; metrics are accumulated **on device** and only
materialised once per epoch, so the step stream never blocks on host sync.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import subprocess
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pacingpseudo_tpu.aug.engine import eval_preprocess_batch, make_train_augment_fn
from pacingpseudo_tpu.aug.presets import base_params_for, strong_params_for
from pacingpseudo_tpu.config import ExperimentConfig
from pacingpseudo_tpu.data import BatchLoader, SliceDataset, read_fold_split
from pacingpseudo_tpu.models import PacingPseudoModel
from pacingpseudo_tpu.parallel import (
    data_mesh,
    factor_devices,
    replicate,
    shard_batch,
    stage_resident_pool,
)
from pacingpseudo_tpu.train import checkpoint as ckpt_lib
from pacingpseudo_tpu.train.optim import make_optimizer
from pacingpseudo_tpu.train.state import create_train_state
from pacingpseudo_tpu.train.step import (
    make_chunked_train_step,
    make_pacing_eval_step,
    make_pacing_train_step,
    make_resident_chunked_train_step,
    make_resident_eval_fn,
    make_upper_bound_eval_step,
    make_upper_bound_train_step,
)
from pacingpseudo_tpu.utils import AvgMeter


def make_run_dir(config: ExperimentConfig) -> str:
    """Reference naming: ``<root>/<modality>/<session>/<session>-<time>-fold<k>-<tag>``
    (train_chaos.py:441-444; the modality level exists for chaos only)."""
    parts = [config.root]
    if config.dataset.startswith("chaos"):
        parts.append(config.modality)
    parts += [config.session,
              f"{config.session}-{time.strftime('%H-%M-%S-%m%d')}-fold{config.fold}-{config.tag}"]
    run_dir = os.path.join(*parts)
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(os.path.join(run_dir, "ckps"), exist_ok=True)
    return run_dir


def setup_logging(run_dir: str):
    logging.basicConfig(
        filename=os.path.join(run_dir, "log.txt"), level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s", datefmt="%H:%M:%S",
        force=True)
    import sys
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    # Orbax/absl emit a line per checkpoint shard at INFO — keep log.txt
    # readable like the reference's.
    for noisy in ("orbax", "absl", "jax"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def dump_config(run_dir: str, config: ExperimentConfig):
    """Reproducibility record: full config + git revision (replaces the
    reference's self-copy of the driver script)."""
    payload = dataclasses.asdict(config)
    try:
        payload["git_rev"] = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=os.path.dirname(__file__),
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        payload["git_rev"] = None
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)


def _tb_writer(run_dir: str):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir=os.path.join(run_dir, "tb_summary"))
    except Exception:
        logging.info("tensorboardX unavailable; TB logging disabled")
        return None


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _tb_train_figures(tb, batch, outputs, epoch):
    """TRAINING-batch figure panels + histograms (train_chaos.py:320-360).

    ``batch``: the augmented training batch (host numpy, NHWC);
    ``outputs``: figure-forward logits.  The full reference panel set:
    image / scribble / weak prediction / prob_weak_max histogram, plus the
    strong image+prediction+histogram and the auxiliary prediction when
    those branches run.  Two reference slips are corrected: the misspelled
    ``predicitons/image_strong`` tag, and ``histogram/prob_strong_max``
    being fed prob_weak_max (train_chaos.py:352).
    """
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return

    def _fig(arr, cmap=None):
        fig = plt.figure()
        plt.imshow(arr, cmap)
        return fig

    tb.add_figure("predictions/image", _fig(batch["image"][0, ..., 0], "gray"), epoch)
    tb.add_figure("predictions/scribble",
                  _fig(batch["scribble"][0].argmax(-1)), epoch)
    probs_w = _np_softmax(outputs["segmentation/logits"])
    tb.add_figure("predictions/prediction_decoder_weak",
                  _fig(probs_w[0].argmax(-1)), epoch)
    tb.add_histogram("histogram/prob_weak_max", probs_w.max(-1), epoch)
    if "segmentation/logits_strong" in outputs:
        tb.add_figure("predictions/image_strong",
                      _fig(batch["image_strong"][0, ..., 0], "gray"), epoch)
        probs_s = _np_softmax(outputs["segmentation/logits_strong"])
        tb.add_figure("predictions/prediction_decoder_strong",
                      _fig(probs_s[0].argmax(-1)), epoch)
        tb.add_histogram("histogram/prob_strong_max", probs_s.max(-1), epoch)
    if "aux/logits" in outputs:
        probs_a = _np_softmax(outputs["aux/logits"])
        tb.add_figure("predictions/prediction_auxiliary_segmentation",
                      _fig(probs_a[0].argmax(-1)), epoch)
    plt.close("all")


def _make_figure_forward(model):
    """One frozen-BN forward for the TB panels: runs the strong stream and
    the aux path (``train=True``) without mutating any state."""

    @jax.jit
    def fwd(state, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, batch["image"],
                           batch.get("image_strong"),
                           train=True, module_train=False)

    return fwd


def _build_model(config: ExperimentConfig, siamese: bool) -> PacingPseudoModel:
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    return PacingPseudoModel(
        input_ch=config.input_ch,
        init_ch=config.init_ch,
        max_ch=config.max_ch,
        num_classes=config.num_classes,
        output_stride=config.output_stride,
        is_stride_conv=config.is_stride_conv,
        is_trans_conv=config.is_trans_conv,
        do_aux_path=config.do_aux_path and siamese,
        feat_stage=tuple(config.feat_stage),
        hid_ch=config.hid_ch,
        aux_drop_prob=config.aux_drop_prob,
        aux_on_strong=config.aux_on_strong,
        fuse_streams=config.fuse_streams,
        s2d_hires=config.s2d_hires,
        dtype=dtype,
    )


def _shrink_raw(raw: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Shrink host->device transfer dtypes: image f16, labels/scribbles u8.

    The relay link makes batch upload a visible cost; the aug engine casts
    back to float32 on device (f16 is lossless for label values and ~1e-3
    relative for intensities — far below augmentation noise).
    """
    out = dict(raw)
    if out["image"].dtype != np.float16:
        out["image"] = out["image"].astype(np.float16)
    for k in ("label", "scribble"):
        if k in out and out[k].dtype != np.uint8:
            out[k] = out[k].astype(np.uint8)
    return out


def _pad_batch(raw: Dict[str, np.ndarray], to: int):
    """Pad a partial batch to the static batch size (repeat last sample)."""
    n = raw["image"].shape[0]
    if n == to:
        return raw, n
    reps = to - n
    out = {}
    for k, v in raw.items():
        if isinstance(v, list):
            out[k] = v + [v[-1]] * reps
        else:
            out[k] = np.concatenate([v, np.repeat(v[-1:], reps, axis=0)])
    return out, n


def _device_metrics_accumulate(acc, metrics):
    if acc is None:
        return {k: v for k, v in metrics.items()}
    return {k: acc[k] + metrics[k] for k in metrics}


class ValState:
    """Host-side per-epoch validation aggregation (AvgMeters skipping NaN,
    train_chaos.py:372-391)."""

    def __init__(self, num_classes):
        self.loss = AvgMeter()
        self.dsc = [AvgMeter() for _ in range(num_classes)]

    def update(self, loss, dice_nc, n_real, n_batch):
        self.loss.update(float(loss), n=n_batch)
        d = np.asarray(dice_nc)[:n_real]
        for row in d:
            for cls, val in enumerate(row):
                if not np.isnan(val):
                    self.dsc[cls].update(float(val))

    def summary(self):
        per_class = [m.avg for m in self.dsc]
        avg_all = float(np.mean(per_class[1:])) if len(per_class) > 1 else per_class[0]
        return per_class, avg_all


def train_driver(config: ExperimentConfig, data_root: str,
                 run_dir: Optional[str] = None,
                 max_steps_per_epoch: Optional[int] = None,
                 stop_after_epoch: Optional[int] = None) -> str:
    """Run a full training session; returns the run directory.

    ``stop_after_epoch=k`` exits cleanly after completing epoch ``k``
    (schedules still span ``config.epoch``) — a crash-at-epoch-k simulator
    for resume-equivalence tests.

    On a multi-device host the fused Pallas ConvLayer is forced to the
    XLA path for the DURATION of the run (its in-kernel BN statistics
    would be per-shard, breaking sync-BN; ADVICE r4) and restored after —
    process-global impl state must not leak across runs.
    """
    from pacingpseudo_tpu.ops.pallas.fused_convbn import (
        get_conv_impl, set_conv_impl)
    avail = config.num_devices or len(jax.devices())
    prev_impl = get_conv_impl()
    if avail > 1 and prev_impl != "xla":
        logging.info("multi-device host (%d): forcing conv impl %s -> xla "
                     "for this run (in-kernel BN statistics are per-shard)",
                     avail, prev_impl)
        set_conv_impl("xla")
        try:
            return _train_driver(config, data_root, run_dir,
                                 max_steps_per_epoch, stop_after_epoch)
        finally:
            set_conv_impl(prev_impl)
    return _train_driver(config, data_root, run_dir,
                         max_steps_per_epoch, stop_after_epoch)


def _train_driver(config: ExperimentConfig, data_root: str,
                  run_dir: Optional[str] = None,
                  max_steps_per_epoch: Optional[int] = None,
                  stop_after_epoch: Optional[int] = None) -> str:
    config.validate()
    upper_bound = config.session == "Upperbound"
    siamese = not upper_bound
    do_strong = config.do_decoder_consistency and siamese

    if run_dir is None:
        run_dir = make_run_dir(config)
    setup_logging(run_dir)
    dump_config(run_dir, config)
    logging.info("config: %s", json.dumps(dataclasses.asdict(config), default=str))

    # ---- data
    train_files, val_files = read_fold_split(
        data_root, config.dataset, config.fold,
        config.modality if config.dataset.startswith("chaos") else None)
    train_ds = SliceDataset(train_files, config.num_classes, config.ignored_index)
    val_ds = SliceDataset(val_files, config.num_classes, config.ignored_index,
                          canvas_size=train_ds.canvas_size)
    train_loader = BatchLoader(train_ds, config.batch_size, shuffle=True,
                               drop_last=True, seed=config.seed)
    val_loader = BatchLoader(val_ds, config.batch_size, shuffle=False,
                             drop_last=False)
    steps_per_epoch = len(train_loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    logging.info("train slices=%d val slices=%d steps/epoch=%d canvas=%d",
                 len(train_ds), len(val_ds), steps_per_epoch, train_ds.canvas_size)

    # ---- mesh / model / state.  The data mesh must divide the batch; use
    # the largest divisor of batch_size not exceeding the available devices.
    # With --spatial_shards > 1 the devices split as data x space and the
    # jitted steps reshard activation heights over 'space'
    # (parallel/spatial.py; GSPMD conv halo exchanges).
    # --spatial_shards 0 (default) = AUTO: when pure data parallelism would
    # idle devices (the reference batch of 12 on an 8-chip slice only
    # divides 6 ways), factor the devices as data x space instead so ALL
    # chips carry load at the exact reference batch — identical semantics
    # (global-batch BN stats, halo-exchanged convs; tests/test_sharding.py)
    # rather than pad-and-mask batch distortion.
    avail = config.num_devices or len(jax.devices())
    n_space = int(config.spatial_shards)
    if n_space == 0:
        n_space, n_dev = factor_devices(avail, config.batch_size)
        if n_space > 1:
            logging.info(
                "auto spatial fallback: batch %d on %d devices -> "
                "data=%d x space=%d (pure data mesh would idle %d)",
                config.batch_size, avail, n_dev, n_space,
                avail - max(d for d in range(1, avail + 1)
                            if config.batch_size % d == 0))
    else:
        if n_space > 1 and avail // n_space < 1:
            logging.info("clamping spatial_shards %d -> %d (devices)",
                         n_space, avail)
            n_space = avail
        avail_data = max(avail // n_space, 1)
        n_dev = max(d for d in range(1, avail_data + 1)
                    if config.batch_size % d == 0)
        if n_dev != avail_data:
            logging.info("clamping data mesh %d -> %d (batch %d divisibility)",
                         avail_data, n_dev, config.batch_size)
    spatial_constraint = None
    if n_space > 1:
        from pacingpseudo_tpu.parallel.spatial import (
            make_spatial_constraint, train_mesh)
        mesh = train_mesh(n_dev, n_space)
        spatial_constraint = make_spatial_constraint(mesh)
        logging.info("devices: %s (mesh data=%d x space=%d)",
                     jax.devices()[: n_dev * n_space], n_dev, n_space)
    else:
        mesh = data_mesh(n_dev)
        logging.info("devices: %s (data mesh of %d)", jax.devices()[:n_dev], n_dev)
    # (fused-conv impl forcing for multi-device hosts happens in the
    # train_driver wrapper above, scoped to the run and restored after)

    model = _build_model(config, siamese)
    tx = make_optimizer(config, steps_per_epoch)

    base_params = base_params_for(config.dataset)
    if config.input_size:
        base_params = dataclasses.replace(
            base_params, crop_size=tuple(config.input_size))
    if config.aug_image_interp != base_params.image_interp:
        base_params = dataclasses.replace(
            base_params, image_interp=config.aug_image_interp)
    strong_params = strong_params_for(config.augmentations, config.strength)
    augment_fn = make_train_augment_fn(base_params, strong_params, do_strong)

    # template batch (post-augmentation shapes) for init
    ch, cw = base_params.crop_size
    tmpl = {"image": jnp.zeros((config.batch_size, ch, cw, 1), jnp.float32)}
    rng = jax.random.PRNGKey(config.seed)
    state = create_train_state(rng, model, tx, tmpl,
                               with_memory=config.do_memory and siamese,
                               num_classes=config.num_classes,
                               hid_ch=config.hid_ch, siamese=siamese)

    start_epoch = 0
    if config.resume:
        latest = ckpt_lib.latest_checkpoint(run_dir)
        if latest:
            state = ckpt_lib.restore_checkpoint(latest, state)
            start_epoch = int(state.step) // steps_per_epoch
            logging.info("resumed from %s at epoch %d", latest, start_epoch)
    state = replicate(state, mesh)

    # ---- jitted steps (normal + frozen-BN quirk variant)
    if upper_bound:
        make_train = make_upper_bound_train_step
        eval_step = make_upper_bound_eval_step(
            config, model, spatial_constraint=spatial_constraint)
    else:
        make_train = make_pacing_train_step
        eval_step = make_pacing_eval_step(
            config, model, spatial_constraint=spatial_constraint)

    # Chunked dispatch: scan ``steps_per_dispatch`` steps into one XLA
    # program to amortise host->device dispatch latency (step.py).
    chunk = max(1, int(config.steps_per_dispatch))
    chunk = min(chunk, steps_per_epoch)

    # Device-resident data: stage every training canvas in HBM once and
    # send only per-step index blocks (step.py make_resident_chunked_...).
    pool_bytes = len(train_ds) * train_ds.canvas_size ** 2 * 4  # f16+u8+u8
    # Sharded over the data mesh the per-chip footprint is pool/n_dev, so
    # the budget scales with the mesh (round 1 gated this to n_dev==1).
    use_resident = (config.device_resident_data == "on"
                    or (config.device_resident_data == "auto"
                        and pool_bytes < n_dev * 6 * 2 ** 30))
    # With spatial sharding the pool stays sharded over 'data' only
    # (replicated across 'space'); the gather's psum_scatter rides the
    # data axis and the step's sharding constraint spreads H afterwards.
    mesh_multi = mesh if (n_dev > 1 or n_space > 1) else None
    resident_pool = None
    if use_resident:
        logging.info("staging %d slices (%.2f GB, /%d chips) in device memory",
                     len(train_ds), pool_bytes / 2 ** 30, n_dev)
        stage_loader = BatchLoader(train_ds, batch_size=256, shuffle=False,
                                   drop_last=False)
        parts = [_shrink_raw({k: v for k, v in b.items() if k != "uid"})
                 for b in stage_loader]
        resident_pool = stage_resident_pool(
            {k: np.concatenate([p[k] for p in parts]) for k in parts[0]},
            mesh)
        del parts

    # Resident validation: stage the val pool + static index blocks so the
    # whole validation pass is ONE dispatch (step.py make_resident_eval_fn).
    val_pool = val_idx_blocks = val_valid_blocks = resident_eval = None
    if use_resident:
        vstage = BatchLoader(val_ds, batch_size=256, shuffle=False,
                             drop_last=False)
        parts = [_shrink_raw({k: v for k, v in b.items() if k != "uid"})
                 for b in vstage]
        val_pool = stage_resident_pool(
            {k: np.concatenate([p[k] for p in parts]) for k in parts[0]},
            mesh)
        del parts
        n_val = len(val_ds)
        n_blocks = (n_val + config.batch_size - 1) // config.batch_size
        idx = np.arange(n_blocks * config.batch_size)
        val_valid_blocks = jnp.asarray(
            (idx < n_val).reshape(n_blocks, config.batch_size))
        val_idx_blocks = jnp.asarray(
            np.minimum(idx, n_val - 1).reshape(n_blocks, config.batch_size),
            jnp.int32)
        resident_eval = make_resident_eval_fn(config, model, upper_bound,
                                              mesh=mesh_multi)

    rem = steps_per_epoch % chunk

    def _build(module_train):
        body = make_train(config, model, tx, steps_per_epoch,
                          module_train=module_train, augment_fn=augment_fn,
                          jit=False, spatial_constraint=spatial_constraint)
        single = jax.jit(body, donate_argnums=(0,))
        if use_resident:
            rmesh = mesh_multi
            chunked = make_resident_chunked_train_step(body, chunk, mesh=rmesh)
            chunked_rem = (make_resident_chunked_train_step(body, rem,
                                                            mesh=rmesh)
                           if rem else None)
        else:
            chunked = (make_chunked_train_step(body, chunk)
                       if chunk > 1 else None)
            chunked_rem = None
        return single, chunked, chunked_rem

    train_step, train_chunked, train_chunked_rem = _build(True)
    train_step_frozen = train_chunked_frozen = train_chunked_rem_frozen = None
    if config.ref_quirk_bn_eval_after_first_epoch:
        (train_step_frozen, train_chunked_frozen,
         train_chunked_rem_frozen) = _build(False)

    tb = _tb_writer(run_dir)
    fig_forward = fig_gather = None
    if tb is not None and config.tb_figures and not upper_bound:
        fig_forward = _make_figure_forward(model)
        if use_resident:
            from pacingpseudo_tpu.parallel import make_resident_gather
            fig_gather = make_resident_gather(mesh_multi)
    valdice = np.zeros(config.epoch)
    if start_epoch > 0:
        # keep pre-resume history in valdice.npz (reference artifact parity)
        prev = os.path.join(run_dir, "valdice.npz")
        if os.path.isfile(prev):
            old_vd = np.load(prev)["valdice"]
            n = min(len(old_vd), start_epoch, config.epoch)
            valdice[:n] = old_vd[:n]
    best_avg, best_epoch = 0.0, 0
    if start_epoch > 0:
        # restore the best tracker so a resumed run cannot overwrite
        # best_ckp with a worse epoch
        hist = valdice[:start_epoch]
        if hist.size and hist.max() > 0:
            best_epoch = int(hist.argmax())
            best_avg = float(hist.max())
    data_rng = jax.random.PRNGKey(config.seed + 1)

    profiled = False
    for epoch in range(start_epoch, config.epoch):
        if (config.profile_dir and not profiled and epoch > start_epoch):
            # one profiler trace after warm compile (SURVEY.md §5 tracing)
            try:
                jax.profiler.start_trace(config.profile_dir)
                profiled = True
            except Exception as e:  # relay backends may not support tracing
                logging.info("profiler unavailable: %s", e)
                profiled = True
        tic = time.time()
        step_fn, chunked_fn, chunked_rem_fn = (
            train_step, train_chunked, train_chunked_rem)
        if train_step_frozen is not None and epoch >= 1:
            step_fn, chunked_fn, chunked_rem_fn = (
                train_step_frozen, train_chunked_frozen,
                train_chunked_rem_frozen)

        acc = None
        n_steps = 0

        if use_resident:
            # Shuffle slice indices on host; ship only (chunk, batch) int32
            # blocks — batches are gathered from the HBM pool on device.
            # The order is a pure function of (seed, epoch) so resume at
            # epoch k replays the uninterrupted run's shuffle exactly.
            order = np.arange(len(train_ds))
            np.random.RandomState([config.seed + 2, epoch]).shuffle(order)
            order = order[:steps_per_epoch * config.batch_size]
            blocks = order.reshape(steps_per_epoch, config.batch_size)
            pos = 0
            while pos < steps_per_epoch:
                k = min(chunk, steps_per_epoch - pos)
                fn = chunked_fn if k == chunk else chunked_rem_fn
                state, metrics = fn(
                    state, resident_pool,
                    jnp.asarray(blocks[pos:pos + k], jnp.int32), data_rng)
                acc = _device_metrics_accumulate(acc, metrics)
                n_steps += k
                pos += k
        pending: List[Dict[str, np.ndarray]] = []

        def _flush_chunk():  # streaming path (datasets too large for HBM)
            nonlocal state, acc, n_steps, pending
            if not pending:
                return
            if chunked_fn is not None and len(pending) == chunk:
                stacked = {k: np.stack([b[k] for b in pending])
                           for k in pending[0]}
                batch = shard_batch(_shrink_raw(stacked), mesh, axis=1)
                state, metrics = chunked_fn(state, batch, data_rng)
                acc = _device_metrics_accumulate(acc, metrics)
                n_steps += len(pending)
            else:
                for b in pending:
                    batch = shard_batch(_shrink_raw(b), mesh)
                    state, metrics = step_fn(state, batch, data_rng)
                    acc = _device_metrics_accumulate(acc, metrics)
                    n_steps += 1
            pending = []

        last_raw = None
        if not use_resident:
            train_loader.set_epoch(epoch)
            for raw in train_loader:
                if n_steps + len(pending) >= steps_per_epoch:
                    break
                raw.pop("uid", None)
                pending.append(raw)
                last_raw = raw
                if len(pending) == chunk:
                    _flush_chunk()
            _flush_chunk()
        if n_steps == 0:
            raise RuntimeError(
                f"empty train epoch: loader yielded no full batch "
                f"(train slices < batch_size {config.batch_size}?)")
        # Materialise the accumulated device metrics BEFORE stopping the
        # epoch timer — dispatches are async and only this host read waits.
        means = {k: float(v) / n_steps for k, v in acc.items()}
        toc = time.time()
        slices_per_sec = n_steps * config.batch_size / max(toc - tic, 1e-9)
        logging.info(
            "epoch: %03d, lr: %.6f, %s, %.2f s/epoch, %.2f slices/s",
            epoch, means.get("lr", 0.0),
            ", ".join(f"{k}: {v:.6f}" for k, v in means.items() if k != "lr"),
            toc - tic, slices_per_sec)
        if epoch == start_epoch:
            # First-epoch wall-clock sanity line: a doomed run (the round-4
            # CPU sweep burned 8 h at 0.04 slices/s before anyone noticed)
            # is visible in ONE log line at launch.
            left = (config.epoch - epoch - 1) * (toc - tic)
            logging.info(
                "first epoch took %.1f s -> projected finish %s (%.2f h "
                "for the remaining %d epochs)",
                toc - tic,
                time.strftime("%Y-%m-%d %H:%M:%S",
                              time.localtime(time.time() + left)),
                left / 3600.0, config.epoch - epoch - 1)
        if tb:
            for k, v in means.items():
                tag = "lr/current_lr" if k == "lr" else f"losses/{k}_train"
                tb.add_scalar(tag, v, epoch)
            tb.add_scalar("perf/slices_per_sec", slices_per_sec, epoch)

        # ---- TB figure panels from the LAST training batch
        # (train_chaos.py:320-360 renders post-loop from `batch`); the aug
        # is re-drawn with an epoch-keyed key and one frozen-BN forward.
        if fig_forward is not None:
            if use_resident:
                raw_fig = fig_gather(
                    resident_pool, jnp.asarray(blocks[-1], jnp.int32))
            elif last_raw is not None:
                raw_fig = {k: jnp.asarray(v)
                           for k, v in _shrink_raw(last_raw).items()}
            else:
                raw_fig = None
            if raw_fig is not None:
                fig_batch = augment_fn(
                    raw_fig, jax.random.fold_in(data_rng, 1_000_000 + epoch))
                fig_out = fig_forward(state, fig_batch)
                _tb_train_figures(
                    tb, {k: np.asarray(v) for k, v in fig_batch.items()},
                    {k: np.asarray(v) for k, v in fig_out.items()
                     if k.endswith("logits") or k.endswith("logits_strong")},
                    epoch)

        # ---- validation (full labels, masked to the live region)
        if use_resident:
            # whole val set in one dispatch; NaN-skipping AvgMeter semantics
            # reproduced by the on-device sums/counts
            acc_val = resident_eval(state, val_pool, val_idx_blocks,
                                    val_valid_blocks)
            dice_sum = np.asarray(acc_val["dice_sum"])
            dice_cnt = np.asarray(acc_val["dice_cnt"])
            per_class = list(np.where(dice_cnt > 0, dice_sum /
                                      np.maximum(dice_cnt, 1.0), 0.0))
            avg_all = (float(np.mean(per_class[1:]))
                       if len(per_class) > 1 else float(per_class[0]))
            val_loss_avg = (float(acc_val["loss_sum"]) /
                            max(float(acc_val["n_sum"]), 1e-9))
        else:
            vs = ValState(config.num_classes)
            for raw in val_loader:
                raw.pop("uid", None)
                raw, n_real = _pad_batch(raw, config.batch_size)
                proc = eval_preprocess_batch(
                    {k: jnp.asarray(v) for k, v in raw.items()},
                    config.num_classes)
                proc = {k: np.asarray(v) for k, v in proc.items()}
                # mask pad-duplicate samples out of the logged val loss
                proc["sample_valid"] = np.arange(config.batch_size) < n_real
                proc = shard_batch(proc, mesh)
                # one forward per batch: loss + region-masked Dice + logits
                if upper_bound:
                    loss_val, _, dice, logits = eval_step(state, proc)
                else:
                    loss_val, dice, logits = eval_step(state, proc)
                vs.update(loss_val, dice, n_real, n_real)
            per_class, avg_all = vs.summary()
            val_loss_avg = vs.loss.avg
        valdice[epoch] = avg_all
        # persist every epoch (cheap) so crash+resume keeps the history;
        # the reference wrote it once at the end (train_chaos.py:428)
        np.savez(os.path.join(run_dir, "valdice"), valdice=valdice)
        spec_names = list(config.spec.classnames)
        logging.info("val: %03d, loss: %.6f, [%s, All: %.4f]",
                     epoch, val_loss_avg,
                     ", ".join(f"{n}: {d:.4f}" for n, d in zip(spec_names, per_class)),
                     avg_all)
        if tb:
            tb.add_scalar("losses/loss_val", val_loss_avg, epoch)
            for n_, d in zip(spec_names, per_class):
                # TB rejects spaces in summary names ("right kidney") with a
                # per-epoch warning; sanitize here, keep log.txt verbatim.
                tb.add_scalar(f"DSC/{n_.replace(' ', '_')}", d, epoch)
            tb.add_scalar("DSC/All", avg_all, epoch)
            tb.add_scalar("DSC/Best", max(best_avg, avg_all), epoch)

        if profiled and config.profile_dir and epoch == start_epoch + 1:
            try:
                jax.profiler.stop_trace()
                logging.info("profiler trace written to %s", config.profile_dir)
            except Exception:
                pass

        # ---- checkpoints (fixed interval precedence + final epoch,
        # reference: train_chaos.py:405-413)
        # Materialise the state on host ONLY when a checkpoint actually
        # fires — device_get of the full state is hundreds of MB over the
        # device link and must not run every epoch.
        save_interval = ((epoch + 1) % config.ckp_interval == 0
                         or (epoch + 1) == config.epoch)
        save_best = avg_all > best_avg
        if save_interval or save_best:
            host_state = jax.tree.map(np.asarray, jax.device_get(state))
            if save_interval:
                ckpt_lib.save_checkpoint(
                    os.path.join(run_dir, "ckps", f"ckp_{epoch}"), host_state)
            if save_best:
                best_epoch, best_avg = epoch, avg_all
                ckpt_lib.save_checkpoint(
                    os.path.join(run_dir, "best_ckp"), host_state)

        if stop_after_epoch is not None and epoch >= stop_after_epoch:
            host_state = jax.tree.map(np.asarray, jax.device_get(state))
            ckpt_lib.save_checkpoint(
                os.path.join(run_dir, "ckps", f"ckp_{epoch}"), host_state)
            logging.info("stop_after_epoch=%d: exiting", stop_after_epoch)
            break

    logging.info("The best at epoch: %d, All: %.4f", best_epoch, best_avg)
    np.savez(os.path.join(run_dir, "valdice"), valdice=valdice)
    if tb:
        tb.close()
    return run_dir
