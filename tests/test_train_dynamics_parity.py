"""Training-DYNAMICS parity vs the actual PyTorch reference.

Forward parity (test_torch_parity.py) pins same-weights→same-logits; this
module pins the part where silent quality regressions hide: optimizer
coupling, BN-momentum evolution, ramp weighting, memory-bank drift.  It
trains the real reference loop — ``ConsistencyRegulr`` forward + driver
loss assembly + ``torch.optim.Adam`` + ``poly_lr_decay``
(/root/reference/train_chaos.py:242-315, consistency_reglur_memory.py:24-102)
— and this framework's jitted step side by side on identical tiny data,
from identical imported weights, with the quirk flags pinned to reference
behaviour (``memory_update_mode=first``,
``ref_quirk_bn_eval_after_first_epoch``, ``fuse_streams=False``, float32),
and asserts per-loss trajectories and validation Dice agree.

Augmentation randomness is cancelled by injecting a shared pre-built batch
stream into both loops (no augment_fn / base_transforms).  This is the
closest achievable proxy for the ±0.5-DSC north star until real
CHAOS/ACDC/LVSC data is mounted (VERDICT.md round-1, item 1).
"""
import copy
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from pacingpseudo_tpu.config import ExperimentConfig
from pacingpseudo_tpu.tools.torch_import import convert_state_dict
from pacingpseudo_tpu.train.loop import _build_model
from pacingpseudo_tpu.train.optim import make_optimizer
from pacingpseudo_tpu.train.state import TrainState
from pacingpseudo_tpu.train.step import (
    make_pacing_eval_step,
    make_pacing_train_step,
)

# the reference AuxPath calls .cuda() at construction (aux_path_memory.py:44)
torch.Tensor.cuda = lambda self, *a, **k: self

EPOCHS, STEPS, N, H, C = 5, 4, 4, 32, 3
IGN = C
HID, INIT_CH, MAX_CH = 16, 8, 64
LR, WD = 1e-4, 3e-4
VAL_N = 8


def _one_hot(x, n):
    return np.eye(n, dtype=np.float32)[x]


def _make_stream(seed):
    """Deterministic batch stream shared by both frameworks.

    Structured blobs (not pure noise) so the losses have signal; scribbles
    are sparse (mostly ignored); valid_mask has a zeroed border band to
    exercise the masked-mean semantics.
    """
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(EPOCHS * STEPS):
        yy, xx = np.mgrid[0:H, 0:H].astype(np.float32)
        img = np.zeros((N, H, H), np.float32)
        lab = np.zeros((N, H, H), np.int64)
        for i in range(N):
            cy, cx = rng.uniform(8, H - 8, 2)
            r = rng.uniform(4, 9)
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            lab[i] = np.where(d < r * 0.6, 2, np.where(d < r, 1, 0))
            img[i] = np.tanh((r - d) / 3.0) + rng.randn(H, H) * 0.1
            img[i] = (img[i] - img[i].mean()) / (img[i].std() + 1e-8)
        scb = np.full((N, H, H), IGN, np.int64)
        mask = rng.rand(N, H, H) < 0.07
        scb[mask] = lab[mask]
        strong = img + rng.randn(N, H, H).astype(np.float32) * 0.15
        vm = np.ones((N, H, H), np.float32)
        vm[:, : rng.randint(0, 4), :] = 0.0
        batches.append({"image": img, "image_strong": strong,
                        "label": lab, "scribble": scb, "valid_mask": vm})
    return batches


def _torch_batch(b):
    return {
        "image": torch.from_numpy(b["image"][:, None]),
        "image_strong": torch.from_numpy(b["image_strong"][:, None]),
        "scribble": torch.from_numpy(
            np.moveaxis(_one_hot(b["scribble"], C + 1), -1, 1).copy()),
        "valid_mask": torch.from_numpy(b["valid_mask"][:, None]),
    }


def _jax_batch(b):
    return {
        "image": jnp.asarray(b["image"][..., None]),
        "image_strong": jnp.asarray(b["image_strong"][..., None]),
        "scribble": jnp.asarray(_one_hot(b["scribble"], C + 1)),
        "valid_mask": jnp.asarray(b["valid_mask"][..., None]),
    }


def _reference_run(tm, batches, val_batches):
    """The reference training loop, transplanted from train_chaos.py:242-391
    minus I/O: per-epoch poly LR, driver-side loss assembly with gaussian
    ramps, model.eval() at validation and NEVER back (the BN quirk)."""
    from utils.utils import gaussian_ramp_up, poly_lr_decay
    from utils.metrics import compute_dice

    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
    hist = {k: [] for k in ("loss_pce", "loss_ent", "loss_cr",
                            "loss_aux_cls", "loss_memory", "loss_total")}
    for epoch in range(EPOCHS):
        opt, _ = poly_lr_decay(opt, epoch, EPOCHS, LR)
        sums = {k: 0.0 for k in hist}
        for s in range(STEPS):
            batch = _torch_batch(batches[epoch * STEPS + s])
            out = tm(batch, mode="train", step=epoch)
            loss = out["loss_pce"]
            sums["loss_pce"] += out["loss_pce"].item()
            w = gaussian_ramp_up(t=epoch, base_value=1.0, scale=8.0)
            loss_ent = out["loss_ent"] * w
            loss = loss + loss_ent
            sums["loss_ent"] += loss_ent.item()
            loss_cr = out["loss_cr"] * w
            loss = loss + loss_cr
            sums["loss_cr"] += loss_cr.item()
            loss_aux = out["loss_aux_cls"] * 0.01
            loss = loss + loss_aux
            sums["loss_aux_cls"] += loss_aux.item()
            loss_mem = out["loss_memory"] * 1.0
            loss = loss + loss_mem
            sums["loss_memory"] += loss_mem.item()
            sums["loss_total"] += loss.item()
            opt.zero_grad()
            loss.backward()
            opt.step()
        for k in hist:
            hist[k].append(sums[k] / STEPS)
        tm.eval()  # train_chaos.py:370 — and never .train() again

    dices = []
    with torch.no_grad():
        for b in val_batches:
            out = tm({"image": torch.from_numpy(b["image"][:, None]),
                      "scribble": torch.from_numpy(np.moveaxis(
                          _one_hot(b["scribble"], C + 1), -1, 1).copy())},
                     mode="val")
            prob = torch.softmax(out["segmentation/logits"], 1).numpy()
            for n in range(b["image"].shape[0]):
                dices.append(compute_dice(
                    prob[n], np.moveaxis(_one_hot(b["label"][n], C), -1, 0)))
    return hist, np.asarray(dices, np.float64)


def _framework_run(config, params, stats, bank, batches, val_batches):
    model = _build_model(config, siamese=True)
    tx = make_optimizer(config, steps_per_epoch=STEPS)
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=opt_state,
                       memory_bank=jnp.asarray(bank))
    step_train = make_pacing_train_step(config, model, tx, STEPS,
                                        module_train=True, donate=False)
    step_frozen = make_pacing_train_step(config, model, tx, STEPS,
                                         module_train=False, donate=False)
    key = jax.random.PRNGKey(0)
    hist = {k: [] for k in ("loss_pce", "loss_ent", "loss_cr",
                            "loss_aux_cls", "loss_memory", "loss_total")}
    for epoch in range(EPOCHS):
        fn = step_train if epoch == 0 else step_frozen
        sums = {k: 0.0 for k in hist}
        for s in range(STEPS):
            state, m = fn(state, _jax_batch(batches[epoch * STEPS + s]), key)
            for k in hist:
                sums[k] += float(m[k])
        for k in hist:
            hist[k].append(sums[k] / STEPS)

    eval_step = make_pacing_eval_step(config, model)
    from pacingpseudo_tpu.evals.dice import dice_per_class_jax
    dices = []
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for b in val_batches:
        out = model.apply(variables, jnp.asarray(b["image"][..., None]),
                          None, train=False)
        probs = jax.nn.softmax(out["segmentation/logits"], axis=-1)
        d = dice_per_class_jax(probs, jnp.asarray(_one_hot(b["label"], C)))
        dices.append(np.asarray(d, np.float64))
    return hist, np.concatenate(dices, axis=0)


def test_training_dynamics_parity(rng):
    from models.consistency_reglur_memory import ConsistencyRegulr

    import argparse
    args = argparse.Namespace(
        ignored_index=IGN, do_loss_ent=True, do_decoder_consistency=True,
        do_aux_path=True, do_memory=True, detach_weak_cr=False,
        loss_cr_variants="ce_loss")
    torch.manual_seed(0)
    tm = ConsistencyRegulr(
        kwargs_unet=dict(input_ch=1, init_ch=INIT_CH, max_ch=MAX_CH,
                         num_classes=C, output_stride=8,
                         is_stride_conv=False, is_trans_conv=False,
                         elab_end_points=True),
        kwargs_aux_path=dict(num_classes=C,
                             feat_stage=["encoder/stage6", "encoder/stage5"],
                             feat_ch=[MAX_CH, MAX_CH], hid_ch=HID,
                             aux_drop_prob=0.0, do_memory=True,
                             max_step=EPOCHS, update_momentum=0.9,
                             ensemble_mode="cosine_similarity"),
        args_parser=args)
    params, stats, bank = convert_state_dict(
        copy.deepcopy(tm.state_dict()))

    batches = _make_stream(7)
    val_batches = [
        {k: v[:2] for k, v in b.items()} for b in _make_stream(11)[:VAL_N]]

    t_hist, t_dice = _reference_run(tm, batches, val_batches)

    config = ExperimentConfig(
        num_classes=C, ignored_index=IGN, session="Experiment",
        do_loss_ent=True, do_decoder_consistency=True, do_aux_path=True,
        do_memory=True, batch_size=N, epoch=EPOCHS,
        init_ch=INIT_CH, max_ch=MAX_CH, hid_ch=HID,
        feat_stage=("encoder/stage6", "encoder/stage5"),
        lr=LR, wd=WD, optimizer="adam", lr_decay="poly",
        loss_aux_weight=0.01, loss_memory_weight=1.0,
        loss_ent_weight=1.0, loss_cr_weight=1.0, ramp_up_scale=8.0,
        compute_dtype="float32", fuse_streams=False,
        memory_update_mode="first",
        ref_quirk_bn_eval_after_first_epoch=True,
        use_pallas_loss="off",
    ).validate()
    j_hist, j_dice = _framework_run(config, params, stats, bank,
                                    batches, val_batches)

    # Per-loss trajectories.  Both sides are float32 on identical batches
    # from identical weights; drift comes only from conv-reduction order →
    # Adam's sign-like amplification.  Empirically the curves track to
    # <1e-2 relative over 5 epochs; assert a 2e-2 envelope per loss per
    # epoch plus a tight first-epoch check (pre-divergence).
    for k in t_hist:
        t = np.asarray(t_hist[k])
        j = np.asarray(j_hist[k])
        assert np.allclose(j[0], t[0], rtol=2e-3, atol=2e-4), (
            k, t[0], j[0])
        assert np.allclose(j, t, rtol=2e-2, atol=2e-3), (k, t, j)

    # Validation Dice: identical NaN pattern, values within 1e-2.
    assert t_dice.shape == j_dice.shape
    t_nan, j_nan = np.isnan(t_dice), np.isnan(j_dice)
    assert np.array_equal(t_nan, j_nan)
    assert np.allclose(t_dice[~t_nan], j_dice[~j_nan], atol=1e-2), (
        float(np.nanmax(np.abs(t_dice - j_dice))))
