"""Control-vs-Experiment study run on the ACTUAL PyTorch reference code.

Purpose (VERDICT r2 item 1 debugging): the synthetic-fold chip study finds
Experiment (full pacing) ~ Control (pCE only) at best-val.  Is that an
implementation defect or a property of the method on this task family?
This tool answers it with the reference's own code as the oracle: it
trains the real ``ConsistencyRegulr`` forward + the real driver loss
assembly (/root/reference/train_chaos.py:242-315, gaussian ramps, poly
LR, the eval()-forever BN regime at :370) on the same hard-difficulty
phantom generator the chip study uses (data/synthetic.py make_phantom,
scribbles via tools/scribbles.generate_scribble), and — on the identical
batch stream, from identical initial weights — this framework's jitted
step, for both arms.

If torch-Experiment ~ torch-Control too, the chip-study result reflects
the method/task regime, not this rebuild.  The jax-vs-torch columns keep
the per-arm trajectories honest at study length (the 5-epoch parity test
pins them tightly; here we compare best-val Dice at O(100) epochs).

Scale note: 64^2 phantoms, no geometric augmentation (the strong stream
is an intensity-jittered view — gamma/scale/shift/noise, the
TransformsColorJitter family augmentations.py:69-110 approximated in
numpy); small UNet (init_ch 16).  CPU-only, ~1 h total at defaults.

Usage:
    python -m pacingpseudo_tpu.tools.torch_reference_study \
        --epochs 100 --out /tmp/torch_ref_study.json
"""
from __future__ import annotations

import argparse
import copy
import json
import sys
import time

import numpy as np

HW = 64
C = 5
IGN = 5
INIT_CH, MAX_CH, HID = 16, 256, 32
LR, WD = 1e-4, 3e-4


def _shorten_scribbles(scb: np.ndarray, ratio: float) -> np.ndarray:
    from pacingpseudo_tpu.data.synthetic import shorten_scribbles
    return shorten_scribbles(scb, C, IGN, ratio)


def build_stream(n_train, n_val, batch, epochs, seed, difficulty="hard",
                 scribble_ratio=1.0, val_gamma=1.0):
    """Phantoms + scribbles + a per-step deterministic strong view.

    Returns (train_batches, val_set): train_batches is a list of
    epochs*steps dict batches (image, image_strong, scribble one-hot,
    valid_mask); every arm consumes the identical list.

    Regime knobs for the pacing-wins hunt (VERDICT r4 item 2):
      * ``difficulty`` — phantom family (data/synthetic.py make_phantom).
      * ``scribble_ratio`` < 1 — shorten every scribble stroke to that
        fraction of its length (sparser supervision).
      * ``val_gamma`` != 1 — gamma-shift the VAL images only (train/test
        intensity shift; consistency training should confer robustness).
    """
    from pacingpseudo_tpu.data.synthetic import make_phantom
    from pacingpseudo_tpu.tools.scribbles import generate_scribble

    rng = np.random.RandomState(seed)
    imgs, labs, scbs = [], [], []
    for _ in range(n_train + n_val):
        img, lab = make_phantom(rng, (HW, HW), C, difficulty)
        scb = generate_scribble(lab, C, IGN)
        if scribble_ratio < 1.0:
            scb = _shorten_scribbles(scb, scribble_ratio)
        imgs.append(img); labs.append(lab); scbs.append(scb)
    imgs = np.stack(imgs).astype(np.float32)
    labs = np.stack(labs).astype(np.int64)
    scbs = np.stack(scbs).astype(np.int64)
    tr = slice(0, n_train)
    va = slice(n_train, n_train + n_val)
    if val_gamma != 1.0:
        v = imgs[va]
        lo = v.min(axis=(1, 2), keepdims=True)
        hi = v.max(axis=(1, 2), keepdims=True)
        u = (v - lo) / (hi - lo + 1e-8)
        imgs[va] = (u ** val_gamma) * (hi - lo) + lo

    def strong_view(x, r):
        lo, hi = x.min(axis=(1, 2), keepdims=True), x.max(axis=(1, 2), keepdims=True)
        u = (x - lo) / (hi - lo + 1e-8)
        gamma = r.uniform(0.7, 1.5, (x.shape[0], 1, 1))
        u = u ** gamma
        y = u * (hi - lo) + lo
        y = y * r.uniform(0.9, 1.1, (x.shape[0], 1, 1)) \
            + r.uniform(-0.1, 0.1, (x.shape[0], 1, 1))
        return (y + r.randn(*x.shape) * 0.08).astype(np.float32)

    steps = n_train // batch
    batches = []
    for ep in range(epochs):
        order = np.random.RandomState(seed + 1000 + ep).permutation(n_train)
        for s in range(steps):
            idx = order[s * batch:(s + 1) * batch]
            img = imgs[tr][idx]
            batches.append({
                "image": img,
                "image_strong": strong_view(
                    img, np.random.RandomState(seed + 5000 + ep * steps + s)),
                "scribble": scbs[tr][idx],
                "label": labs[tr][idx],
                "valid_mask": np.ones_like(img, np.float32),
            })
    return batches, steps, {"image": imgs[va], "label": labs[va],
                            "scribble": scbs[va]}


def one_hot(x, n):
    return np.eye(n, dtype=np.float32)[x]


def val_dice(prob_nchw, labs):
    """Mean foreground Dice via the reference's own metric."""
    from utils.metrics import compute_dice
    per = []
    for n in range(prob_nchw.shape[0]):
        d = compute_dice(prob_nchw[n], np.moveaxis(one_hot(labs[n], C), -1, 0))
        per.append(d)
    per = np.asarray(per, np.float64)[:, 1:]       # drop background
    return float(np.nanmean(per))


def run_torch_arm(pacing, batches, steps, val, epochs, seed,
                  eval_quirk=True, wd=WD):
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self   # reference calls .cuda()
    sys.path.insert(0, "/root/reference")
    from models.consistency_reglur_memory import ConsistencyRegulr
    from utils.utils import gaussian_ramp_up, poly_lr_decay

    args = argparse.Namespace(
        ignored_index=IGN, do_loss_ent=pacing, do_decoder_consistency=pacing,
        do_aux_path=pacing, do_memory=pacing, detach_weak_cr=False,
        loss_cr_variants="ce_loss")
    torch.manual_seed(seed)
    tm = ConsistencyRegulr(
        kwargs_unet=dict(input_ch=1, init_ch=INIT_CH, max_ch=MAX_CH,
                         num_classes=C, output_stride=8,
                         is_stride_conv=False, is_trans_conv=False,
                         elab_end_points=True),
        kwargs_aux_path=dict(num_classes=C,
                             feat_stage=["encoder/stage6", "encoder/stage5"],
                             feat_ch=[MAX_CH, MAX_CH], hid_ch=HID,
                             aux_drop_prob=0.0, do_memory=True,
                             max_step=epochs, update_momentum=0.9,
                             ensemble_mode="cosine_similarity"),
        args_parser=args)
    init_sd = copy.deepcopy(tm.state_dict())

    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=wd)
    vimg = torch.from_numpy(val["image"][:, None])
    vscb = torch.from_numpy(
        np.moveaxis(one_hot(val["scribble"], C + 1), -1, 1).copy())
    curve = []
    for epoch in range(epochs):
        opt, _ = poly_lr_decay(opt, epoch, epochs, LR)
        for s in range(steps):
            b = batches[epoch * steps + s]
            batch = {
                "image": torch.from_numpy(b["image"][:, None]),
                "image_strong": torch.from_numpy(b["image_strong"][:, None]),
                "scribble": torch.from_numpy(
                    np.moveaxis(one_hot(b["scribble"], C + 1), -1, 1).copy()),
                "valid_mask": torch.from_numpy(b["valid_mask"][:, None]),
            }
            out = tm(batch, mode="train", step=epoch)
            loss = out["loss_pce"]
            if pacing:                     # train_chaos.py:242-315 assembly
                w = gaussian_ramp_up(t=epoch, base_value=1.0, scale=8.0)
                loss = loss + out["loss_ent"] * w
                loss = loss + out["loss_cr"] * w
                loss = loss + out["loss_aux_cls"] * 0.01
                loss = loss + out["loss_memory"] * 1.0
            opt.zero_grad(); loss.backward(); opt.step()
        # eval_quirk=True reproduces train_chaos.py:370 — tm.eval() after
        # the first epoch and never back to train.  eval_quirk=False is the
        # textbook regime (eval only for validation) for the Control-bias
        # ablation (VERDICT r4 weak item 2).
        tm.eval()
        with torch.no_grad():
            out = tm({"image": vimg, "scribble": vscb}, mode="val")
            prob = torch.softmax(out["segmentation/logits"], 1).numpy()
        curve.append(val_dice(prob, val["label"]))
        if not eval_quirk:
            tm.train()
    return init_sd, curve


def run_jax_arm(pacing, init_sd, batches, steps, val, epochs,
                eval_quirk=True, wd=WD):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pacingpseudo_tpu.config import ExperimentConfig
    from pacingpseudo_tpu.tools.torch_import import convert_state_dict
    from pacingpseudo_tpu.train.loop import _build_model
    from pacingpseudo_tpu.train.optim import make_optimizer
    from pacingpseudo_tpu.train.state import TrainState
    from pacingpseudo_tpu.train.step import make_pacing_train_step

    config = ExperimentConfig(
        num_classes=C, ignored_index=IGN,
        session="Experiment" if pacing else "Control",
        do_loss_ent=pacing, do_decoder_consistency=pacing,
        do_aux_path=pacing, do_memory=pacing,
        batch_size=batches[0]["image"].shape[0], epoch=epochs,
        init_ch=INIT_CH, max_ch=MAX_CH, hid_ch=HID,
        feat_stage=("encoder/stage6", "encoder/stage5"),
        lr=LR, wd=wd, optimizer="adam", lr_decay="poly",
        loss_aux_weight=0.01, loss_memory_weight=1.0,
        loss_ent_weight=1.0, loss_cr_weight=1.0, ramp_up_scale=8.0,
        compute_dtype="float32", fuse_streams=False,
        memory_update_mode="first",
        ref_quirk_bn_eval_after_first_epoch=eval_quirk,
        use_pallas_loss="off",
    ).validate()
    params, stats, bank = convert_state_dict(copy.deepcopy(init_sd))
    model = _build_model(config, siamese=True)
    tx = make_optimizer(config, steps_per_epoch=steps)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params),
                       memory_bank=jnp.asarray(bank) if pacing else None)
    step_train = make_pacing_train_step(config, model, tx, steps,
                                        module_train=True, donate=False)
    step_frozen = make_pacing_train_step(config, model, tx, steps,
                                         module_train=False, donate=False)
    key = jax.random.PRNGKey(0)
    curve = []
    vimg = jnp.asarray(val["image"][..., None])
    for epoch in range(epochs):
        fn = step_train if (epoch == 0 or not eval_quirk) else step_frozen
        for s in range(steps):
            b = batches[epoch * steps + s]
            jb = {"image": jnp.asarray(b["image"][..., None]),
                  "image_strong": jnp.asarray(b["image_strong"][..., None]),
                  "scribble": jnp.asarray(one_hot(b["scribble"], C + 1)),
                  "valid_mask": jnp.asarray(b["valid_mask"][..., None])}
            state, _ = fn(state, jb, key)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, vimg, None, train=False)
        prob = np.moveaxis(np.asarray(
            jax.nn.softmax(out["segmentation/logits"], axis=-1),
            np.float64), -1, 1)
        curve.append(val_dice(prob, val["label"]))
    return curve


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n_train", type=int, default=192)
    ap.add_argument("--n_val", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--difficulty", default="hard",
                    choices=["easy", "hard", "jagged"])
    ap.add_argument("--scribble_ratio", type=float, default=1.0)
    ap.add_argument("--val_gamma", type=float, default=1.0)
    ap.add_argument("--no_eval_quirk", action="store_true", default=False,
                    help="Control-bias ablation axis: textbook BN regime "
                         "(eval only for validation) instead of the "
                         "reference's eval()-forever quirk in BOTH stacks")
    ap.add_argument("--wd", type=float, default=WD,
                    help="Control-bias ablation axis: Adam weight decay "
                         "for both stacks (reference default 3e-4)")
    ap.add_argument("--arms", nargs="+",
                    default=["torch_control", "torch_pacing",
                             "jax_control", "jax_pacing"])
    ap.add_argument("--out", default="/tmp/torch_ref_study.json")
    args = ap.parse_args(argv)

    batches, steps, val = build_stream(
        args.n_train, args.n_val, args.batch, args.epochs, args.seed,
        difficulty=args.difficulty, scribble_ratio=args.scribble_ratio,
        val_gamma=args.val_gamma)
    print(f"stream: {steps} steps/epoch x {args.epochs} epochs, "
          f"val {args.n_val} slices", flush=True)

    results = {}
    init_sd = None
    for arm in args.arms:
        fw, kind = arm.split("_")
        pacing = kind == "pacing"
        t0 = time.time()
        eval_quirk = not args.no_eval_quirk
        if fw == "torch":
            sd, curve = run_torch_arm(pacing, batches, steps, val,
                                      args.epochs, args.seed,
                                      eval_quirk=eval_quirk, wd=args.wd)
            if init_sd is None:
                init_sd = sd
        else:
            if init_sd is None:          # torch arms skipped: still torch-init
                sd, _ = run_torch_arm(pacing, batches, steps, val, 0, args.seed)
                init_sd = sd
            curve = run_jax_arm(pacing, init_sd, batches, steps, val,
                                args.epochs, eval_quirk=eval_quirk,
                                wd=args.wd)
        curve = np.asarray(curve)
        results[arm] = {
            "best_val_dice": float(np.nanmax(curve)),
            "best_epoch": int(np.nanargmax(curve)),
            "final_val_dice": float(curve[-1]),
            "curve": [round(float(x), 4) for x in curve],
            "minutes": round((time.time() - t0) / 60, 1),
        }
        r = results[arm]
        print(f"{arm}: best {r['best_val_dice']:.4f} @ep{r['best_epoch']}, "
              f"final {r['final_val_dice']:.4f}  ({r['minutes']} min)",
              flush=True)

    results["_config"] = {
        "epochs": args.epochs, "n_train": args.n_train, "n_val": args.n_val,
        "batch": args.batch, "seed": args.seed,
        "difficulty": args.difficulty, "scribble_ratio": args.scribble_ratio,
        "val_gamma": args.val_gamma, "eval_quirk": not args.no_eval_quirk,
        "wd": args.wd}
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({a: {k: v for k, v in r.items() if k != "curve"}
                      for a, r in results.items()}, indent=1))


if __name__ == "__main__":
    main()
