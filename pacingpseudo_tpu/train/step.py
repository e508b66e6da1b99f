"""Jitted train / eval steps.

One XLA program per step fuses: (optional on-device augmentation —
see train/loop.py), the siamese forward, every enabled loss, the backward
pass, the optimizer update and the memory-bank EMA.  This replaces the
reference's driver-side loss assembly + ``backward()`` + ``step()``
(reference: train_chaos.py:263-315, consistency_reglur_memory.py:24-102,
upper_bound_chaos.py:152-171).

Static configuration (which losses are on, loss variants, fused streams,
BN quirk mode) is baked into the jitted function; traced inputs are the
state, the batch and the PRNG key.  Loss weights that ramp with the epoch
are computed inside the step from ``state.step`` so no retrace happens per
epoch.

Metric values logged are the **weighted** per-loss values, matching what
the reference meters record (train_chaos.py:274-310 updates the meters
after multiplying the ramp weight).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from pacingpseudo_tpu.losses import (
    cross_entropy_loss,
    dice_loss_fn,
    entropy_minimization_loss,
    kl_loss,
    l1_loss,
    l2_loss,
    partial_cross_entropy_loss,
    soft_label_cross_entropy_loss,
)
from pacingpseudo_tpu.evals.dice import dice_per_class_jax
from pacingpseudo_tpu.ops.pallas.fused_loss import fused_pacing_losses
from pacingpseudo_tpu.models.aux_path import memory_update
from pacingpseudo_tpu.models.pacing import PacingPseudoModel
from pacingpseudo_tpu.train.schedules import gaussian_ramp_up, make_lr_schedule
from pacingpseudo_tpu.train.state import TrainState


def _use_fused_loss_kernel(config, valid_mask) -> bool:
    """Decide whether the Pallas fused-loss path applies to this config."""
    if config.use_pallas_loss == "off":
        return False
    if config.use_pallas_loss == "auto" and jax.default_backend() not in (
            "tpu", "axon"):
        return False
    # The kernel covers: pce + masked ent + non-detached soft-CE consistency.
    return (valid_mask is not None
            and config.do_decoder_consistency
            and config.loss_cr_variants == "ce_loss"
            and not config.detach_weak_cr)


def _pacing_losses(config, model, params, batch_stats, bank, batch, epoch,
                   dropout_rng, module_train: bool):
    """Forward + loss assembly for one pacing step.  Pure."""
    image = batch["image"]
    scribble = batch["scribble"]                       # (N, H, W, C+1) one-hot
    valid_mask = batch.get("valid_mask")               # (N, H, W, 1) or None
    image_strong = batch.get("image_strong") if config.do_decoder_consistency else None

    variables = {"params": params, "batch_stats": batch_stats}
    outputs, mutated = model.apply(
        variables, image, image_strong, train=True, module_train=module_train,
        mutable=["batch_stats"], rngs={"dropout": dropout_rng})
    new_batch_stats = mutated.get("batch_stats", batch_stats) if module_train else batch_stats

    logits_weak = outputs["segmentation/logits"]
    scb_target = jnp.argmax(scribble, axis=-1)

    if _use_fused_loss_kernel(config, valid_mask):
        # One Pallas pass over both logit fields (ops/pallas/fused_loss.py).
        loss_pce, ent_raw, sce_raw = fused_pacing_losses(
            logits_weak, outputs["segmentation/logits_strong"],
            scb_target, valid_mask[..., 0], config.ignored_index, False)
        total = loss_pce
        metrics = {"loss_pce": loss_pce}
        if config.do_loss_ent:
            w = (gaussian_ramp_up(epoch, config.loss_ent_weight,
                                  scale=config.ramp_up_scale)
                 if config.ramp_up_loss_ent else config.loss_ent_weight)
            loss_ent = ent_raw * w
            total = total + loss_ent
            metrics["loss_ent"] = loss_ent
        w = (gaussian_ramp_up(epoch, config.loss_cr_weight,
                              scale=config.ramp_up_scale)
             if config.ramp_up_loss_cr else config.loss_cr_weight)
        loss_cr = sce_raw * w
        total = total + loss_cr
        metrics["loss_cr"] = loss_cr
        return _pacing_aux_losses(config, model, params, outputs, scribble,
                                  scb_target, bank, epoch, total, metrics,
                                  new_batch_stats)

    # Reference: consistency_reglur_memory.py:29-36
    loss_pce = partial_cross_entropy_loss(logits_weak, scb_target,
                                          config.ignored_index)
    total = loss_pce
    metrics = {"loss_pce": loss_pce}

    if config.do_loss_ent:
        # Reference: consistency_reglur_memory.py:39-44 + train_chaos.py:277-283
        loss_ent = entropy_minimization_loss(logits_weak, valid_mask)
        w = (gaussian_ramp_up(epoch, config.loss_ent_weight, scale=config.ramp_up_scale)
             if config.ramp_up_loss_ent else config.loss_ent_weight)
        loss_ent = loss_ent * w
        total = total + loss_ent
        metrics["loss_ent"] = loss_ent

    if config.do_decoder_consistency:
        # Reference: consistency_reglur_memory.py:47-70 + train_chaos.py:285-291
        logits_strong = outputs["segmentation/logits_strong"]
        prob_weak = jax.nn.softmax(logits_weak, axis=-1)
        if config.detach_weak_cr:
            prob_weak = jax.lax.stop_gradient(prob_weak)
        if config.loss_cr_variants == "ce_loss":
            loss_cr = soft_label_cross_entropy_loss(logits_strong, prob_weak, valid_mask)
        elif config.loss_cr_variants == "l1_loss":
            prob_strong = jax.nn.softmax(logits_strong, axis=-1)
            loss_cr = l1_loss(prob_strong, prob_weak, valid_mask)
        elif config.loss_cr_variants == "l2_loss":
            prob_strong = jax.nn.softmax(logits_strong, axis=-1)
            loss_cr = l2_loss(prob_strong, prob_weak, valid_mask)
        elif config.loss_cr_variants == "kl_loss":
            # Note: the reference feeds raw weak logits here — detach_weak_cr
            # does NOT apply to the kl variant (consistency_reglur_memory.py:63).
            loss_cr = kl_loss(logits_strong, logits_weak, valid_mask)
        else:
            raise ValueError("The loss is not implemented.")
        w = (gaussian_ramp_up(epoch, config.loss_cr_weight, scale=config.ramp_up_scale)
             if config.ramp_up_loss_cr else config.loss_cr_weight)
        loss_cr = loss_cr * w
        total = total + loss_cr
        metrics["loss_cr"] = loss_cr

    return _pacing_aux_losses(config, model, params, outputs, scribble,
                              scb_target, bank, epoch, total, metrics,
                              new_batch_stats)


def _pacing_aux_losses(config, model, params, outputs, scribble, scb_target,
                       bank, epoch, total, metrics, new_batch_stats):
    """Aux-path + memory-bank tail shared by the XLA and Pallas loss paths."""
    new_bank = bank
    if config.do_aux_path:
        # Reference: consistency_reglur_memory.py:73-90 + train_chaos.py:294-301
        loss_aux = partial_cross_entropy_loss(
            outputs["aux/logits"], scb_target, config.ignored_index)
        loss_aux = loss_aux * config.loss_aux_weight
        total = total + loss_aux
        metrics["loss_aux_cls"] = loss_aux

        if config.do_memory:
            # Reference: aux_path_memory.py:59-65 — the bank is updated
            # first, then the shared classifier scores the fresh prototypes.
            new_bank = memory_update(
                bank, outputs["aux/features"], scribble,
                step=epoch, max_step=config.epoch,
                momentum=config.update_momentum,
                ensemble_mode=config.ensemble_mode,
                update_mode=config.memory_update_mode)
            logits_memory = model.apply(
                {"params": params}, new_bank,
                method=PacingPseudoModel.classify_bank)
            loss_memory = cross_entropy_loss(
                logits_memory, jnp.arange(config.num_classes))
            loss_memory = loss_memory * config.loss_memory_weight
            total = total + loss_memory
            metrics["loss_memory"] = loss_memory

    metrics["loss_total"] = total
    return total, (metrics, new_batch_stats, new_bank)


def make_pacing_train_step(config, model, tx, steps_per_epoch: int,
                           module_train: bool = True,
                           augment_fn: Callable | None = None,
                           donate: bool = True,
                           jit: bool = True,
                           spatial_constraint: Callable | None = None):
    """Build the jitted pacing train step.

    Args:
      module_train: False compiles the frozen-BN variant used by
        ``ref_quirk_bn_eval_after_first_epoch`` for epochs >= 1.
      augment_fn: optional on-device augmentation ``(batch, rng) -> batch``
        fused into the same XLA program (see aug/).
      jit: False returns the raw step body (for scanning into a chunked
        multi-step program, see :func:`make_chunked_train_step`).
      spatial_constraint: optional post-augmentation resharding hook
        (parallel/spatial.py make_spatial_constraint) pinning activations
        to a ('data', 'space') mesh — GSPMD partitions the model fwd+bwd
        along H with automatic conv halo exchanges.
    """
    lr_by_epoch = make_lr_schedule(config.lr_decay, config.epoch, config.lr)

    def train_step(state: TrainState, batch: Dict[str, Any], rng):
        epoch = (state.step // steps_per_epoch).astype(jnp.float32)
        aug_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        if augment_fn is not None:
            batch = augment_fn(batch, aug_rng)
        if spatial_constraint is not None:
            batch = spatial_constraint(batch)

        grad_fn = jax.value_and_grad(
            lambda p: _pacing_losses(config, model, p, state.batch_stats,
                                     state.memory_bank, batch, epoch,
                                     dropout_rng, module_train),
            has_aux=True)
        (_, (metrics, new_batch_stats, new_bank)), grads = grad_fn(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        metrics["lr"] = lr_by_epoch(epoch)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            memory_bank=new_bank,
        )
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_chunked_train_step(step_body: Callable, chunk: int):
    """Scan ``chunk`` train steps into ONE jitted dispatch.

    Motivation: in this deployment the host reaches the TPU through a relay
    whose per-dispatch overhead is tens of milliseconds — comparable to a
    whole train step.  Scanning K steps over a stacked raw-batch chunk
    ``(K, N, S, S)`` amortises that overhead K-fold (and lets XLA overlap
    the chunk's host transfer with compute).

    Args:
      step_body: an UNJITTED step from ``make_*_train_step(..., jit=False)``.
      chunk: static number of steps per dispatch.

    Returns:
      jitted ``(state, raw_stack, key) -> (state, metrics)`` where
      ``raw_stack`` is the pytree of stacked raw batches with a leading
      chunk axis and ``metrics`` are summed over the chunk.
    """

    def chunked(state, raw_stack, key):
        def body(st, xs):
            raw, i = xs
            st, metrics = step_body(st, raw, jax.random.fold_in(key, i))
            return st, metrics

        state, ms = jax.lax.scan(
            body, state, (raw_stack, jnp.arange(chunk)))
        return state, jax.tree.map(lambda x: jnp.sum(x, axis=0), ms)

    return jax.jit(chunked, donate_argnums=(0,))


def make_resident_chunked_train_step(step_body, chunk: int, mesh=None):
    """Chunked multi-step over a DEVICE-RESIDENT data pool.

    For datasets that fit in HBM (CHAOS/ACDC ~1 GB, LVSC ~4.4 GB as
    f16/u8 canvases) the whole training set is uploaded once and each
    dispatch receives only a (chunk, batch) int32 index block: per-step raw
    batches are gathered from the pool ON DEVICE, eliminating the per-step
    host->device canvas transfer (the ~24%% system overhead measured on the
    relay link).

    Args:
      step_body: unjitted step from ``make_*_train_step(..., jit=False)``.
      chunk: static steps per dispatch.

    Returns:
      jitted ``(state, pool, idx_block, key) -> (state, summed_metrics)``
      where ``pool`` is the dict of stacked slice canvases (+ ``size``) and
      ``idx_block`` is (chunk, batch) int32.

    At ``mesh`` size > 1 the pool is sharded on the slice axis
    (parallel.stage_resident_pool) and batches are fetched with the
    sharded-table gather (parallel.make_resident_gather) — indices stay
    GLOBAL, so the multi-chip run consumes the identical batch stream.
    """
    from pacingpseudo_tpu.parallel import make_resident_gather
    gather = make_resident_gather(mesh)

    def chunked(state, pool, idx_block, key):
        def body(st, xs):
            idx, i = xs
            raw = gather(pool, idx)
            st, metrics = step_body(st, raw, jax.random.fold_in(key, i))
            return st, metrics

        state, ms = jax.lax.scan(
            body, state, (idx_block, jnp.arange(chunk)))
        return state, jax.tree.map(lambda x: jnp.sum(x, axis=0), ms)

    return jax.jit(chunked, donate_argnums=(0,))


def make_pacing_eval_step(config, model, spatial_constraint: Callable | None = None):
    """Validation step: weak forward (running BN stats), PCE + per-class Dice.

    Mirrors the reference validation loop (train_chaos.py:369-391): loss_pce
    on scribbles, Dice against **full** labels; Dice stays on device.
    Returns ``(loss_pce, dice (N, C) with NaNs)``.

    When the batch carries ``sample_valid`` (N,) — the streaming loop pads
    partial batches by repeating the last sample — the padded samples'
    targets are forced to ``ignored_index`` so they contribute zero pixels
    to the loss (exactly equivalent to evaluating the unpadded batch).
    """

    def eval_step(state: TrainState, batch: Dict[str, Any]):
        if spatial_constraint is not None:
            batch = spatial_constraint(batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = model.apply(variables, batch["image"], None, train=False)
        logits = outputs["segmentation/logits"]
        scb_target = jnp.argmax(batch["scribble"], axis=-1)
        sample_valid = batch.get("sample_valid")
        if sample_valid is not None:
            scb_target = jnp.where(sample_valid[:, None, None], scb_target,
                                   config.ignored_index)
        loss_pce = partial_cross_entropy_loss(logits, scb_target, config.ignored_index)
        probs = jax.nn.softmax(logits, axis=-1)
        dice = dice_per_class_jax(probs, batch["label"],
                                  region_mask=batch.get("region_mask"))
        return loss_pce, dice, logits

    return jax.jit(eval_step)


def make_resident_eval_fn(config, model, upper_bound: bool, mesh=None):
    """Whole-validation-set evaluation in ONE jitted dispatch.

    Gathers batches from a device-resident val pool by index blocks, runs
    the eval forward per block under ``lax.scan`` and accumulates the
    reference's metrics ON DEVICE: per-class Dice sums + non-NaN counts
    (AvgMeter-skipping-NaN semantics, train_chaos.py:388-391) and the
    sample-weighted validation loss.  The host receives five small arrays
    instead of per-batch tensors.

    Args:
      upper_bound: CE-on-labels variant (upper_bound_chaos.py:186-209)
        instead of PCE-on-scribbles.

    Returns:
      jitted ``(state, pool, idx_blocks, valid_blocks) -> dict`` with
      ``loss_sum, n_sum, dice_sum (C,), dice_cnt (C,)`` where
      ``idx_blocks`` is (B, N) int32 and ``valid_blocks`` (B, N) bool masks
      the padding of the last partial batch.
    """
    num_classes = config.num_classes
    from pacingpseudo_tpu.parallel import make_resident_gather
    gather = make_resident_gather(mesh)

    def eval_all(state, pool, idx_blocks, valid_blocks):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def body(carry, xs):
            idx, sample_valid = xs
            raw = gather(pool, idx)
            image = raw["image"].astype(jnp.float32)
            n, s_dim = image.shape[0], image.shape[1]
            row = jax.lax.broadcasted_iota(jnp.int32, (n, s_dim, s_dim), 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (n, s_dim, s_dim), 2)
            region = ((row < raw["size"][:, 0, None, None]) &
                      (col < raw["size"][:, 1, None, None])).astype(jnp.float32)
            cnt = jnp.maximum(region.sum(axis=(1, 2), keepdims=True), 1.0)
            mean = (image * region).sum(axis=(1, 2), keepdims=True) / cnt
            var = (jnp.square(image - mean) * region
                   ).sum(axis=(1, 2), keepdims=True) / cnt
            img = ((image - mean) / (jnp.sqrt(var) + 1e-8) * region)[..., None]

            outputs = model.apply(variables, img, None, train=False)
            logits = outputs["segmentation/logits"]
            label = raw["label"].astype(jnp.int32)
            label_oh = jax.nn.one_hot(label, num_classes) * region[..., None]

            if upper_bound:
                # Match the reference/streaming convention: the val target is
                # argmax(one-hot(label)), so canvas padding (ignored rows →
                # all-zero one-hot) trains/evals as background
                # (upper_bound_chaos.py:197-198).  Padded DUPLICATE samples
                # (block padding) are excluded via ignored_index.
                target = jnp.where(label < num_classes, label, 0)
                target = jnp.where(sample_valid[:, None, None], target,
                                   config.ignored_index)
                loss = partial_cross_entropy_loss(
                    logits, target, config.ignored_index)
            else:
                scb = raw["scribble"].astype(jnp.int32)
                scb = jnp.where(sample_valid[:, None, None], scb,
                                config.ignored_index)
                loss = partial_cross_entropy_loss(
                    logits, scb, config.ignored_index)

            probs = jax.nn.softmax(logits, axis=-1)
            dice = dice_per_class_jax(probs, label_oh,
                                      region_mask=region[..., None])
            ok = (~jnp.isnan(dice)) & sample_valid[:, None]
            dice_sum = jnp.sum(jnp.where(ok, dice, 0.0), axis=0)
            dice_cnt = jnp.sum(ok.astype(jnp.float32), axis=0)
            n_real = jnp.sum(sample_valid.astype(jnp.float32))

            acc = carry
            acc = {
                "loss_sum": acc["loss_sum"] + loss * n_real,
                "n_sum": acc["n_sum"] + n_real,
                "dice_sum": acc["dice_sum"] + dice_sum,
                "dice_cnt": acc["dice_cnt"] + dice_cnt,
            }
            return acc, None

        init = {
            "loss_sum": jnp.zeros(()),
            "n_sum": jnp.zeros(()),
            "dice_sum": jnp.zeros((num_classes,)),
            "dice_cnt": jnp.zeros((num_classes,)),
        }
        acc, _ = jax.lax.scan(body, init, (idx_blocks, valid_blocks))
        return acc

    return jax.jit(eval_all)


# ---------------------------------------------------------------------------
# Upper-bound (fully-supervised) steps — reference: upper_bound_chaos.py
# ---------------------------------------------------------------------------

def _upper_bound_losses(config, model, params, batch_stats, batch,
                        dropout_rng, module_train: bool):
    variables = {"params": params, "batch_stats": batch_stats}
    outputs, mutated = model.apply(
        variables, batch["image"], None, train=True, module_train=module_train,
        mutable=["batch_stats"], rngs={"dropout": dropout_rng})
    new_batch_stats = mutated.get("batch_stats", batch_stats) if module_train else batch_stats
    logits = outputs["segmentation/logits"]

    # Reference: upper_bound_chaos.py:157-167.  ``label`` is one-hot over
    # num_classes; crop-padded pixels are all-zero rows whose argmax is 0,
    # so padding trains as background — preserved.
    target = jnp.argmax(batch["label"], axis=-1)
    loss_ce = partial_cross_entropy_loss(logits, target, config.ignored_index)
    total = loss_ce
    metrics = {"loss_ce": loss_ce}
    if config.loss_dice:
        loss_dice = dice_loss_fn(logits, batch["label"])
        total = total + loss_dice
        metrics["loss_dice"] = loss_dice
    metrics["loss_total"] = total
    return total, (metrics, new_batch_stats)


def make_upper_bound_train_step(config, model, tx, steps_per_epoch: int,
                                module_train: bool = True,
                                augment_fn: Callable | None = None,
                                donate: bool = True,
                                jit: bool = True,
                                spatial_constraint: Callable | None = None):
    lr_by_epoch = make_lr_schedule(config.lr_decay, config.epoch, config.lr)

    def train_step(state: TrainState, batch, rng):
        epoch = (state.step // steps_per_epoch).astype(jnp.float32)
        aug_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        if augment_fn is not None:
            batch = augment_fn(batch, aug_rng)
        if spatial_constraint is not None:
            batch = spatial_constraint(batch)

        grad_fn = jax.value_and_grad(
            lambda p: _upper_bound_losses(config, model, p, state.batch_stats,
                                          batch, dropout_rng, module_train),
            has_aux=True)
        (_, (metrics, new_batch_stats)), grads = grad_fn(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics["lr"] = lr_by_epoch(epoch)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_upper_bound_eval_step(config, model, spatial_constraint: Callable | None = None):
    """Validation: CE + Dice-loss + per-class Dice (upper_bound_chaos.py:186-209)."""

    def eval_step(state: TrainState, batch):
        if spatial_constraint is not None:
            batch = spatial_constraint(batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = model.apply(variables, batch["image"], None, train=False)
        logits = outputs["segmentation/logits"]
        target = jnp.argmax(batch["label"], axis=-1)
        sample_valid = batch.get("sample_valid")
        if sample_valid is not None:
            # exclude streaming-pad duplicate samples from the CE loss
            target = jnp.where(sample_valid[:, None, None], target,
                               config.ignored_index)
        loss_ce = partial_cross_entropy_loss(logits, target, config.ignored_index)
        loss_dice = dice_loss_fn(logits, batch["label"])
        probs = jax.nn.softmax(logits, axis=-1)
        dice = dice_per_class_jax(probs, batch["label"],
                                  region_mask=batch.get("region_mask"))
        return loss_ce, loss_dice, dice, logits

    return jax.jit(eval_step)
