"""Orbax checkpointing with the reference's on-disk layout + resume.

Layout parity (reference: train_chaos.py:405-413, inference.py:279-288):

* interval/final checkpoints:  ``<run_dir>/ckps/ckp_<epoch>``
* best checkpoint:             ``<run_dir>/best_ckp``
* inference resolution order for ``--best_ckp``: ``ckps/best_ckp`` then
  ``best_ckp``; otherwise the final epoch (``ckp_399`` for 400-epoch runs,
  ``ckp_39`` for LVSC).

Improvements over the reference (SURVEY.md §5): full state is saved —
params, BN statistics, optimizer state, memory bank and step — so training
**resumes** exactly; the reference saved ``model.state_dict()`` only and had
no resume path.  The reference's checkpoint-interval precedence bug
(``curr_epoch+1 % interval`` parsing as ``curr_epoch + (1 % interval)``,
train_chaos.py:405) is fixed here: interval saves actually fire.

A pacing checkpoint can be opened by the bare-UNet inference driver: the
backbone subtree is extracted from the siamese state, mirroring the
reference's ``backbone.``-prefix stripping fallback (inference.py:138-146).
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from pacingpseudo_tpu.train.state import TrainState


def _abstract(tree):
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, tree)


def save_checkpoint(path: str, state: TrainState):
    """Save the full train state at ``path`` (atomic, Orbax)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a full train state saved by :func:`save_checkpoint`."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), _abstract(template))


def restore_params(path: str, params_template: Any):
    """Restore only the ``params`` subtree of a saved state (inference).

    ``params_template`` may be either the full siamese param tree or a bare
    UNet tree; when the checkpoint holds a siamese model and the template is
    a bare backbone, the ``backbone`` subtree is extracted — the functional
    analogue of the reference's prefix-stripping load (inference.py:138-146).
    """
    ckptr = ocp.PyTreeCheckpointer()
    full = ckptr.restore(os.path.abspath(path))
    saved_params = full["params"]
    if _tree_matches(saved_params, params_template):
        restored = saved_params
    elif "backbone" in saved_params and _tree_matches(saved_params["backbone"],
                                                      params_template):
        restored = saved_params["backbone"]
    else:
        raise ValueError(
            f"Checkpoint at {path} does not match the requested model "
            "(neither full tree nor its 'backbone' subtree).")
    return jax.tree.map(
        lambda t, x: jax.numpy.asarray(x, t.dtype if hasattr(t, "dtype") else None),
        params_template, restored)


def restore_batch_stats(path: str, template: Any, backbone_only: bool):
    """Restore BN running statistics (with optional backbone extraction)."""
    ckptr = ocp.PyTreeCheckpointer()
    full = ckptr.restore(os.path.abspath(path))
    stats = full.get("batch_stats", {})
    if backbone_only and "backbone" in stats:
        stats = stats["backbone"]
    return jax.tree.map(
        lambda t, x: jax.numpy.asarray(x, t.dtype if hasattr(t, "dtype") else None),
        template, stats)


def _tree_matches(a, b) -> bool:
    try:
        return (jax.tree.structure(a) == jax.tree.structure(b))
    except Exception:
        return False


def saved_is_siamese(path: str) -> bool:
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.restore(os.path.abspath(path))
    return "backbone" in meta.get("params", {})


def resolve_checkpoint_path(checkpoint_dir: str, dataset: str,
                            best: bool) -> str:
    """Reference checkpoint-path resolution (inference.py:279-288)."""
    if best:
        cand = os.path.join(checkpoint_dir, "ckps", "best_ckp")
        if not os.path.isdir(cand):
            cand = os.path.join(checkpoint_dir, "best_ckp")
        return cand
    final_epoch = 39 if dataset == "lvsc" else 399
    return os.path.join(checkpoint_dir, "ckps", f"ckp_{final_epoch}")


def latest_checkpoint(run_dir: str) -> Optional[str]:
    """Find the newest ``ckps/ckp_<epoch>`` for resume (no reference analogue)."""
    ckps = os.path.join(run_dir, "ckps")
    if not os.path.isdir(ckps):
        return None
    best_epoch, best_path = -1, None
    for name in os.listdir(ckps):
        m = re.fullmatch(r"ckp_(\d+)", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best_path = os.path.join(ckps, name)
    return best_path
