"""Checkpoint EXPORT to the reference's .pth format (tools/torch_import.py
export_state_dict — the inverse of the round-1 importer).

Proofs: (1) export -> import round-trips bit-exactly; (2) the exported
state_dict loads into the actual reference modules with ``strict=True``
and produces the SAME logits as our model — full both-ways interop
(reference inference.py:138-146 consumes these files).
"""
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

# the reference AuxPath calls .cuda() at construction (aux_path_memory.py:44)
torch.Tensor.cuda = lambda self, *a, **k: self

import jax
import jax.numpy as jnp

from pacingpseudo_tpu.models import PacingPseudoModel, UNet
from pacingpseudo_tpu.tools.torch_import import (
    convert_state_dict,
    export_state_dict,
)


def _init_siamese(rng, num_classes=4, hid_ch=64):
    jm = PacingPseudoModel(num_classes=num_classes, output_stride=8,
                           do_aux_path=True, hid_ch=hid_ch, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 64, 64, 1), jnp.float32)
    variables = jm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, x, train=True)
    return jm, variables, x


def test_export_import_roundtrip(rng):
    _, variables, _ = _init_siamese(rng)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    bank = rng.randn(4, 64).astype(np.float32)

    sd = export_state_dict(params, stats, bank)
    p2, s2, b2 = convert_state_dict(sd)

    assert jax.tree.structure(params) == jax.tree.structure(p2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        assert np.array_equal(np.asarray(a), b)
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
        assert np.array_equal(np.asarray(a), b)
    assert np.array_equal(bank, b2)


def test_export_strict_loads_into_reference_and_matches_logits(rng):
    import argparse

    from models.consistency_reglur_memory import ConsistencyRegulr

    jm, variables, x = _init_siamese(rng)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    bank = rng.randn(4, 64).astype(np.float32)

    sd = export_state_dict(params, stats, bank)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}

    args = argparse.Namespace(
        ignored_index=4, do_loss_ent=False, do_decoder_consistency=False,
        do_aux_path=False, do_memory=False, detach_weak_cr=False,
        loss_cr_variants="ce_loss")
    tm = ConsistencyRegulr(
        kwargs_unet=dict(input_ch=1, init_ch=32, max_ch=512, num_classes=4,
                         output_stride=8, is_stride_conv=False,
                         is_trans_conv=False, elab_end_points=True),
        kwargs_aux_path=dict(num_classes=4,
                             feat_stage=["encoder/stage6", "encoder/stage5"],
                             feat_ch=[512, 512], hid_ch=64, aux_drop_prob=0.0,
                             do_memory=True, max_step=400,
                             update_momentum=0.9,
                             ensemble_mode="cosine_similarity"),
        args_parser=args)
    tm.load_state_dict(tensors, strict=True)
    tm.eval()

    xn = np.asarray(x)
    with torch.no_grad():
        t_out = tm({"image": torch.from_numpy(np.moveaxis(xn, -1, 1).copy()),
                    "scribble": torch.zeros(1, 5, 64, 64)}, mode="val")
    j_out = jm.apply({"params": variables["params"],
                      "batch_stats": variables["batch_stats"]},
                     x, None, train=False)
    t = np.moveaxis(t_out["segmentation/logits"].numpy(), 1, -1)
    assert np.allclose(np.asarray(j_out["segmentation/logits"]), t,
                       atol=2e-4, rtol=1e-3)


def test_export_bare_unet_strict_load(rng):
    from models.unet import UNet as TorchUNet

    jm = UNet(num_classes=4, output_stride=8, elab_end_points=True,
              dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 64, 64, 1), jnp.float32)
    variables = jm.init(jax.random.PRNGKey(0), x, train=False)

    sd = export_state_dict(jax.tree.map(np.asarray, variables["params"]),
                           jax.tree.map(np.asarray, variables["batch_stats"]))
    tm = TorchUNet(input_ch=1, init_ch=32, max_ch=512, num_classes=4,
                   output_stride=8, is_stride_conv=False, is_trans_conv=False,
                   elab_end_points=True)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
