"""Forward parity vs the PyTorch reference: same weights => same logits.

Instantiates the actual reference modules (read-only import from
/root/reference), converts their randomly-initialised state_dicts with
tools/torch_import.py, and compares forward outputs element-wise.  This
pins conv/BN/LeakyReLU semantics, padding/dilation, align-corners
upsampling, end-point naming and the checkpoint-import path in one shot.
"""
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from pacingpseudo_tpu.models import PacingPseudoModel, UNet
from pacingpseudo_tpu.tools.torch_import import convert_state_dict

# The reference AuxPath calls .cuda() at construction (aux_path_memory.py:44);
# neutralise it for CPU-only torch.
torch.Tensor.cuda = lambda self, *a, **k: self


def _torch_unet(os_, num_classes=4, elab=True):
    from models.unet import UNet as TorchUNet
    m = TorchUNet(input_ch=1, init_ch=32, max_ch=512, num_classes=num_classes,
                  output_stride=os_, elab_end_points=elab)
    m.eval()
    return m


@pytest.mark.parametrize("os_", [8, 32])
def test_unet_forward_parity(rng, os_):
    tm = _torch_unet(os_)
    x = rng.randn(2, 64, 64, 1).astype(np.float32)

    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))

    params, stats, _ = convert_state_dict(tm.state_dict())
    jm = UNet(num_classes=4, output_stride=os_, elab_end_points=True,
              dtype=jnp.float32)
    variables = {"params": params, "batch_stats": stats}
    j_out = jm.apply(variables, jnp.asarray(x), train=False)

    for name in ["encoder/stage1", "encoder/stage6", "decoder/stage1",
                 "segmentation/logits"]:
        t = np.moveaxis(t_out[name].numpy(), 1, -1)
        j = np.asarray(j_out[name])
        assert j.shape == t.shape, name
        assert np.allclose(j, t, atol=2e-4, rtol=1e-3), (
            name, float(np.abs(j - t).max()))


def test_unet_parity_after_bn_stats_shift(rng):
    """Parity must hold with non-trivial BN running stats, not just init."""
    tm = _torch_unet(8)
    # run a few training-mode forwards to move running stats
    tm.train()
    with torch.no_grad():
        for _ in range(3):
            tm(torch.randn(2, 1, 64, 64))
    tm.eval()

    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))[
            "segmentation/logits"]
    params, stats, _ = convert_state_dict(tm.state_dict())
    jm = UNet(num_classes=4, output_stride=8, elab_end_points=True,
              dtype=jnp.float32)
    j_logits = jm.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)["segmentation/logits"]
    t = np.moveaxis(t_logits.numpy(), 1, -1)
    assert np.allclose(np.asarray(j_logits), t, atol=2e-4, rtol=1e-3)


def test_siamese_checkpoint_conversion(rng):
    """ConsistencyRegulr state_dict (backbone.+aux_path.) converts and runs."""
    import argparse

    from models.consistency_reglur_memory import ConsistencyRegulr

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
    tm.eval()

    params, stats, bank = convert_state_dict(tm.state_dict())
    assert "backbone" in params and "aux_path" in params
    assert bank is not None and bank.shape == (4, 64)

    # the converted backbone drives our siamese model
    jm = PacingPseudoModel(num_classes=4, output_stride=8, do_aux_path=True,
                           hid_ch=64, dtype=jnp.float32)
    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        t_out = tm({"image": torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
                    "scribble": torch.zeros(1, 5, 64, 64)}, mode="val")
    j_out = jm.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), None, train=False)
    t = np.moveaxis(t_out["segmentation/logits"].numpy(), 1, -1)
    assert np.allclose(np.asarray(j_out["segmentation/logits"]), t,
                       atol=2e-4, rtol=1e-3)


def test_trans_conv_variant_parity(rng):
    """Stride-conv + transposed-conv decoder variant converts too."""
    from models.unet import UNet as TorchUNet
    tm = TorchUNet(input_ch=1, init_ch=32, max_ch=512, num_classes=3,
                   output_stride=32, is_stride_conv=True, is_trans_conv=True,
                   elab_end_points=False)
    tm.eval()
    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))[
            "segmentation/logits"]
    params, stats, _ = convert_state_dict(tm.state_dict())
    jm = UNet(num_classes=3, output_stride=32, is_stride_conv=True,
              is_trans_conv=True, elab_end_points=False, dtype=jnp.float32)
    j_logits = jm.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)["segmentation/logits"]
    t = np.moveaxis(t_logits.numpy(), 1, -1)
    assert np.allclose(np.asarray(j_logits), t, atol=2e-4, rtol=1e-3), (
        float(np.abs(np.asarray(j_logits) - t).max()))


def test_import_cli_roundtrip(rng, tmp_path):
    """.pth -> orbax import -> inference-style restore gives same logits."""
    tm = _torch_unet(8, num_classes=5, elab=False)
    pth = str(tmp_path / "best_ckp.pth")
    torch.save(tm.state_dict(), pth)

    out = str(tmp_path / "imported" / "best_ckp")
    from pacingpseudo_tpu.cli.import_torch import main as import_main
    import_main(["--pth", pth, "--out", out])

    from pacingpseudo_tpu.train.checkpoint import (restore_batch_stats,
                                                   restore_params,
                                                   saved_is_siamese)
    jm = UNet(num_classes=5, output_stride=8, elab_end_points=False,
              dtype=jnp.float32)
    tmpl = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
    assert not saved_is_siamese(out)
    params = restore_params(out, tmpl["params"])
    stats = restore_batch_stats(out, tmpl["batch_stats"], backbone_only=False)

    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))[
            "segmentation/logits"]
    j_logits = jm.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)["segmentation/logits"]
    assert np.allclose(np.asarray(j_logits),
                       np.moveaxis(t_logits.numpy(), 1, -1),
                       atol=2e-4, rtol=1e-3)
