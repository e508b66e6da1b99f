"""Loss-library parity tests against torch.nn.functional (CPU).

The reference loss semantics (losses/losses.py) are expressed in torch; we
verify our NHWC JAX implementations agree with the equivalent torch calls on
random data, including valid_mask normalisation and ignore_index handling.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pacingpseudo_tpu.losses import (
    bidirectional_kl_loss,
    cross_entropy_loss,
    dice_loss_fn,
    entropy_minimization_loss,
    kl_loss,
    l1_loss,
    l2_loss,
    multi_label_soft_margin_loss,
    partial_cross_entropy_loss,
    soft_label_cross_entropy_loss,
)

N, H, W, C = 2, 8, 9, 5
IGN = 5


def _data(rng):
    logits = rng.randn(N, H, W, C).astype(np.float32)
    target_logits = rng.randn(N, H, W, C).astype(np.float32)
    mask = (rng.rand(N, H, W, 1) > 0.4).astype(np.float32)
    return logits, target_logits, mask


def _t(x_nhwc):
    """NHWC numpy -> NCHW torch tensor."""
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def test_entropy_minimization(rng):
    logits, _, mask = _data(rng)
    tl = _t(logits)
    ref = -(F.softmax(tl, 1) * F.log_softmax(tl, 1))
    assert np.allclose(entropy_minimization_loss(logits), ref.mean().item(), atol=1e-5, rtol=1e-4)

    tm = torch.from_numpy(np.moveaxis(mask, -1, 1).copy())
    ref_masked = (ref * tm).sum() / max(tm.sum().item(), 1e-8)
    assert np.allclose(entropy_minimization_loss(logits, mask), ref_masked.item(), atol=1e-5, rtol=1e-4)


def test_cross_entropy(rng):
    logits = rng.randn(N, C).astype(np.float32)
    target = rng.randint(0, C, size=(N,))
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(target))
    assert np.allclose(cross_entropy_loss(logits, target), ref.item(), atol=1e-5, rtol=1e-4)


def test_partial_cross_entropy(rng):
    logits, _, _ = _data(rng)
    target = rng.randint(0, C + 1, size=(N, H, W))  # includes ignore value 5
    ref = F.cross_entropy(_t(logits), torch.from_numpy(target), ignore_index=IGN)
    assert np.allclose(partial_cross_entropy_loss(logits, target, IGN), ref.item(), atol=1e-5, rtol=1e-4)


def test_partial_cross_entropy_all_ignored(rng):
    logits, _, _ = _data(rng)
    target = np.full((N, H, W), IGN)
    # torch yields NaN here; we deliberately return 0 (documented deviation).
    assert float(partial_cross_entropy_loss(logits, target, IGN)) == 0.0


def test_soft_label_ce(rng):
    logits, tlogits, mask = _data(rng)
    target_prob = F.softmax(_t(tlogits), 1)
    ref = -(target_prob * F.log_softmax(_t(logits), 1))
    tp = np.moveaxis(target_prob.numpy(), 1, -1)
    assert np.allclose(soft_label_cross_entropy_loss(logits, tp), ref.mean().item(), atol=1e-5, rtol=1e-4)
    tm = torch.from_numpy(np.moveaxis(mask, -1, 1).copy())
    ref_masked = (ref * tm).sum() / max(tm.sum().item(), 1e-8)
    assert np.allclose(soft_label_cross_entropy_loss(logits, tp, mask), ref_masked.item(), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("fn,power", [(l1_loss, 1), (l2_loss, 2)])
def test_l1_l2(rng, fn, power):
    logits, tlogits, mask = _data(rng)
    p = F.softmax(_t(logits), 1)
    q = F.softmax(_t(tlogits), 1)
    diff = (p - q).abs() if power == 1 else (p - q).pow(2)
    ref = diff.sum(1, keepdim=True)
    pn = np.moveaxis(p.numpy(), 1, -1)
    qn = np.moveaxis(q.numpy(), 1, -1)
    assert np.allclose(fn(pn, qn), ref.mean().item(), atol=1e-5, rtol=1e-4)
    tm = torch.from_numpy(np.moveaxis(mask, -1, 1).copy())
    ref_masked = (ref * tm).sum() / max(tm.sum().item(), 1e-8)
    assert np.allclose(fn(pn, qn, mask), ref_masked.item(), atol=1e-5, rtol=1e-4)


def test_kl(rng):
    logits, tlogits, mask = _data(rng)
    i_ll = F.log_softmax(_t(logits), 1)
    t_ll = F.log_softmax(_t(tlogits), 1)
    ref = F.kl_div(i_ll, t_ll, log_target=True, reduction="none")
    assert np.allclose(kl_loss(logits, tlogits), ref.mean().item(), atol=1e-5, rtol=1e-4)
    tm = torch.from_numpy(np.moveaxis(mask, -1, 1).copy())
    ref_masked = (ref * tm).sum() / max(tm.sum().item(), 1e-8)
    assert np.allclose(kl_loss(logits, tlogits, mask), ref_masked.item(), atol=1e-5, rtol=1e-4)


def test_bidirectional_kl(rng):
    logits, tlogits, _ = _data(rng)
    a = kl_loss(logits, tlogits)
    b = kl_loss(tlogits, logits)
    assert np.allclose(bidirectional_kl_loss(logits, tlogits), (a + b) / 2, atol=1e-7)


def test_dice_loss(rng):
    logits, _, _ = _data(rng)
    hard = rng.randint(0, C, size=(N, H, W))
    one_hot = np.eye(C, dtype=np.float32)[hard]
    eps = 1e-5
    p = F.softmax(_t(logits), 1).reshape(N, C, -1)
    t = _t(one_hot).reshape(N, C, -1)
    up = 2 * (p * t).sum(2)
    down = p.sum(2) + t.sum(2) + eps
    ref = -(up / down).mean()
    assert np.allclose(dice_loss_fn(logits, one_hot), ref.item(), atol=1e-5, rtol=1e-4)


def test_dice_loss_empty_class(rng):
    # Class C-1 absent from target; loss must stay finite (reference keeps
    # -mean(dice) precisely so empty classes behave, losses.py:160-162).
    logits = rng.randn(1, H, W, C).astype(np.float32)
    hard = rng.randint(0, C - 1, size=(1, H, W))
    one_hot = np.eye(C, dtype=np.float32)[hard]
    val = float(dice_loss_fn(logits, one_hot))
    assert np.isfinite(val)


def test_multilabel_soft_margin(rng):
    logits = rng.randn(N, C).astype(np.float32)
    target = (rng.rand(N, C) > 0.5).astype(np.float32)
    ref = F.multilabel_soft_margin_loss(torch.from_numpy(logits), torch.from_numpy(target))
    assert np.allclose(multi_label_soft_margin_loss(logits, target), ref.item(), atol=1e-5, rtol=1e-4)
