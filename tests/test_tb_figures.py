"""TB observability parity: the training-batch panel set
(train_chaos.py:320-360) — image/scribble/weak pred/weak hist plus strong
image+pred+hist and the auxiliary prediction."""
import numpy as np

from pacingpseudo_tpu.train.loop import _tb_train_figures


class _FakeTB:
    def __init__(self):
        self.figures = []
        self.hists = {}

    def add_figure(self, tag, fig, step):
        self.figures.append(tag)

    def add_histogram(self, tag, values, step):
        self.hists[tag] = np.asarray(values)


def _batch_outputs(rng, strong=True, aux=True):
    n, h, c = 2, 16, 3
    batch = {
        "image": rng.randn(n, h, h, 1).astype(np.float32),
        "scribble": np.eye(c + 1, dtype=np.float32)[
            rng.randint(0, c + 1, (n, h, h))],
    }
    outputs = {"segmentation/logits": rng.randn(n, h, h, c).astype(np.float32)}
    if strong:
        batch["image_strong"] = rng.randn(n, h, h, 1).astype(np.float32)
        outputs["segmentation/logits_strong"] = rng.randn(n, h, h, c).astype(
            np.float32)
    if aux:
        outputs["aux/logits"] = rng.randn(n, h, h, c).astype(np.float32)
    return batch, outputs


def test_full_reference_panel_set(rng):
    tb = _FakeTB()
    batch, outputs = _batch_outputs(rng)
    _tb_train_figures(tb, batch, outputs, epoch=0)
    assert set(tb.figures) == {
        "predictions/image",
        "predictions/scribble",
        "predictions/prediction_decoder_weak",
        "predictions/image_strong",
        "predictions/prediction_decoder_strong",
        "predictions/prediction_auxiliary_segmentation",
    }
    assert set(tb.hists) == {"histogram/prob_weak_max",
                             "histogram/prob_strong_max"}
    # histograms are the per-pixel max softmax probability — in (1/C, 1]
    for v in tb.hists.values():
        assert v.shape == (2, 16, 16)
        assert v.min() >= 1.0 / 3 - 1e-6 and v.max() <= 1.0 + 1e-6
    # prob_strong_max is the STRONG stream's (the reference feeds it
    # prob_weak_max by mistake, train_chaos.py:352 — corrected here)
    assert not np.allclose(tb.hists["histogram/prob_weak_max"],
                           tb.hists["histogram/prob_strong_max"])


def test_panels_degrade_without_strong_and_aux(rng):
    tb = _FakeTB()
    batch, outputs = _batch_outputs(rng, strong=False, aux=False)
    _tb_train_figures(tb, batch, outputs, epoch=3)
    assert set(tb.figures) == {"predictions/image", "predictions/scribble",
                               "predictions/prediction_decoder_weak"}
    assert set(tb.hists) == {"histogram/prob_weak_max"}
