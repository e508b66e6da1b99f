"""Data pipeline + scribble tooling tests."""
import os

import numpy as np
import pytest

from pacingpseudo_tpu.data import (
    BatchLoader,
    SliceDataset,
    load_npz_slice,
    read_fold_split,
    read_test_split,
    synthetic,
)
from pacingpseudo_tpu.tools import (
    delete_endpoints,
    detect_endpoints,
    generate_scribble,
    skeletonize,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    synthetic.write_synthetic_dataset(
        root, "chaos", num_slices=12, size=(64, 60), num_classes=3,
        ignored_index=3, modality="t1", seed=0)
    return root


def test_skeletonize_thin_line_preserved():
    m = np.zeros((20, 20), bool)
    m[10, 2:18] = True
    sk = skeletonize(m)
    assert sk.sum() >= 14  # a 1-px line is its own skeleton (ends may trim)
    assert np.array_equal(np.where(sk.any(axis=1))[0], [10])


def test_skeletonize_disk_reduces_to_medial_axis():
    yy, xx = np.mgrid[0:31, 0:31]
    disk = (yy - 15) ** 2 + (xx - 15) ** 2 <= 100
    sk = skeletonize(disk)
    assert 0 < sk.sum() < 0.15 * disk.sum()
    assert np.all(disk[sk])  # skeleton stays inside the object


def test_generate_scribble_classes_and_ignore():
    lab = np.zeros((40, 40), np.int32)
    lab[10:25, 8:20] = 1
    lab[28:36, 25:36] = 2
    scb = generate_scribble(lab, num_classes=3, ignored_index=3)
    vals = set(np.unique(scb))
    assert vals <= {0, 1, 2, 3}
    assert 1 in vals and 2 in vals and 3 in vals
    # scribbles must lie inside their class region
    assert np.all(lab[scb == 1] == 1)
    assert np.all(lab[scb == 2] == 2)
    # scribble is sparse
    assert (scb != 3).sum() < 0.1 * lab.size


def test_generate_scribble_dilated_style():
    lab = np.zeros((40, 40), np.int32)
    lab[10:25, 8:20] = 1
    lab[28:36, 25:36] = 2
    thin = generate_scribble(lab, num_classes=3, ignored_index=3)
    thick = generate_scribble(lab, num_classes=3, ignored_index=3,
                              style="dilated", dilate_iters=2)
    # strictly richer supervision, still confined to the class regions
    assert (thick != 3).sum() > (thin != 3).sum()
    assert np.all(lab[thick == 1] == 1)
    assert np.all(lab[thick == 2] == 2)
    # every skeleton pixel survives dilation (superset per class)
    for c in (1, 2):
        assert np.all(thick[thin == c] == c)


def test_generate_scribble_background_only_line():
    lab = np.zeros((48, 48), np.int32)
    scb = generate_scribble(lab, num_classes=2, ignored_index=2)
    n_bg = (scb == 0).sum()
    assert n_bg >= 10  # extended to a line, not a single point


def test_detect_endpoints_line():
    m = np.zeros((15, 15))
    m[7, 3:12] = 1
    ep = detect_endpoints(m)
    ys, xs = np.where(ep >= 1)
    assert set(zip(ys, xs)) == {(7, 3), (7, 11)}


def test_delete_endpoints_shortens():
    m = np.zeros((15, 15))
    m[7, 3:12] = 1   # length 9
    unk = np.zeros_like(m)
    short, unk2 = delete_endpoints(m, unk, length=9, ratio=0.5)
    assert short.sum() == 5  # ceil(9*0.5) = 5
    assert unk2.sum() == 4
    # removed pixels moved to unknown
    assert np.all((short + unk2)[m == 1] >= 1)


def test_synthetic_dataset_layout_and_loader(synth_root):
    train, val = read_fold_split(synth_root, "chaos", fold=0, modality="t1")
    assert len(train) == 9 and len(val) == 3  # 12 slices, fold0 test = idx 0,5,10
    test = read_test_split(synth_root, "chaost1", fold=0)
    assert test == val

    s = load_npz_slice(train[0])
    assert s["image"].shape == (64, 60)
    assert set(np.unique(s["scribble"])) <= {0, 1, 2, 3}

    ds = SliceDataset(train, num_classes=3, ignored_index=3)
    assert ds.canvas_size == 64  # round_up(max(64,60), 32)
    sample = ds.load(0)
    assert sample["image"].shape == (64, 64)
    assert np.all(sample["label"][:, 60:] == 3)  # ignore padding
    assert tuple(sample["size"]) == (64, 60)


def test_synthetic_split_is_patient_level(tmp_path):
    # ADVICE r3: folds must stripe pseudo-PATIENTS (reference README.md:19),
    # not slices — otherwise every patient leaks into both sides.
    root = str(tmp_path)
    synthetic.write_synthetic_dataset(
        root, "acdc", num_slices=240, size=(32, 32), num_classes=2,
        ignored_index=2, seed=3)
    seen_test = set()
    for fold in range(5):
        train, test = read_fold_split(root, "acdc", fold=fold)
        assert train and test
        tr_p = {os.path.basename(p).split("_")[0] for p in train}
        te_p = {os.path.basename(p).split("_")[0] for p in test}
        assert not tr_p & te_p, f"fold {fold} leaks patients {tr_p & te_p}"
        seen_test |= te_p
    assert len(seen_test) == 10  # 240 slices / 24 per pseudo-patient


def test_synthetic_marker_detects_partial_clean(tmp_path):
    root = str(tmp_path)
    rel = synthetic.write_synthetic_dataset(
        root, "acdc", num_slices=10, size=(32, 32), num_classes=2,
        ignored_index=2, seed=4)
    victim = os.path.join(root, "acdc", rel[-1])
    os.remove(victim)
    # Stale marker + missing file → regeneration, not a broken cache hit.
    rel2 = synthetic.write_synthetic_dataset(
        root, "acdc", num_slices=10, size=(32, 32), num_classes=2,
        ignored_index=2, seed=4)
    assert rel2 == rel
    assert os.path.exists(victim)


def test_synthetic_scribble_ratio_sparsifies_pool(tmp_path):
    # Round-4 hunt knob: --synthetic_scribble_ratio shortens every stroke
    # at pool-build time (reference's utils_shorten_scribble_length.py
    # ablation axis), and the idempotency stamp distinguishes ratios.
    def scrib_px(root):
        tot = 0
        sdir = os.path.join(root, "acdc", "slices")
        for f in sorted(os.listdir(sdir)):
            if f.endswith(".npz"):
                scb = np.load(os.path.join(sdir, f))["scb"]
                tot += int((scb < 2).sum())  # labelled (non-ignored) px
        return tot

    full_root, short_root = str(tmp_path / "full"), str(tmp_path / "short")
    kw = dict(num_slices=6, size=(48, 48), num_classes=2, ignored_index=2,
              seed=7)
    synthetic.write_synthetic_dataset(full_root, "acdc", **kw)
    synthetic.write_synthetic_dataset(short_root, "acdc", scribble_ratio=0.15,
                                      **kw)
    full_px, short_px = scrib_px(full_root), scrib_px(short_root)
    assert 0 < short_px < 0.45 * full_px
    # re-running with a different ratio regenerates (stamp mismatch)
    synthetic.write_synthetic_dataset(short_root, "acdc", scribble_ratio=0.5,
                                      **kw)
    mid_px = scrib_px(short_root)
    assert short_px < mid_px < full_px


def test_batch_loader_shapes_and_epochs(synth_root):
    train, _ = read_fold_split(synth_root, "chaos", fold=0, modality="t1")
    ds = SliceDataset(train, num_classes=3, ignored_index=3)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (4, 64, 64)
    assert b["size"].shape == (4, 2)
    assert len(b["uid"]) == 4
    # different epoch -> different shuffle order
    uids1 = [u for bt in batches for u in bt["uid"]]
    uids2 = [u for bt in loader for u in bt["uid"]]
    assert set(uids1) != set() and (uids1 != uids2 or len(set(uids1)) <= 1)


def test_batch_loader_keep_last(synth_root):
    _, val = read_fold_split(synth_root, "chaos", fold=0, modality="t1")
    ds = SliceDataset(val, num_classes=3, ignored_index=3)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=False)
    batches = list(loader)
    assert sum(b["image"].shape[0] for b in batches) == 3


def test_synthetic_regen_clears_stale_slices(tmp_path):
    # ADVICE r4: regenerating a pool under a different layout (e.g. the
    # pseudo-patient group size changed) must remove slice files from the
    # previous naming, or directory-scanning consumers see a stale mix.
    root = str(tmp_path)
    synthetic.write_synthetic_dataset(
        root, "acdc", num_slices=10, size=(32, 32), num_classes=2,
        ignored_index=2, seed=4)
    slice_dir = os.path.join(root, "acdc", "slices")
    stale = os.path.join(slice_dir, "pat999_slice000.npz")
    with open(stale, "wb") as f:
        f.write(b"stale")
    # different slice count -> marker mismatch -> regeneration
    rel = synthetic.write_synthetic_dataset(
        root, "acdc", num_slices=8, size=(32, 32), num_classes=2,
        ignored_index=2, seed=4)
    assert not os.path.exists(stale)
    on_disk = {f for f in os.listdir(slice_dir) if f.endswith(".npz")}
    assert on_disk == {os.path.basename(p) for p in rel}
