"""Tests for the raw-data conversion pipeline (tools/medio, tools/prepare_data).

The readers are validated structurally: files are synthesised byte-by-byte
to the NIfTI-1 / DICOM specs (no nibabel/pydicom in this image) and parsed
back; the dataset adapters run end-to-end on tiny synthetic raw trees and
the result is loaded through the REAL split parser + SliceDataset.
"""
import os
import struct

import numpy as np
import pytest

from pacingpseudo_tpu.data.npz_dataset import SliceDataset, load_npz_slice
from pacingpseudo_tpu.data.splits import read_fold_split
from pacingpseudo_tpu.tools.medio import (
    read_dicom, read_dicom_series, read_nifti, write_nifti)
from pacingpseudo_tpu.tools.prepare_data import (
    chaos_png_to_label, crop_or_pad, prepare_acdc, prepare_chaos,
    prepare_lvsc, resample_inplane, write_five_fold_splits)


# ---------------------------------------------------------------------------
# NIfTI
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_nifti_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.RandomState(0)
    vol = (rng.rand(7, 5, 3) * 100).astype(dtype)
    path = str(tmp_path / f"v{suffix}")
    write_nifti(path, vol, spacing=(1.5, 2.0, 8.0))
    back, spacing = read_nifti(path)
    np.testing.assert_array_equal(back, vol)
    assert spacing == pytest.approx((1.5, 2.0, 8.0))


def test_nifti_scl_slope_and_big_endian(tmp_path):
    vol = np.arange(24, dtype=np.int16).reshape(4, 3, 2)
    path = str(tmp_path / "v.nii")
    write_nifti(path, vol)
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<f", raw, 112, 2.0)    # scl_slope
    struct.pack_into("<f", raw, 116, -1.0)   # scl_inter
    open(path, "wb").write(bytes(raw))
    back, _ = read_nifti(path)
    np.testing.assert_allclose(back, vol.astype(np.float32) * 2.0 - 1.0)

    # Big-endian variant: swap header fields + payload.
    be = bytearray(352)
    struct.pack_into(">i", be, 0, 348)
    struct.pack_into(">8h", be, 40, 3, 4, 3, 2, 1, 1, 1, 1)
    struct.pack_into(">h", be, 70, 4)        # int16
    struct.pack_into(">h", be, 72, 16)
    struct.pack_into(">8f", be, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(">f", be, 108, 352.0)
    be[344:348] = b"n+1\x00"
    payload = vol.astype(">i2").tobytes(order="F")
    be_path = str(tmp_path / "be.nii")
    open(be_path, "wb").write(bytes(be) + payload)
    back_be, _ = read_nifti(be_path)
    np.testing.assert_array_equal(back_be, vol)


def test_nifti_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.nii")
    open(path, "wb").write(b"\x00" * 400)
    with pytest.raises(ValueError):
        read_nifti(path)


# ---------------------------------------------------------------------------
# DICOM synthesis helpers
# ---------------------------------------------------------------------------

def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    return struct.pack("<HH", group, elem) + struct.pack("<I", len(value)) \
        + value


def make_dicom(pixels: np.ndarray, spacing=(1.5, 1.5), instance=1,
               explicit=True, rescale=None, extra=b"",
               transfer=None) -> bytes:
    """Synthesise a minimal spec-conformant DICOM file."""
    rows, cols = pixels.shape
    px = np.ascontiguousarray(pixels)
    signed = px.dtype in (np.int8, np.int16)
    bits = px.dtype.itemsize * 8
    ts = transfer or ("1.2.840.10008.1.2.1" if explicit
                      else "1.2.840.10008.1.2")
    ts_b = ts.encode() + (b"\x00" if len(ts) % 2 else b"")
    meta = _el_explicit(0x0002, 0x0010, b"UI", ts_b)
    el = _el_explicit if explicit else _el_implicit

    def E(g, e, vr, v):
        return el(g, e, vr, v) if explicit else _el_implicit(g, e, v)

    body = b""
    body += E(0x0010, 0x0020, b"LO", b"PAT1")
    body += E(0x0020, 0x0013, b"IS", str(instance).encode().ljust(2))
    body += extra
    body += E(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += E(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    sp = f"{spacing[0]}\\{spacing[1]}".encode()
    body += E(0x0028, 0x0030, b"DS", sp + (b" " if len(sp) % 2 else b""))
    body += E(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    body += E(0x0028, 0x0103, b"US", struct.pack("<H", int(signed)))
    if rescale is not None:
        slope, inter = rescale
        body += E(0x0028, 0x1052, b"DS", f"{inter}".encode().ljust(2))
        body += E(0x0028, 0x1053, b"DS", f"{slope}".encode().ljust(2))
    body += E(0x7FE0, 0x0010, b"OW", px.tobytes())
    return b"\x00" * 128 + b"DICM" + meta + body


@pytest.mark.parametrize("explicit", [True, False])
def test_dicom_roundtrip(tmp_path, explicit):
    rng = np.random.RandomState(1)
    px = rng.randint(0, 4000, (10, 8)).astype(np.uint16)
    path = str(tmp_path / "a.dcm")
    open(path, "wb").write(make_dicom(px, spacing=(1.25, 0.75), instance=7,
                                      explicit=explicit))
    d = read_dicom(path)
    np.testing.assert_array_equal(d["pixels"], px.astype(np.float32))
    assert d["spacing"] == pytest.approx((1.25, 0.75))
    assert d["instance_number"] == 7
    assert d["patient_id"] == "PAT1"


def test_dicom_rescale_and_signed(tmp_path):
    px = np.array([[-10, 0], [5, 100]], np.int16)
    path = str(tmp_path / "s.dcm")
    open(path, "wb").write(make_dicom(px, rescale=(2.0, -3.0)))
    d = read_dicom(path)
    np.testing.assert_allclose(d["pixels"], px.astype(np.float32) * 2 - 3)


def test_dicom_skips_undefined_sequence(tmp_path):
    # An SQ with undefined length + one defined-length item must not derail
    # parsing of the elements that follow it.
    item = struct.pack("<HHI", 0xFFFE, 0xE000, 4) + b"ABCD"
    delim = struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    sq = _el_explicit(0x0008, 0x1140, b"SQ",
                      b"")[:8] + struct.pack("<I", 0xFFFFFFFF) + item + delim
    px = np.ones((2, 2), np.uint16)
    path = str(tmp_path / "sq.dcm")
    open(path, "wb").write(make_dicom(px, extra=sq))
    d = read_dicom(path)
    np.testing.assert_array_equal(d["pixels"], px.astype(np.float32))


def test_dicom_rejects_compressed(tmp_path):
    px = np.ones((2, 2), np.uint16)
    path = str(tmp_path / "jpg.dcm")
    open(path, "wb").write(make_dicom(px, transfer="1.2.840.10008.1.2.4.70"))
    with pytest.raises(ValueError, match="not supported"):
        read_dicom(path)


def test_dicom_series_sorts_by_instance(tmp_path):
    # Write files whose NAME order disagrees with InstanceNumber.
    for name, inst, fill in (("a.dcm", 3, 30), ("b.dcm", 1, 10),
                             ("c.dcm", 2, 20)):
        px = np.full((4, 4), fill, np.uint16)
        open(str(tmp_path / name), "wb").write(make_dicom(px, instance=inst))
    vol, spacing = read_dicom_series(
        [str(tmp_path / n) for n in ("a.dcm", "b.dcm", "c.dcm")])
    assert vol.shape == (3, 4, 4)
    np.testing.assert_array_equal(vol[:, 0, 0], [10, 20, 30])


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def test_chaos_png_label_mapping():
    png = np.array([0, 40, 63, 126, 189, 252, 255], np.uint8)[None]
    np.testing.assert_array_equal(chaos_png_to_label(png),
                                  [[0, 0, 1, 2, 3, 4, 4]])


def test_crop_or_pad_center():
    arr = np.arange(16, dtype=np.float32).reshape(4, 4)
    padded = crop_or_pad(arr, 6, -1)
    assert padded.shape == (6, 6)
    assert padded[0, 0] == -1 and padded[1, 1] == arr[0, 0]
    cropped = crop_or_pad(arr, 2, -1)
    np.testing.assert_array_equal(cropped, arr[1:3, 1:3])


def test_resample_inplane_orders():
    lab = np.zeros((10, 10), np.uint8)
    lab[3:7, 3:7] = 2
    out = resample_inplane(lab, (2.0, 2.0), 1.0, order=0)
    assert out.shape == (20, 20)
    assert set(np.unique(out)) <= {0, 2}          # nearest keeps classes
    img = resample_inplane(lab.astype(np.float32), (2.0, 2.0), 1.0, order=3)
    assert img.shape == (20, 20)
    # Identity spacing is a no-op (object identity, no resample blur).
    same = resample_inplane(lab, (1.0, 1.0), 1.0, order=0)
    assert same is lab


def test_write_five_fold_splits_patient_level(tmp_path):
    pf = {f"p{i}": [f"slices/p{i}_s0.npz", f"slices/p{i}_s1.npz"]
          for i in range(7)}
    write_five_fold_splits(str(tmp_path / "acdc"), pf)
    seen_test = set()
    for fold in range(5):
        train, test = read_fold_split(str(tmp_path), "acdc", fold)
        # patient-level: no patient appears on both sides
        tr_p = {os.path.basename(f).split("_")[0] for f in train}
        te_p = {os.path.basename(f).split("_")[0] for f in test}
        assert not tr_p & te_p
        assert len(train) + len(test) == 14
        seen_test |= te_p
    assert seen_test == set(pf)                   # every patient tested once


# ---------------------------------------------------------------------------
# End-to-end adapters on synthetic raw trees
# ---------------------------------------------------------------------------

def _fake_acdc_tree(root, n_patients=3, scribbles=True):
    rng = np.random.RandomState(0)
    scb_root = root / "scribbles"
    for i in range(1, n_patients + 1):
        pdir = root / f"patient{i:03d}"
        pdir.mkdir(parents=True)
        for frame in ("01", "12"):
            img = rng.rand(20, 18, 4).astype(np.float32) * 100
            gt = np.zeros((20, 18, 4), np.uint8)
            gt[6:14, 5:12, :] = rng.randint(1, 4)
            write_nifti(str(pdir / f"patient{i:03d}_frame{frame}.nii.gz"),
                        img, spacing=(1.51, 1.51, 10.0))
            write_nifti(str(pdir / f"patient{i:03d}_frame{frame}_gt.nii.gz"),
                        gt, spacing=(1.51, 1.51, 10.0))
            if scribbles:
                scb = np.full((20, 18, 4), 4, np.uint8)
                scb[8:12, 7:10, :] = gt[8:12, 7:10, :]
                scb[0, 0, :] = 0
                sdir = scb_root / f"patient{i:03d}"
                sdir.mkdir(parents=True, exist_ok=True)
                write_nifti(
                    str(sdir / f"patient{i:03d}_frame{frame}_scribble.nii.gz"),
                    scb, spacing=(1.51, 1.51, 10.0))
    return scb_root


def test_prepare_acdc_end_to_end(tmp_path):
    raw = tmp_path / "raw"
    scb_root = _fake_acdc_tree(raw)
    out = tmp_path / "data"
    pf = prepare_acdc(str(raw), str(out), scribble_dir=str(scb_root))
    assert len(pf) == 3 and all(len(v) == 8 for v in pf.values())

    train, val = read_fold_split(str(out), "acdc", 0)
    assert train and val
    ds = SliceDataset(val, num_classes=4, ignored_index=4)
    rec = ds.load(0)
    assert rec["image"].shape == rec["scribble"].shape
    s = load_npz_slice(val[0])
    # vios-s scribble values pass through: ignored 4 dominates, classes kept
    assert s["scribble"].max() == 4
    assert set(np.unique(s["label"])) <= set(range(5))
    # spacing was already 1.51 → no resample; native extent preserved
    assert s["image"].shape == (18, 20)


def test_prepare_acdc_without_scribbles_generates(tmp_path):
    raw = tmp_path / "raw"
    _fake_acdc_tree(raw, n_patients=1, scribbles=False)
    out = tmp_path / "data"
    pf = prepare_acdc(str(raw), str(out))
    path = os.path.join(str(out), "acdc", sorted(pf["patient001"])[0])
    s = load_npz_slice(path)
    assert s["scribble"].max() == 4                # artificial, has unknown


def test_prepare_chaos_end_to_end(tmp_path):
    rng = np.random.RandomState(2)
    raw = tmp_path / "MR"
    from PIL import Image
    for pat in ("1", "2"):
        droot = raw / pat / "T1DUAL" / "DICOM_anon" / "InPhase"
        ground = raw / pat / "T1DUAL" / "Ground"
        droot.mkdir(parents=True)
        ground.mkdir(parents=True)
        for z in range(3):
            px = rng.randint(0, 1000, (32, 30)).astype(np.uint16)
            open(str(droot / f"i{z}.dcm"), "wb").write(
                make_dicom(px, spacing=(1.62, 1.62), instance=z + 1))
            g = np.zeros((32, 30), np.uint8)
            g[10:20, 10:20] = 63                   # liver code
            g[2:6, 2:6] = 252                      # spleen code
            Image.fromarray(g).save(str(ground / f"g{z}.png"))
    out = tmp_path / "data"
    pf = prepare_chaos(str(raw), str(out), modality="t1", size=64)
    assert set(pf) == {"ct11", "ct12"} and all(len(v) == 3 for v in pf.values())
    train, val = read_fold_split(str(out), "chaost1", 0)
    s = load_npz_slice((train + val)[0])
    assert s["image"].shape == (64, 64)
    assert {1, 4} <= set(np.unique(s["label"]))    # liver + spleen decoded
    assert s["scribble"].max() == 5                # artificial, unknown=5


def test_prepare_lvsc_end_to_end(tmp_path):
    rng = np.random.RandomState(3)
    raw = tmp_path / "lvsc_raw"
    from PIL import Image
    for pat in ("CAP1", "CAP2"):
        pdir = raw / pat
        pdir.mkdir(parents=True)
        for z in range(2):
            px = rng.randint(0, 500, (24, 24)).astype(np.uint16)
            open(str(pdir / f"s{z}.dcm"), "wb").write(
                make_dicom(px, spacing=(1.48, 1.48), instance=z + 1))
            m = np.zeros((24, 24), np.uint8)
            m[8:16, 8:16] = 255
            Image.fromarray(m).save(str(pdir / f"s{z}.png"))
    out = tmp_path / "data"
    pf = prepare_lvsc(str(raw), str(out))
    assert set(pf) == {"CAP1", "CAP2"}
    train, val = read_fold_split(str(out), "lvsc", 0)
    s = load_npz_slice((train + val)[0])
    assert set(np.unique(s["label"])) <= {0, 1}
    assert s["scribble"].max() == 2                # artificial, unknown=2


def test_prepare_lvsc_mask_alignment_when_name_order_differs(tmp_path):
    # Regression: LVSC phase naming like ..._ph2 / ..._ph10 makes filename
    # order disagree with InstanceNumber order; masks (paired by stem) must
    # still land on the slice of THEIR OWN DICOM.
    raw = tmp_path / "lvsc_raw"
    from PIL import Image
    pdir = raw / "CAP9"
    pdir.mkdir(parents=True)
    # Distinct image fill per phase; distinct mask row band per phase.
    cases = [("s_ph1", 1, 100, (0, 6)), ("s_ph2", 2, 200, (9, 15)),
             ("s_ph10", 10, 1000, (18, 24))]
    for stem, inst, fill, (r0, r1) in cases:
        px = np.full((24, 24), fill, np.uint16)
        open(str(pdir / f"{stem}.dcm"), "wb").write(
            make_dicom(px, spacing=(1.48, 1.48), instance=inst))
        m = np.zeros((24, 24), np.uint8)
        m[r0:r1, 4:20] = 255
        Image.fromarray(m).save(str(pdir / f"{stem}.png"))
    out = tmp_path / "data"
    prepare_lvsc(str(raw), str(out), size=24)
    # Volume order is instance order: ph1, ph2, ph10.
    for z, (_, _, fill, (r0, r1)) in enumerate(cases):
        s = load_npz_slice(str(out / "lvsc" / "slices" / f"CAP9_s{z:03d}.npz"))
        assert s["image"].max() == pytest.approx(fill)
        rows = np.where(s["label"].any(axis=1))[0]
        assert rows.min() == r0 and rows.max() == r1 - 1, \
            f"slice {z}: mask rows {rows.min()}..{rows.max()} != {r0}..{r1-1}"


def test_prepare_chaos_ground_alignment_when_name_order_differs(tmp_path):
    # Ground PNGs pair positionally with filename-sorted DICOMs; when the
    # volume is stacked by InstanceNumber the labels must be permuted the
    # same way.
    raw = tmp_path / "MR"
    from PIL import Image
    droot = raw / "1" / "T1DUAL" / "DICOM_anon" / "InPhase"
    ground = raw / "1" / "T1DUAL" / "Ground"
    droot.mkdir(parents=True)
    ground.mkdir(parents=True)
    # Filename order a,b,c; instance order b(1), c(2), a(3).
    dicoms = [("a.dcm", 3, 300), ("b.dcm", 1, 100), ("c.dcm", 2, 200)]
    for name, inst, fill in dicoms:
        px = np.full((32, 32), fill, np.uint16)
        open(str(droot / name), "wb").write(
            make_dicom(px, spacing=(1.62, 1.62), instance=inst))
    # gN pairs with the N-th filename-sorted DICOM: g0↔a, g1↔b, g2↔c.
    bands = [(0, 6), (10, 16), (20, 26)]
    for i, (r0, r1) in enumerate(bands):
        g = np.zeros((32, 32), np.uint8)
        g[r0:r1, 4:28] = 63                        # liver code
        Image.fromarray(g).save(str(ground / f"g{i}.png"))
    out = tmp_path / "data"
    prepare_chaos(str(raw), str(out), modality="t1", size=32)
    # Instance order b,c,a → labels g1, g2, g0.
    expect = [(100, bands[1]), (200, bands[2]), (300, bands[0])]
    for z, (fill, (r0, r1)) in enumerate(expect):
        s = load_npz_slice(str(out / "chaos" / "slices" /
                               f"ct11_s{z:03d}.npz"))
        assert s["image"].max() == pytest.approx(fill)
        rows = np.where(s["label"] == 1)[0]
        assert rows.min() == r0 and rows.max() == r1 - 1, \
            f"slice {z}: label rows {rows.min()}..{rows.max()} != {r0}..{r1-1}"


def test_prepare_data_cli(tmp_path):
    raw = tmp_path / "raw"
    _fake_acdc_tree(raw, n_patients=1, scribbles=False)
    from pacingpseudo_tpu.cli.prepare_data import main
    rc = main(["acdc", "--raw_dir", str(raw),
               "--out_root", str(tmp_path / "data"), "--size", "32"])
    assert rc == 0
    s = load_npz_slice(str(next((tmp_path / "data" / "acdc" / "slices")
                                .glob("*.npz"))))
    assert s["image"].shape == (32, 32)
