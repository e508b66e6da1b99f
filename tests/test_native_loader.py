"""Native (C++) npz batch loader parity tests."""
import numpy as np
import pytest

from pacingpseudo_tpu.data import SliceDataset, synthetic

native = pytest.importorskip("pacingpseudo_tpu.data.native")
if not native.native_available():
    pytest.skip("native loader unavailable (no g++/zlib)", allow_module_level=True)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nat"))
    synthetic.write_synthetic_dataset(
        root, "acdc", num_slices=6, size=(48, 40), num_classes=3,
        ignored_index=3, seed=3)
    import glob
    return sorted(glob.glob(root + "/acdc/slices/*.npz"))


def test_native_matches_numpy(files):
    ds = SliceDataset(files, 3, 3)
    nb = native.load_batch_native(files, ds.canvas_size, 3.0)
    for i in range(len(files)):
        ref = ds.load(i)
        for k in ("image", "label", "scribble"):
            assert np.array_equal(nb[k][i], ref[k]), (i, k)
        assert tuple(nb["size"][i]) == tuple(ref["size"])
    assert nb["image"].dtype == np.float32


def test_native_compressed_npz(files, tmp_path):
    """np.savez_compressed members (deflate) must decode identically."""
    import numpy as np
    src = np.load(files[0])
    p = str(tmp_path / "comp.npz")
    np.savez_compressed(p, uid=src["uid"], img=src["img"], lab=src["lab"],
                        scb=src["scb"])
    ds = SliceDataset([files[0]], 3, 3)
    a = native.load_batch_native([files[0]], ds.canvas_size, 3.0)
    b = native.load_batch_native([p], ds.canvas_size, 3.0)
    for k in ("image", "label", "scribble"):
        assert np.array_equal(a[k], b[k])


def test_native_dtype_casts(tmp_path):
    """int16/uint8/float64 members are cast to float32 like the numpy path."""
    img = (np.random.RandomState(0).rand(10, 12) * 200).astype(np.float64)
    lab = np.random.RandomState(1).randint(0, 3, (10, 12)).astype(np.int16)
    scb = np.random.RandomState(2).randint(0, 4, (10, 12)).astype(np.uint8)
    p = str(tmp_path / "cast.npz")
    np.savez(p, uid="x", img=img, lab=lab, scb=scb)
    out = native.load_batch_native([p], 32, 3.0)
    assert np.allclose(out["image"][0, :10, :12], img.astype(np.float32))
    assert np.array_equal(out["label"][0, :10, :12], lab.astype(np.float32))
    assert np.array_equal(out["scribble"][0, :10, :12], scb.astype(np.float32))
    assert np.all(out["label"][0, 10:, :] == 3.0)  # ignore padding


def test_native_error_reporting(tmp_path):
    p = str(tmp_path / "junk.npz")
    with open(p, "wb") as f:
        f.write(b"not a zip at all")
    with pytest.raises(RuntimeError, match="junk"):
        native.load_batch_native([p], 32, 3.0)


def test_native_batch_loader_iterates(files):
    loader = native.NativeBatchLoader(files, canvas=64, ignored_index=3.0,
                                      batch_size=4, shuffle=True, seed=0)
    total = 0
    for b in loader:
        assert b["image"].shape[1:] == (64, 64)
        total += b["image"].shape[0]
    assert total == 6


def test_native_truncated_and_mutated_npz_raise(files, tmp_path):
    """The ADVICE round-1 bounds-check scenario: a structurally-valid zip
    prefix with a truncated/corrupted tail must raise a Python error, not
    read out of bounds (data/native/npz_loader.cpp bounds checks)."""
    raw = open(files[0], "rb").read()
    # truncate at several points inside the member payloads
    for frac in (0.3, 0.6, 0.9):
        p = str(tmp_path / f"trunc{int(frac*100)}.npz")
        with open(p, "wb") as f:
            f.write(raw[: int(len(raw) * frac)])
        with pytest.raises(RuntimeError):
            native.load_batch_native([p], 64, 3.0)
    # flip bytes in the central directory region (tail of the file)
    mut = bytearray(raw)
    for off in range(len(mut) - 40, len(mut) - 20):
        mut[off] ^= 0xFF
    p = str(tmp_path / "mut.npz")
    with open(p, "wb") as f:
        f.write(bytes(mut))
    with pytest.raises(RuntimeError):
        native.load_batch_native([p], 64, 3.0)
