"""ctypes bindings for the native npz batch loader.

Loads ``libnpz_loader.so`` (built by the Makefile in this directory; the
import auto-builds it with ``make`` if g++ is available) and exposes
:func:`load_batch_native`, a drop-in replacement for the Python
``SliceDataset.load`` + collate path: one C call fills the padded
(N, S, S) float32 canvases for a whole batch using a std::thread pool —
no GIL, no per-file Python overhead.

Falls back gracefully: ``native_available()`` is False when the library
can't be built/loaded, and the data pipeline keeps using numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnpz_loader.so")
_LIB = None


def _build():
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    _CPP = os.path.join(_DIR, "npz_loader.cpp")
    stale = (not os.path.exists(_SO)
             or os.path.getmtime(_SO) < os.path.getmtime(_CPP))
    if stale and not _build():
        # Never load a .so older than its source: after a signature change
        # the ctypes bindings below could call mismatched native code.
        # Returning None degrades safely to the Python loader.
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ppt_load_batch.restype = ctypes.c_int
    lib.ppt_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_batch_native(paths: Sequence[str], canvas: int,
                      ignored_index: float, num_threads: int = 8
                      ) -> Dict[str, np.ndarray]:
    """Load a batch of slice files into padded canvases via the C library."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native npz loader unavailable")
    n = len(paths)
    img = np.empty((n, canvas, canvas), np.float32)
    lab = np.empty((n, canvas, canvas), np.float32)
    scb = np.empty((n, canvas, canvas), np.float32)
    size = np.empty((n, 2), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    err = ctypes.create_string_buffer(1024)
    rc = lib.ppt_load_batch(
        c_paths, n, canvas, 0.0, float(ignored_index),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads, err, len(err))
    if rc != 0:
        raise RuntimeError(f"native loader failed: {err.value.decode()}")
    return {"image": img, "label": lab, "scribble": scb, "size": size}


class NativeBatchLoader:
    """Batch iterator backed by the C library (shuffle/drop_last semantics
    identical to data.BatchLoader)."""

    def __init__(self, file_ls: Sequence[str], canvas: int,
                 ignored_index: float, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 seed: int = 0, num_threads: int = 8):
        self.file_ls = list(file_ls)
        self.canvas = canvas
        self.ignored_index = ignored_index
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.num_threads = num_threads

    def __len__(self):
        n = len(self.file_ls)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.file_ls))
        if self.shuffle:
            self.rng.shuffle(order)
        for i in range(len(self)):
            idxs = order[i * self.batch_size:(i + 1) * self.batch_size]
            paths = [self.file_ls[j] for j in idxs]
            batch = load_batch_native(paths, self.canvas, self.ignored_index,
                                      self.num_threads)
            batch["uid"] = [os.path.splitext(os.path.basename(p))[0]
                            for p in paths]
            yield batch
