"""Host-side .npz slice pipeline.

The reference loads one ``.npz`` per 2D slice with keys ``uid/img/lab/scb``
through four torch DataLoader worker processes that also run the whole
augmentation chain on CPU (reference: chaos_dataset.py:58-105,
train_chaos.py:237-238).  In the TPU design the host does only the cheap
part — file I/O, padding to a static canvas, batching, prefetch — and all
augmentation runs on device (aug/engine.py), so a simple thread-pool
prefetcher saturates the input pipeline.

Batches are "raw canvas" dicts:
    image/label/scribble: (N, S, S) float32 — padded to the static canvas
      (image pad 0, label/scribble pad ``ignored_index``)
    size: (N, 2) int32 live extents (h, w)
and are identical for CHAOS/ACDC/LVSC (the reference's three per-dataset
Dataset classes are copy-paste identical apart from class-name tables,
SURVEY.md §2) — the dataset becomes a config axis, not a class hierarchy.
"""
from __future__ import annotations

import concurrent.futures
import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np


def load_npz_slice(path: str) -> Dict[str, np.ndarray]:
    """Read one slice file (keys ``uid/img/lab/scb``, chaos_dataset.py:92-105)."""
    with np.load(path) as data:
        return {
            "uid": str(data["uid"]),
            "image": data["img"].astype(np.float32),
            "label": data["lab"].astype(np.float32),
            "scribble": data["scb"].astype(np.float32),
        }


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SliceDataset:
    """A list of slice files + the static canvas geometry."""

    def __init__(self, file_ls: Sequence[str], num_classes: int,
                 ignored_index: int, canvas_size: Optional[int] = None):
        if not len(file_ls):
            raise ValueError("Empty file list")
        self.file_ls = list(file_ls)
        self.num_classes = num_classes
        self.ignored_index = ignored_index
        if canvas_size is None:
            # Scan a sample of files to derive the canvas: max extent rounded
            # up to a multiple of 32 (UNet stride) for TPU-friendly shapes.
            probe = self.file_ls[:: max(1, len(self.file_ls) // 64)][:64]
            m = 0
            for p in probe:
                s = load_npz_slice(p)["image"].shape
                m = max(m, s[0], s[1])
            canvas_size = _round_up(m, 32)
        self.canvas_size = canvas_size

    def __len__(self):
        return len(self.file_ls)

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        s = load_npz_slice(self.file_ls[idx])
        h, w = s["image"].shape
        cs = self.canvas_size
        if h > cs or w > cs:
            raise ValueError(
                f"Slice {self.file_ls[idx]} ({h}x{w}) exceeds canvas {cs}")
        img = np.zeros((cs, cs), np.float32)
        lab = np.full((cs, cs), self.ignored_index, np.float32)
        scb = np.full((cs, cs), self.ignored_index, np.float32)
        img[:h, :w] = s["image"]
        lab[:h, :w] = s["label"]
        scb[:h, :w] = s["scribble"]
        return {"uid": s["uid"], "image": img, "label": lab, "scribble": scb,
                "size": np.array([h, w], np.int32)}


class BatchLoader:
    """Shuffling, batching, thread-prefetching loader over a SliceDataset.

    ``drop_last=True`` + shuffling for training (train_chaos.py:237);
    ordered, keep-last for validation (:238).  Two batches are prefetched
    ahead by a thread pool so device steps never wait on file I/O.
    """

    def __init__(self, dataset: SliceDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 seed: int = 0, num_threads: int = 8, prefetch: int = 2,
                 native: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.num_threads = num_threads
        self.prefetch = prefetch
        # Prefer the C++ loader (data/native): zip walk + inflate + npy
        # parse + canvas padding in a std::thread pool, no GIL.
        self._native = False
        if native:
            try:
                from pacingpseudo_tpu.data.native import native_available
                self._native = native_available()
            except Exception:
                self._native = False

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Pin the shuffle order to ``(seed, epoch)`` so crash+resume at
        epoch k reproduces the uninterrupted run's batch stream (the
        reference's persistent-RNG loaders cannot; SURVEY.md §5
        checkpoint/resume)."""
        self.rng = np.random.RandomState([self.seed, epoch])

    def _collate(self, idxs: Sequence[int]) -> Dict[str, np.ndarray]:
        if self._native:
            import os

            from pacingpseudo_tpu.data.native import load_batch_native
            paths = [self.dataset.file_ls[i] for i in idxs]
            batch = load_batch_native(paths, self.dataset.canvas_size,
                                      float(self.dataset.ignored_index),
                                      num_threads=self.num_threads)
            batch["uid"] = [os.path.splitext(os.path.basename(p))[0]
                            for p in paths]
            return batch
        samples = [self.dataset.load(i) for i in idxs]
        batch = {
            k: np.stack([s[k] for s in samples])
            for k in ("image", "label", "scribble", "size")
        }
        batch["uid"] = [s["uid"] for s in samples]
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        chunks = [order[i * self.batch_size:(i + 1) * self.batch_size]
                  for i in range(n_batches)]

        if self.num_threads <= 0:
            for c in chunks:
                yield self._collate(c)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with concurrent.futures.ThreadPoolExecutor(self.num_threads) as pool:
                futures = [pool.submit(self._collate, c) for c in chunks]
                for f in futures:
                    if stop.is_set():
                        for g in futures:
                            g.cancel()
                        return
                    q.put(f.result())
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
