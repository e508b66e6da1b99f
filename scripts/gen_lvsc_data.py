#!/usr/bin/env python
"""Pre-generate the LVSC-scale synthetic pool for scripts/lvsc_rehearsal.sh.

Host-side only (no TPU) — run while the chip is busy.  Must use the SAME
arguments the trainer will pass (cli/train.py) so the idempotency marker
in write_synthetic_dataset makes the trainer's generation a no-op.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pacingpseudo_tpu.data.synthetic import write_synthetic_dataset

ROOT = os.environ.get("LVSC_ROOT", "/root/repo/lvsc_rehearsal")
SLICES = int(os.environ.get("LVSC_SLICES", "29086"))

t0 = time.time()
paths = write_synthetic_dataset(
    os.path.join(ROOT, "data"), "lvsc", SLICES, (224, 224),
    num_classes=2, ignored_index=2, modality="t1", seed=1,
    size_jitter=16, difficulty="easy")
print(f"{len(paths)} slices in {time.time() - t0:.0f}s")
