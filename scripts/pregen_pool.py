"""Pre-generate a synthetic pool OUTSIDE the chip-arm watchdogs.

The 2026-08-19 seed-2 sweep incident: pool generation for a fresh
(data_root, seed) runs silently inside the first training arm — ~15 min
of CPU work with zero log output — so a log-growth watchdog kills it,
and (with the old `timeout` wrapper) the kill orphaned the python child,
piling concurrent clients onto the TPU relay until its stream wedged.
Running the generation here, foreground with a progress line, makes the
first arm start at the same cost as every other arm.

Replicates cli/train.py:301-312 exactly (same stamp inputs) so the
training arms then find the pool marker valid and never regenerate.
Pass the SAME dataset-defining argv the sweep arms will use.
"""
import os
import sys

# scripts/ (not the repo root) is sys.path[0] when run as a file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pacingpseudo_tpu.cli.train import build_parser, config_from_args
from pacingpseudo_tpu.config import DATASETS
from pacingpseudo_tpu.data.synthetic import write_synthetic_dataset


def main(argv=None):
    args = build_parser().parse_args(argv)
    config = config_from_args(args).validate()
    assert args.synthetic_data, "--synthetic_data required"
    spec = DATASETS[config.dataset]
    paths = write_synthetic_dataset(
        args.data_root, config.dataset, args.synthetic_data,
        tuple(args.input_size) if args.input_size else spec.input_size,
        config.num_classes, config.ignored_index,
        modality=config.modality, seed=config.seed,
        size_jitter=args.synthetic_size_jitter,
        difficulty=args.synthetic_difficulty,
        scribble_style=args.synthetic_scribble_style,
        scribble_ratio=args.synthetic_scribble_ratio)
    print(f"pool ready: {len(paths)} slices under {args.data_root}",
          flush=True)


if __name__ == "__main__":
    main()
