#!/usr/bin/env python
"""Reference-compatible entry point (reference: inference.py CLI surface).

``python inference.py --dataset chaost1 --fold 0 --checkpoint_file <run_dir>
[--best_ckp]`` — evaluates DSC + HD95 on the fold's test split and writes
``eval_data.npz`` (reference: inference.py:97-194).
"""
from pacingpseudo_tpu.cli.inference import main

if __name__ == "__main__":
    main()
