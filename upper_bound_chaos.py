#!/usr/bin/env python
"""Reference-compatible entry point (reference: upper_bound_chaos.py).

Runs the fully-supervised upper bound: plain UNet trained with CE + Dice on
full labels (upper_bound_chaos.py:157-167).  Forces ``--session Upperbound``
and its defaults (root ./outputs/chaos, loss_dice on).
"""
import sys

from pacingpseudo_tpu.cli.train import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--session" not in " ".join(argv):
        argv = ["--session", "Upperbound"] + argv
    main(argv)
