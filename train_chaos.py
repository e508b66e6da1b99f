#!/usr/bin/env python
"""Reference-compatible entry point (reference: train_chaos.py CLI surface).

Thin shim over the unified trainer; defaults match the reference driver
(dataset=chaos, session=Control).  ``--session Experiment`` with
``--do_loss_ent --do_decoder_consistency --do_aux_path --do_memory`` runs
full PacingPseudo (README.md:57-69 usage).
"""
from pacingpseudo_tpu.cli.train import main

if __name__ == "__main__":
    main()
