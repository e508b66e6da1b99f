"""Convert a reference PyTorch checkpoint (.pth) into an Orbax checkpoint.

Migration path for reference users: their ``best_ckp.pth`` /
``ckp_399.pth`` files (bare UNet or siamese ConsistencyRegulr state_dicts)
become checkpoints this framework's inference/fine-tuning drivers open
directly:

  python -m pacingpseudo_tpu.cli.import_torch \\
      --pth outputs/.../best_ckp.pth --out imported-fold0/best_ckp
  python inference.py --dataset chaost1 --fold 0 \\
      --checkpoint_file imported-fold0 --best_ckp
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="torch -> orbax checkpoint import")
    p.add_argument("--pth", required=True, help="reference .pth state_dict")
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    from pacingpseudo_tpu.tools.torch_import import load_torch_checkpoint

    params, batch_stats, bank = load_torch_checkpoint(args.pth)
    payload = {
        "step": np.zeros((), np.int32),
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": {},
    }
    if bank is not None:
        payload["memory_bank"] = bank

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(args.out), payload, force=True)
    kind = "siamese (backbone+aux_path)" if "backbone" in params else "bare UNet"
    n = sum(int(np.prod(np.shape(x))) for x in
            __import__("jax").tree.leaves(params))
    print(f"imported {kind} checkpoint: {n:,} params -> {args.out}")


if __name__ == "__main__":
    main()
