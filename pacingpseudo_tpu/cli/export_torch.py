"""Export one of this framework's checkpoints as a reference .pth file.

Completes the interop loop (cli/import_torch.py is the other direction):
models trained here can be evaluated or fine-tuned by the reference's own
PyTorch tooling (its inference.py loads ``state_dict`` files,
/root/reference/inference.py:138-146):

  python -m pacingpseudo_tpu.cli.export_torch \\
      --checkpoint outputs/.../ckps/best_ckp --out best_ckp.pth

Siamese checkpoints export with ``backbone.``/``aux_path.`` prefixes
(ConsistencyRegulr.state_dict() layout) unless ``--backbone_only`` strips
to a bare UNet state_dict.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="orbax -> torch checkpoint export")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (e.g. <run>/ckps/best_ckp)")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--backbone_only", action="store_true", default=False,
                   help="export only the UNet backbone of a siamese "
                        "checkpoint (bare state_dict, no prefixes)")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    from pacingpseudo_tpu.tools.torch_import import save_torch_checkpoint

    full = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.checkpoint))
    params = full["params"]
    stats = full.get("batch_stats", {})
    bank = full.get("memory_bank")

    if args.backbone_only and "backbone" in params:
        params = params["backbone"]
        stats = stats.get("backbone", {})
        bank = None

    n = save_torch_checkpoint(args.out, params, stats, bank)
    kind = "siamese" if "backbone" in params else "bare UNet"
    print(f"exported {kind} checkpoint ({n} state_dict entries) -> {args.out}")


if __name__ == "__main__":
    main()
