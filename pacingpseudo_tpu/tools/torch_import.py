"""Import reference PyTorch checkpoints (.pth) into this framework.

A user of the reference has ``model.state_dict()`` checkpoints from
train_chaos.py / upper_bound_chaos.py (bare ``UNet`` or siamese
``ConsistencyRegulr`` with ``backbone.`` / ``aux_path.`` prefixes,
inference.py:138-146).  This module converts them to flax params +
batch_stats (and the memory bank), so existing checkpoints evaluate and
fine-tune here directly — and it powers the strongest parity test we have:
identical weights must produce identical logits (tests/test_torch_parity.py).

Name mapping (reference models/unet.py vs models/unet.py here — module
names match one-to-one by design):

  enc_blockK.conv_block.conv_layerJ.conv.{weight,bias}
      -> params[enc_blockK][conv_block][conv_layerJ][conv][{kernel,bias}]
  ...conv_layerJ.norm_op.{weight,bias}      -> [norm][{scale,bias}]
  ...conv_layerJ.norm_op.running_{mean,var} -> batch_stats[...][norm][{mean,var}]
  dec_blockK.up_samp.weight (trans-conv)    -> [up_samp][kernel]
  final_conv.{weight,bias}                  -> [final_conv][{kernel,bias}]

AuxPath (reference aux_path_memory.py uses torch Sequential indices):
  aux_path.layer_bottleneck.1.* -> aux_path/conv_bottleneck
  aux_path.layer_bottleneck.2.* -> aux_path/norm_bottleneck
  aux_path.fc_cls.1.weight      -> aux_path/fc_cls
  aux_path.memory_bank (C, D, 1, 1) -> memory bank array (C, D)

Weight layout: torch conv (out, in, kh, kw) -> flax (kh, kw, in, out);
torch transposed-conv (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _conv_w(t):
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _trans_conv_w(t):
    # torch ConvTranspose2d weight: (in, out, kh, kw); flax ConvTranspose
    # with transpose_kernel=True expects (kh, kw, out, in) and flips the
    # spatial dims internally (torch gradient-of-conv semantics).
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _set(tree: Dict, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_state_dict(state_dict) -> Tuple[Dict, Dict, Optional[np.ndarray]]:
    """Convert a reference state_dict to (params, batch_stats, memory_bank).

    Accepts bare-UNet dicts and siamese dicts (``backbone.*``/``aux_path.*``
    keys); siamese results are rooted accordingly
    (params['backbone'][...], like PacingPseudoModel).
    """
    params: Dict = {}
    stats: Dict = {}
    bank = None

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    for key, val in state_dict.items():
        t = to_np(val)
        parts = key.split(".")

        root: Tuple[str, ...] = ()
        if parts[0] in ("backbone", "aux_path"):
            root = (parts[0],)
            parts = parts[1:]

        if root == ("aux_path",):
            if parts[0] == "memory_bank":
                bank = t[:, :, 0, 0]
                continue
            if parts[0] == "layer_bottleneck" and parts[1] == "1":
                mod = ("aux_path", "conv_bottleneck")
                leaf = {"weight": "kernel", "bias": "bias"}[parts[2]]
                _set(params, mod + (leaf,),
                     _conv_w(t) if leaf == "kernel" else t)
                continue
            if parts[0] == "layer_bottleneck" and parts[1] == "2":
                mod = ("aux_path", "norm_bottleneck")
                if parts[2] in ("weight", "bias"):
                    _set(params, mod + ({"weight": "scale", "bias": "bias"}[parts[2]],), t)
                elif parts[2] == "running_mean":
                    _set(stats, mod + ("mean",), t)
                elif parts[2] == "running_var":
                    _set(stats, mod + ("var",), t)
                continue
            if parts[0] == "fc_cls" and parts[1] == "1":
                _set(params, ("aux_path", "fc_cls", "kernel"), _conv_w(t))
                continue
            if parts[-1] == "num_batches_tracked":
                continue
            raise KeyError(f"Unmapped aux_path key: {key}")

        # Backbone / bare UNet keys.
        if parts[-1] == "num_batches_tracked":
            continue
        mod = root + tuple(parts[:-1])
        leaf = parts[-1]
        # replace torch's norm_op/conv module names with ours
        mod = tuple("norm" if m == "norm_op" else m for m in mod)
        if leaf == "weight" and mod[-1] == "norm":
            _set(params, mod + ("scale",), t)
        elif leaf == "bias" and mod[-1] == "norm":
            _set(params, mod + ("bias",), t)
        elif leaf == "running_mean":
            _set(stats, mod + ("mean",), t)
        elif leaf == "running_var":
            _set(stats, mod + ("var",), t)
        elif leaf == "weight" and mod[-1] == "up_samp":
            _set(params, mod + ("kernel",), _trans_conv_w(t))
        elif leaf == "weight":
            _set(params, mod + ("kernel",), _conv_w(t))
        elif leaf == "bias":
            _set(params, mod + ("bias",), t)
        else:
            raise KeyError(f"Unmapped key: {key}")

    return params, stats, bank


def load_torch_checkpoint(path: str):
    """Load a reference ``.pth`` checkpoint file and convert it."""
    import torch

    state_dict = torch.load(path, map_location="cpu")
    return convert_state_dict(state_dict)


# ---------------------------------------------------------------------------
# Export (the exact inverse): flax trees -> reference state_dict
# ---------------------------------------------------------------------------

def _inv_conv_w(t):
    return np.transpose(np.asarray(t, np.float32), (3, 2, 0, 1))


def _module_name(mod: Tuple[str, ...]) -> str:
    """Dotted reference module name for one of our param-tree module paths."""
    if mod and mod[0] == "aux_path":
        sub = {"conv_bottleneck": "layer_bottleneck.1",
               "norm_bottleneck": "layer_bottleneck.2",
               "fc_cls": "fc_cls.1"}[mod[1]]
        return "aux_path." + sub
    return ".".join("norm_op" if m == "norm" else m for m in mod)


def export_state_dict(params: Dict, batch_stats: Dict,
                      memory_bank: Optional[np.ndarray] = None) -> Dict:
    """Inverse of :func:`convert_state_dict`: build a reference-compatible
    ``state_dict`` (numpy values) from flax params/batch_stats (+ bank).

    The result loads into the reference modules with ``strict=True``
    (``num_batches_tracked`` buffers are emitted as int64 zeros for every
    BatchNorm).  Weight layouts are transposed back (flax (kh, kw, in, out)
    -> torch (out, in, kh, kw); ConvTranspose inverse likewise).  Pass
    ``params['backbone']``-rooted trees for siamese checkpoints — key
    prefixes mirror ``ConsistencyRegulr.state_dict()`` exactly.
    """
    out: Dict[str, np.ndarray] = {}

    def walk(tree, mod):
        for k in sorted(tree):
            v = tree[k]
            if isinstance(v, dict):
                walk(v, mod + (k,))
                continue
            t = np.asarray(v, np.float32)
            name = _module_name(mod)
            if k == "kernel":
                out[name + ".weight"] = _inv_conv_w(t)
            elif k == "scale":
                out[name + ".weight"] = t
            elif k == "bias":
                out[name + ".bias"] = t
            else:
                raise KeyError(f"Unmapped param leaf: {mod + (k,)}")

    def walk_stats(tree, mod):
        for k in sorted(tree):
            v = tree[k]
            if isinstance(v, dict):
                walk_stats(v, mod + (k,))
                continue
            name = _module_name(mod)
            if k == "mean":
                out[name + ".running_mean"] = np.asarray(v, np.float32)
                out[name + ".num_batches_tracked"] = np.zeros((), np.int64)
            elif k == "var":
                out[name + ".running_var"] = np.asarray(v, np.float32)
            else:
                raise KeyError(f"Unmapped batch_stats leaf: {mod + (k,)}")

    walk(params, ())
    walk_stats(batch_stats, ())
    if memory_bank is not None:
        out["aux_path.memory_bank"] = np.asarray(
            memory_bank, np.float32)[:, :, None, None]
    return out


def save_torch_checkpoint(path: str, params: Dict, batch_stats: Dict,
                          memory_bank: Optional[np.ndarray] = None) -> int:
    """Write a reference-loadable ``.pth`` file; returns the key count."""
    import torch

    sd = export_state_dict(params, batch_stats, memory_bank)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    return len(sd)
