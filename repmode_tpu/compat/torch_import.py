"""Import reference (PyTorch) RepMode weights into repmode_tpu.

Lets users of the reference bring their trained checkpoints
(fnet/fnet_model.py:57-65 'nn_state' state_dict, or a bare state_dict /
name->ndarray mapping) to this framework. Layout mapping:

  torch conv3d weight  (Co, Ci, D, H, W)   -> DHWIO (D, H, W, Ci, Co)
  torch convT3d weight (Ci, Co, D, H, W)   -> DHWIO (D, H, W, Ci, Co)
  torch Linear weight  (Out, In)           -> kernel (In, Out)

Module-name mapping mirrors the reference Net attribute names
(RepMode.py:26-42, 74-108, 136-153): e.g.
  encoder_block1.conv_more.conv1.expert_conv5x5_conv -> encoder_block1/conv_more/conv1/w5
  ...conv1.subsequent_layer.0.{weight,bias}          -> .../conv1/bn/{scale,bias}  (+ batch_stats)
  encoder_block1.conv_down.0.weight                  -> encoder_block1/down_w
  decoder_block1.convt.0.weight                      -> decoder_block1/up_w

No torch import is required: pass any mapping of name -> numpy array.
`load_torch_state_dict` handles torch tensors if torch is installed.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

_EXPERT_MAP = {
    "expert_conv5x5_conv": "w5",
    "expert_conv3x3_conv": "w3",
    "expert_conv1x1_conv": "w1",
    "expert_avg3x3_conv": "wa3",
    "expert_avg5x5_conv": "wa5",
}


def _conv_w(a: np.ndarray) -> np.ndarray:
    """(Co,Ci,D,H,W) -> (D,H,W,Ci,Co)."""
    return np.ascontiguousarray(np.transpose(a, (2, 3, 4, 1, 0)))


def _convt_w(a: np.ndarray) -> np.ndarray:
    """(Ci,Co,D,H,W) -> (D,H,W,Ci,Co)."""
    return np.ascontiguousarray(np.transpose(a, (2, 3, 4, 0, 1)))


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    a = np.asarray(v)
    if a.dtype == np.float16:  # AMP-trained checkpoints: widen
        return a.astype(np.float32)
    if a.dtype not in (np.float32, np.float64):
        return a.astype(np.float32)
    return a  # preserve fp32/fp64 (fp64 goldens drive tight parity checks)


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state_dict -> {'params': ..., 'batch_stats': ...} flax variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for name, raw in state.items():
        a = _to_np(raw)
        parts = name.split(".")
        top = parts[0]

        # normalize the sub-path to (module_path..., leaf torch name)
        if top.startswith("encoder_block") and parts[1] == "conv_down":
            # conv_down.0.weight | conv_down.1.{weight,bias,running_mean,running_var,num_batches_tracked}
            idx, leaf = parts[2], parts[3]
            if idx == "0" and leaf == "weight":
                _set(params, (top, "down_w"), _conv_w(a))
            elif idx == "1":
                _route_bn(params, stats, (top, "down_bn"), leaf, a)
            continue
        if top.startswith("decoder_block") and parts[1] == "convt":
            idx, leaf = parts[2], parts[3]
            if idx == "0" and leaf == "weight":
                _set(params, (top, "up_w"), _convt_w(a))
            elif idx == "1":
                _route_bn(params, stats, (top, "up_bn"), leaf, a)
            continue

        # MoDEConv leaves: <path...>.<conv_j>.<leaf...>
        if top == "conv_out":
            mod_path = ("conv_out",)
            rest = parts[1:]
        elif top == "bottle_block":
            mod_path = ("bottle_block", parts[1])  # conv1 | conv2
            rest = parts[2:]
        elif top.startswith("encoder_block"):
            mod_path = (top, "conv_more", parts[2])
            rest = parts[3:]
        elif top.startswith("decoder_block"):
            mod_path = (top, "conv_less", parts[2])
            rest = parts[3:]
        else:
            raise KeyError(f"unrecognized state_dict entry: {name}")

        leaf = rest[0]
        if leaf in _EXPERT_MAP:
            _set(params, mod_path + (_EXPERT_MAP[leaf],), _conv_w(a))
        elif leaf in ("expert_avg3x3_pool", "expert_avg5x5_pool"):
            pass  # fixed buffers, reconstructed as constants (ops/mode.py)
        elif leaf == "gate":
            if rest[1] == "weight":
                _set(params, mod_path + ("gate_kernel",), np.ascontiguousarray(a.T))
            else:
                _set(params, mod_path + ("gate_bias",), a)
        elif leaf == "subsequent_layer":
            _route_bn(params, stats, mod_path + ("bn",), rest[2], a)
        else:
            raise KeyError(f"unrecognized leaf in {name}")

    return {"params": params, "batch_stats": stats}


def _route_bn(params, stats, bn_path, leaf, a):
    if leaf == "weight":
        _set(params, bn_path, dict(params_get(params, bn_path), scale=a))
    elif leaf == "bias":
        _set(params, bn_path, dict(params_get(params, bn_path), bias=a))
    elif leaf == "running_mean":
        _set(stats, bn_path, dict(params_get(stats, bn_path), mean=a))
    elif leaf == "running_var":
        _set(stats, bn_path, dict(params_get(stats, bn_path), var=a))
    elif leaf == "num_batches_tracked":
        pass
    else:
        raise KeyError(f"unknown BN leaf {leaf}")


def params_get(tree, path):
    node = tree
    for p in path:
        node = node.get(p, {}) if isinstance(node, dict) else {}
    return node if isinstance(node, dict) else {}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference `.p` checkpoint (fnet_model.py:75-82) into flax variables.

    Returns {'variables': ..., 'count_iter': int, 'count_epoch': int,
    'adopted_datasets': list or None}.
    """
    import torch  # local import: torch is only needed for this entry point

    state = torch.load(path, map_location="cpu", weights_only=False)
    if "nn_state" in state:
        variables = convert_state_dict(state["nn_state"])
        opts = state.get("opts")
        return {
            "variables": variables,
            "count_iter": state.get("count_iter", 0),
            "count_epoch": state.get("count_epoch", 0),
            "adopted_datasets": sorted(getattr(opts, "adopted_datasets", []) or []) or None,
        }
    return {
        "variables": convert_state_dict(state),
        "count_iter": 0,
        "count_epoch": 0,
        "adopted_datasets": None,
    }
