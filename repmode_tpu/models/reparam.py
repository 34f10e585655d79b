"""Whole-network structural re-parameterization for inference.

The reference merges experts into one kernel per MoDEConv *per forward call*
(RepMode.py:171-192, re-done for every patch batch at eval, RepMode.py:210).
Since the gate input is a one-hot task embedding, there are exactly
`num_tasks` distinct merged kernels per conv — so we merge ONCE per task for
the whole network, and additionally fold eval-mode BatchNorm (an affine map)
into the conv weights and a bias (RepVGG-style):

    BN(conv(x, w)) = conv(x, w * s) + (beta - mu * s),  s = gamma / sqrt(var + eps)

The result is a plain {conv+bias+ReLU, downsample, upsample, concat} network —
zero gate/merge/norm overhead per patch during sliding-window inference. This
is the TPU-native realization of what "Rep" in RepMode stands for.

`plain_forward` is the jittable inference net; `reparameterize` produces its
parameter pytree from trained flax variables for a given task id.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from repmode_tpu.config import ModelConfig
from repmode_tpu.ops.conv3d import (
    conv3d_same,
    downsample2x_conv,
    upsample2x_convt,
)
from repmode_tpu.ops.mode import ExpertKernels, expert_bank, gate_logits_to_weights

Params = Dict[str, Any]


def merged_kernel_for_task(
    conv_params: Params, task_onehot: jax.Array, num_experts: int, kernel_size: int = 5
) -> jax.Array:
    """Merge one MoDEConv's experts for a single task -> (k,k,k,Ci,Co)."""
    logits = task_onehot.astype(jnp.float32) @ conv_params["gate_kernel"] + conv_params["gate_bias"]
    co = conv_params["w5"].shape[-1]
    g = gate_logits_to_weights(logits[None], num_experts, co)[0]  # (E, Co)
    ek = ExpertKernels(
        conv_params["w5"], conv_params["w3"], conv_params["w1"],
        conv_params["wa3"], conv_params["wa5"],
    )
    bank = expert_bank(ek, kernel_size)  # (E,k,k,k,Ci,Co)
    return jnp.einsum("eo,edhwio->dhwio", g, bank)


def fold_bn(w: jax.Array, bn_params: Params, bn_stats: Params, eps: float):
    """Fold eval-mode BN into (w, bias). w: (..., Co) kernel, stats: (Co,)."""
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    w_f = w * s  # broadcast over trailing Co axis
    b_f = bn_params["bias"] - bn_stats["mean"] * s
    return w_f, b_f


def reparameterize(
    variables: Params,
    cfg: ModelConfig,
    num_tasks: int,
    task_id: int,
) -> Params:
    """Trained flax variables -> plain inference params for one task.

    Returns a pytree:
      encoder_block{i}: conv1_w/b, conv2_w/b, down_w/b
      bottle_block:     conv1_w/b, conv2_w/b
      decoder_block{i}: up_w/b, conv1_w/b, conv2_w/b
      conv_out_w        (no bias — final MoDEConv has no BN, RepMode.py:150-151)
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    onehot = jax.nn.one_hot(jnp.asarray(task_id), num_tasks, dtype=jnp.float32)
    e, ks, eps = cfg.num_experts, cfg.kernel_size, cfg.bn_eps

    def mode_folded(p, s):
        """MoDEConv ('normal') -> folded (w, b)."""
        w = merged_kernel_for_task(p, onehot, e, ks)
        return fold_bn(w, p["bn"], s["bn"], eps)

    def subnet(p, s):
        w1, b1 = mode_folded(p["conv1"], s["conv1"])
        w2, b2 = mode_folded(p["conv2"], s["conv2"])
        return {"conv1_w": w1, "conv1_b": b1, "conv2_w": w2, "conv2_b": b2}

    out: Params = {}
    for name, p in params.items():
        s = stats.get(name, {})
        if name.startswith("encoder_block"):
            blk = subnet(p["conv_more"], s["conv_more"])
            dw, db = fold_bn(p["down_w"], p["down_bn"], s["down_bn"], eps)
            blk["down_w"], blk["down_b"] = dw, db
            out[name] = blk
        elif name == "bottle_block":
            out[name] = subnet(p, s)
        elif name.startswith("decoder_block"):
            blk = subnet(p["conv_less"], s["conv_less"])
            uw, ub = fold_bn(p["up_w"], p["up_bn"], s["up_bn"], eps)
            blk["up_w"], blk["up_b"] = uw, ub
            out[name] = blk
        elif name == "conv_out":
            out["conv_out_w"] = merged_kernel_for_task(p, onehot, e, ks)
        else:
            raise KeyError(f"unexpected top-level module {name!r}")
    return out


def reparameterize_all_tasks(
    variables: Params, cfg: ModelConfig, num_tasks: int
) -> Params:
    """Stack per-task plain params along a leading task axis (for vmap/scan)."""
    trees = [reparameterize(variables, cfg, num_tasks, t) for t in range(num_tasks)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def plain_forward(
    plain: Params,
    x: jax.Array,
    cfg: ModelConfig,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Run the re-parameterized network. x: (N,D,H,W,Cin) -> (N,D,H,W,Cout).

    Pure conv+bias+ReLU / resample / concat — the deploy-mode network.
    """
    cdt = compute_dtype

    def cbr(h, w, b):  # conv + bias + relu
        y = conv3d_same(h, w, compute_dtype=cdt)
        return jax.nn.relu(y + b)

    def run_subnet(h, blk):
        h = cbr(h, blk["conv1_w"], blk["conv1_b"])
        h = cbr(h, blk["conv2_w"], blk["conv2_b"])
        return h

    skips = []
    h = x
    for i in range(1, cfg.depth + 1):
        blk = plain[f"encoder_block{i}"]
        skip = run_subnet(h, blk)
        skips.append(skip)
        h = jax.nn.relu(
            downsample2x_conv(skip, blk["down_w"], compute_dtype=cdt) + blk["down_b"]
        )

    h = run_subnet(h, plain["bottle_block"])

    for i in range(cfg.depth, 0, -1):
        blk = plain[f"decoder_block{i}"]
        h = jax.nn.relu(
            upsample2x_convt(h, blk["up_w"], compute_dtype=cdt) + blk["up_b"]
        )
        h = jnp.concatenate([skips[i - 1], h], axis=-1)
        h = run_subnet(h, blk)

    return conv3d_same(h, plain["conv_out_w"], compute_dtype=cdt)
