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

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from repmode_tpu.config import ModelConfig
from repmode_tpu.ops.conv3d import (
    conv3d_same,
    conv3d_same_tapmajor,
    downsample2x_conv,
    upsample2x_convt,
)
from repmode_tpu.ops.mode import ExpertKernels, expert_bank, gate_logits_to_weights
from repmode_tpu.ops.s2d import (
    depth_to_space_hw,
    downsample_s2d_domain,
    downsample_s2d_to_s2d,
    s2d_bias,
    s2d_conv_kernel,
    s2d_down_kernel,
    space_to_depth_hw,
    upsample_s2d_to_s2d,
    upsample_to_s2d,
)

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


# ----------------------------------------------------------------------
# Space-to-depth execution (ops/s2d.py): narrow-channel levels run their
# convs with 2x2 H,W phases packed into channels, filling the MXU lanes.
# Measured on v5e: level-1 conv 27.5 -> ~108 TFLOPS. Exact math, different
# layout — parity-tested against plain_forward.
# ----------------------------------------------------------------------

def default_s2d_levels(cfg: ModelConfig) -> tuple:
    """Levels whose channel width under-fills the 128 MXU lanes."""
    c = cfg.in_channels * cfg.mult_chan
    return tuple(
        i for i in range(1, cfg.depth + 1) if c * (2 ** (i - 1)) < 128
    )


def to_s2d_plain(plain: Params, cfg: ModelConfig, s2d_levels: tuple) -> Params:
    """Transform a reparameterized tree for s2d execution of given levels.

    Runs once per task at re-parameterization time; pure weight reshuffles.
    Decoder conv1 kernels are split into (skip, upsampled) input halves and
    s2d-transformed separately because the runtime concatenates two
    s2d-domain tensors (phase blocks per source, not a global s2d of the
    native concat).
    """
    out = dict(plain)
    for i in s2d_levels:
        enc = dict(plain[f"encoder_block{i}"])
        enc["conv1_w"] = s2d_conv_kernel(enc["conv1_w"])
        enc["conv1_b"] = s2d_bias(enc["conv1_b"])
        enc["conv2_w"] = s2d_conv_kernel(enc["conv2_w"])
        enc["conv2_b"] = s2d_bias(enc["conv2_b"])
        enc["down_w"] = s2d_down_kernel(enc["down_w"])
        out[f"encoder_block{i}"] = enc

        dec = dict(plain[f"decoder_block{i}"])
        w1 = dec["conv1_w"]
        half = w1.shape[3] // 2
        dec["conv1_w"] = jnp.concatenate(
            [s2d_conv_kernel(w1[:, :, :, :half]), s2d_conv_kernel(w1[:, :, :, half:])],
            axis=3,
        )
        dec["conv1_b"] = s2d_bias(dec["conv1_b"])
        dec["conv2_w"] = s2d_conv_kernel(dec["conv2_w"])
        dec["conv2_b"] = s2d_bias(dec["conv2_b"])
        out[f"decoder_block{i}"] = dec

    if 1 in s2d_levels:
        out["conv_out_w"] = s2d_conv_kernel(plain["conv_out_w"])
    return out


def plain_forward_s2d(
    plain: Params,
    x: jax.Array,
    cfg: ModelConfig,
    s2d_levels: tuple,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Run the re-parameterized net with s2d execution on `s2d_levels`.

    `plain` must come from to_s2d_plain with the same levels. Produces the
    same function as plain_forward (fp reassociation aside). The Pallas
    opt-in lives in plain_forward_s2d_pallas (cfg.eval.pallas_conv).

    The decoder stays in the s2d domain across consecutive s2d levels
    (upsample_s2d_to_s2d / upsample_to_s2d — the MXU-hostile narrow-channel
    native tensors are never materialized; measured 13 GB/s on the
    up-then-rearrange route, tools/bench_edges.py 2026-08-17).
    """
    cdt = compute_dtype
    s2d = set(s2d_levels)

    def cbr(h, w, b):
        return jax.nn.relu(conv3d_same(h, w, compute_dtype=cdt) + b)

    def run_subnet(h, blk):
        return cbr(cbr(h, blk["conv1_w"], blk["conv1_b"]), blk["conv2_w"], blk["conv2_b"])

    skips = {}
    h = x
    h_in_s2d = False
    for i in range(1, cfg.depth + 1):
        blk = plain[f"encoder_block{i}"]
        if i in s2d:
            h2 = h if h_in_s2d else space_to_depth_hw(h)
            skip2 = run_subnet(h2, blk)  # s2d-domain kernels: same conv call
            skips[i] = skip2
            if (i + 1) in s2d and os.environ.get(
                "REPMODE_EVAL_DOWNS2D", "1"
            ) == "1":
                # the next level is s2d too: emit its s2d domain straight
                # from the downsample matmul (full 4Co lanes, no
                # half-lane native write + no s2d rearrange pass);
                # REPMODE_EVAL_DOWNS2D=0 is the A/B escape
                h = jax.nn.relu(
                    downsample_s2d_to_s2d(
                        skip2, blk["down_w"], compute_dtype=cdt
                    )
                    + s2d_bias(blk["down_b"])
                )
                h_in_s2d = True
            else:
                h = jax.nn.relu(
                    downsample_s2d_domain(
                        skip2, blk["down_w"], compute_dtype=cdt
                    )
                    + blk["down_b"]
                )
                h_in_s2d = False
        else:
            skip = run_subnet(h, blk)
            skips[i] = skip
            h = jax.nn.relu(
                downsample2x_conv(skip, blk["down_w"], compute_dtype=cdt)
                + blk["down_b"]
            )
            h_in_s2d = False

    h = run_subnet(h, plain["bottle_block"])

    h_is_s2d = False
    for i in range(cfg.depth, 0, -1):
        blk = plain[f"decoder_block{i}"]
        if i in s2d:
            # upsample straight into the s2d domain — the narrow-channel
            # full-resolution native tensor is never materialized
            up_fn = upsample_s2d_to_s2d if h_is_s2d else upsample_to_s2d
            up2 = jax.nn.relu(
                up_fn(h, blk["up_w"], compute_dtype=cdt)
                + s2d_bias(blk["up_b"])
            )
            if os.environ.get("REPMODE_EVAL_SPLITCAT", "1") == "1":
                # conv(cat(a,b), W) == conv(a, W[:ca]) + conv(b, W[ca:]):
                # skip materializing the 2x-lane concat; conv1 reads each
                # half in place and the add fuses into the epilogue.
                # Measured 14.87 -> 15.22 Mvox/s on the full headline
                # (2026-08-20); REPMODE_EVAL_SPLITCAT=0 is the A/B escape.
                ca = skips[i].shape[-1]
                w1 = blk["conv1_w"]
                y1 = jax.nn.relu(
                    conv3d_same(skips[i], w1[:, :, :, :ca],
                                compute_dtype=cdt)
                    + conv3d_same(up2, w1[:, :, :, ca:],
                                  compute_dtype=cdt)
                    + blk["conv1_b"]
                )
                h = cbr(y1, blk["conv2_w"], blk["conv2_b"])
            else:
                cat = jnp.concatenate([skips[i], up2], axis=-1)
                h = run_subnet(cat, blk)
            h_is_s2d = True
        else:
            if h_is_s2d:  # contiguous-from-1 levels make this unreachable,
                h = depth_to_space_hw(h)  # but keep the contract general
                h_is_s2d = False
            up = jax.nn.relu(
                upsample2x_convt(h, blk["up_w"], compute_dtype=cdt)
                + blk["up_b"]
            )
            h = run_subnet(jnp.concatenate([skips[i], up], axis=-1), blk)

    if 1 in s2d:
        # co=4: tap-major factorization sidesteps the lane-starved conv
        # (15.7 -> 14.2 ms/batch measured, tools/bench_edges.py 2026-08-17)
        y2 = conv3d_same_tapmajor(
            h, plain["conv_out_w"], compute_dtype=cdt
        )
        return depth_to_space_hw(y2)
    return conv3d_same(h, plain["conv_out_w"], compute_dtype=cdt)


def pallas_geometry_ok(cfg: ModelConfig) -> bool:
    """Whether the dpad Pallas chain supports this model geometry.

    pallas_conv3d_dpad assumes 3x3 H/W taps (native kernel_size=5 after the
    s2d transform; the hard-coded pd=(k-1)//2=2 depth halo and the decoder's
    1-pixel H/W pads encode the same fact) and lane-filling %128 s2d
    channels (4*mult_chan at the shallowest s2d level). Anything else must
    fall back to plain_forward_s2d rather than hit bare asserts deep in the
    kernel (round-2 advisor finding).
    """
    return cfg.kernel_size == 5 and cfg.mult_chan % 32 == 0


def plain_forward_s2d_pallas(
    plain: Params,
    x: jax.Array,
    cfg: ModelConfig,
    s2d_levels: tuple,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """plain_forward_s2d with the s2d levels' convs as Pallas padded chains.

    Same function as plain_forward_s2d (bf16 rounding aside — verified
    bit-exact vs the XLA path on chip), different execution: within an s2d
    level the activations stay DEPTH-PADDED in HBM and each conv is one
    pallas_conv3d_dpad call (fused bias+ReLU, bf16 out, in-kernel H/W
    halos), so chained convs pay zero jnp.pad/slice passes — the downsample
    trims the halo via negative conv padding, the decoder's upsample output
    is padded once before the concat. Non-s2d levels and the narrow edge
    convs (encoder1 conv1 ci=4, conv_out co=1) stay on XLA.
    """
    from jax import lax

    from repmode_tpu.ops.conv3d import DIMNUMS
    from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_dpad

    cdt = compute_dtype or jnp.bfloat16
    s2d = set(s2d_levels)
    pd = (cfg.kernel_size - 1) // 2

    def pad_d(h2):
        return jnp.pad(
            h2.astype(cdt), ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0))
        )

    def pallas_ok(w):
        return (w.shape[1] == 3 and w.shape[2] == 3
                and w.shape[3] % 128 == 0 and w.shape[4] % 128 == 0)

    def cbr_xla(h2, w, b):
        return jax.nn.relu(conv3d_same(h2, w, compute_dtype=cdt) + b)

    def chain_from_padded(xp, blk):
        """s2d-domain double conv; PADDED-D input -> PADDED-D bf16 output."""
        y1p = pallas_conv3d_dpad(
            xp, blk["conv1_w"], blk["conv1_b"], relu=True, compute_dtype=cdt,
        )
        return pallas_conv3d_dpad(
            y1p, blk["conv2_w"], blk["conv2_b"], relu=True, compute_dtype=cdt,
        )

    def chain_from_native(h2, blk):
        """s2d-domain double conv; native-D input -> PADDED-D bf16 output."""
        if pallas_ok(blk["conv1_w"]):
            return chain_from_padded(pad_d(h2), blk)
        # encoder1 conv1 (ci=4): XLA, then enter the padded domain
        y1p = pad_d(cbr_xla(h2, blk["conv1_w"], blk["conv1_b"]))
        return pallas_conv3d_dpad(
            y1p, blk["conv2_w"], blk["conv2_b"], relu=True, compute_dtype=cdt,
        )

    skips = {}
    h = x
    for i in range(1, cfg.depth + 1):
        blk = plain[f"encoder_block{i}"]
        if i in s2d:
            skip_p = chain_from_native(space_to_depth_hw(h), blk)
            skips[i] = skip_p  # stored padded: the decoder concat reuses it
            h = jax.nn.relu(
                downsample_s2d_domain(
                    skip_p, blk["down_w"], compute_dtype=cdt, trim_d_halo=pd
                )
                + blk["down_b"]
            )
        else:
            skip = jax.nn.relu(
                conv3d_same(
                    jax.nn.relu(
                        conv3d_same(h, blk["conv1_w"], compute_dtype=cdt)
                        + blk["conv1_b"]
                    ),
                    blk["conv2_w"], compute_dtype=cdt,
                )
                + blk["conv2_b"]
            )
            skips[i] = skip
            h = jax.nn.relu(
                downsample2x_conv(skip, blk["down_w"], compute_dtype=cdt)
                + blk["down_b"]
            )

    blk = plain["bottle_block"]
    h = cbr_xla(cbr_xla(h, blk["conv1_w"], blk["conv1_b"]),
                blk["conv2_w"], blk["conv2_b"])

    for i in range(cfg.depth, 0, -1):
        blk = plain[f"decoder_block{i}"]
        up = jax.nn.relu(
            upsample2x_convt(h, blk["up_w"], compute_dtype=cdt) + blk["up_b"]
        )
        if i in s2d:
            cat_p = jnp.concatenate(
                [skips[i], pad_d(space_to_depth_hw(up))], axis=-1
            )
            y2p = chain_from_padded(cat_p, blk)
            if i == 1 and 1 in s2d:
                # conv_out consumes the padded tensor: its D halo is physical,
                # so 'same'-in-D == VALID over the padded rows
                y = lax.conv_general_dilated(
                    y2p.astype(cdt), plain["conv_out_w"].astype(cdt),
                    (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                    dimension_numbers=DIMNUMS,
                    preferred_element_type=jnp.float32,
                )
                return depth_to_space_hw(y)
            h = depth_to_space_hw(y2p[:, pd:-pd])
        else:
            cat = jnp.concatenate([skips[i], up], axis=-1)
            h = cbr_xla(cbr_xla(cat, blk["conv1_w"], blk["conv1_b"]),
                        blk["conv2_w"], blk["conv2_b"])

    return conv3d_same(h, plain["conv_out_w"], compute_dtype=cdt)


def make_inference(cfg) -> tuple:
    """(prepare, forward) pair consistent with cfg (incl. the s2d switch).

    prepare(variables, task_id) -> inference params (reparam [+ s2d]);
    forward(plain, x) -> prediction. Used by the eval loop and benchmarks.
    `cfg` is the top-level Config.
    """
    import functools

    if cfg.model.name != "RepMode":
        # non-MoDE models (e.g. the UNet baseline) have nothing to merge:
        # inference params are the variables; forward is the eval-mode net.
        from repmode_tpu.models import build_model

        net = build_model(cfg)

        def prepare_plain(variables, task_id):
            del task_id
            return variables

        def forward_plain(variables, x):
            return net.apply(
                variables, x, jnp.zeros((x.shape[0],), jnp.int32), train=False
            )

        return prepare_plain, forward_plain

    levels = default_s2d_levels(cfg.model) if cfg.eval.s2d else ()
    cdt = (
        None
        if cfg.train.compute_dtype == "float32"
        else jnp.dtype(cfg.train.compute_dtype)
    )
    num_tasks = cfg.num_tasks

    def prepare(variables, task_id):
        p = reparameterize(variables, cfg.model, num_tasks, task_id)
        return to_s2d_plain(p, cfg.model, levels) if levels else p

    use_pallas = levels and cfg.eval.pallas_conv
    if use_pallas and not pallas_geometry_ok(cfg.model):
        import logging

        logging.getLogger("repmode_tpu").warning(
            "eval.pallas_conv=True but the model geometry (kernel_size=%d, "
            "mult_chan=%d) is outside the dpad kernel's support (needs "
            "kernel_size=5 -> 3x3 s2d taps, mult_chan %% 32 == 0 -> %%128 "
            "s2d channels) — falling back to the XLA s2d path",
            cfg.model.kernel_size, cfg.model.mult_chan,
        )
        use_pallas = False
    if use_pallas:
        forward = functools.partial(
            plain_forward_s2d_pallas, cfg=cfg.model, s2d_levels=levels,
            compute_dtype=cdt,
        )
    elif levels:
        forward = functools.partial(
            plain_forward_s2d, cfg=cfg.model, s2d_levels=levels,
            compute_dtype=cdt,
        )
    else:
        forward = functools.partial(plain_forward, cfg=cfg.model, compute_dtype=cdt)
    return prepare, forward


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
