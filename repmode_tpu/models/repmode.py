"""The RepMode MoDE U-Net, TPU-native.

Topology matches the reference exactly (fnet/nn_modules/RepMode.py:26-42):
4 MoDE encoder blocks (1 -> 32 -> 64 -> 128 -> 256 channels, mult_chan=32),
a 256 -> 512 bottleneck of two MoDE convs, 4 MoDE decoder blocks back to 32,
and a final gate-only MoDEConv 32 -> 1 with no BN/ReLU.

Differences are all representation/execution, not math:
  * activations are NDHWC (channels-last on the TPU lane axis),
  * MoDE convs run as 5 shared-kernel batch convs + gated combine
    (ops/mode.py expert_sum; exactly equal to the reference's per-sample
    merged kernels by linearity of convolution),
  * the k=2,s=2 down/upsample convs are exact reshape+einsum matmuls,
  * BatchNorm reproduces torch BatchNorm3d semantics (ops/norm.py),
  * weight init reproduces torch's kaiming_uniform(a=sqrt(5)) bounds.

Parameter names mirror the reference modules (encoder_block1..4, bottle_block,
decoder_block4..1, conv_out; expert kernels w5/w3/w1/wa3/wa5; gate) so torch
checkpoints map 1:1 (compat/torch_import.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from repmode_tpu.config import ModelConfig
from repmode_tpu.ops.conv3d import downsample2x_conv, upsample2x_convt
from repmode_tpu.ops.mode import (
    ExpertKernels,
    gate_logits_to_weights,
    mode_conv_expert_sum,
    mode_conv_expert_sum_s2d_domain,
    mode_conv_merged,
    mode_conv_merged_s2d_domain,
    mode_conv_merged_s2d_pallas,
    mode_conv_tapmajor_merged_s2d,
)
from repmode_tpu.ops.norm import batch_norm_apply, batch_norm_train
from repmode_tpu.ops.s2d import (
    depth_to_space_hw,
    downsample_s2d_domain,
    downsample_s2d_to_s2d,
    s2d_down_kernel,
    space_to_depth_hw,
    upsample_s2d_to_s2d,
    upsample_to_s2d,
)


def torch_uniform_init(fan_in: int):
    """torch kaiming_uniform_(a=sqrt(5)): U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    gain = sqrt(2/(1+5)) = 1/sqrt(3); bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in).
    Matches reference gen_conv_kernel (RepMode.py:156-159) and torch's default
    Conv3d / Linear init.
    """
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class BatchNorm3d(nn.Module):
    """torch-semantics BatchNorm over (N, D, H, W) with running stats.

    phases=4 normalizes an s2d-domain tensor (N,D,h',w',4C): statistics and
    affine parameters are per *native* channel, aggregated across the 4 H,W
    phases — numerically identical to native BN up to reduction order.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    phases: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        shape = x.shape
        if self.phases > 1:
            # bitcast view (..., phases, C): stats reduce over everything but
            # the native channel axis — no transpose/copy materialized.
            x = x.reshape(*shape[:-1], self.phases, self.features)
        axes = tuple(range(x.ndim - 1))
        if train:
            y, new_mean, new_var = batch_norm_train(
                x, ra_mean.value, ra_var.value, scale, bias,
                momentum=self.momentum, eps=self.eps, axes=axes,
            )
            if not self.is_initializing():
                ra_mean.value = new_mean
                ra_var.value = new_var
        else:
            y = batch_norm_apply(
                x, ra_mean.value, ra_var.value, scale, bias, self.eps
            )
        if self.phases > 1:
            y = y.reshape(shape)
        return y


class MoDEConv(nn.Module):
    """One MoDE conv unit (reference MoDEConv, RepMode.py:123-214)."""

    num_experts: int
    num_tasks: int
    in_chan: int
    out_chan: int
    kernel_size: int = 5
    conv_type: str = "normal"  # 'normal' = +BN+ReLU, 'final' = identity
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    compute_dtype: Optional[jnp.dtype] = None
    train_impl: str = "expert_sum"
    # 's2d': input/output are s2d-domain tensors (N,D,h',w',4C) and every op
    # (expert convs, pools, BN) runs in that domain (ops/mode.py s2d path).
    domain: str = "native"
    # native channel widths of concatenated s2d input segments (decoder
    # concat of skip + upsampled); () = single segment.
    input_channel_sizes: tuple = ()
    # jax.checkpoint the expert-conv math (recompute in backward)
    remat: bool = False

    def setup(self):
        ci, co, e = self.in_chan, self.out_chan, self.num_experts
        self.w5 = self.param("w5", torch_uniform_init(ci * 125), (5, 5, 5, ci, co))
        self.w3 = self.param("w3", torch_uniform_init(ci * 27), (3, 3, 3, ci, co))
        self.w1 = self.param("w1", torch_uniform_init(ci), (1, 1, 1, ci, co))
        self.wa3 = self.param("wa3", torch_uniform_init(ci), (1, 1, 1, ci, co))
        self.wa5 = self.param("wa5", torch_uniform_init(ci), (1, 1, 1, ci, co))
        self.gate_kernel = self.param(
            "gate_kernel", torch_uniform_init(self.num_tasks), (self.num_tasks, e * co)
        )
        self.gate_bias = self.param(
            "gate_bias", torch_uniform_init(self.num_tasks), (e * co,)
        )
        if self.conv_type == "normal":
            self.bn = BatchNorm3d(
                co, momentum=self.bn_momentum, eps=self.bn_eps,
                phases=4 if self.domain == "s2d" else 1,
            )
        elif self.conv_type != "final":
            raise ValueError(f"conv_type must be 'normal' or 'final', got {self.conv_type}")

    def gate(self, task_emb: jax.Array) -> jax.Array:
        """(N, T) one-hot -> (N, E, Co) softmaxed gate weights (fp32)."""
        logits = task_emb.astype(jnp.float32) @ self.gate_kernel + self.gate_bias
        return gate_logits_to_weights(logits, self.num_experts, self.out_chan)

    def experts(self) -> ExpertKernels:
        return ExpertKernels(self.w5, self.w3, self.w1, self.wa3, self.wa5)

    def __call__(self, x: jax.Array, task_emb: jax.Array, *, train: bool) -> jax.Array:
        g = self.gate(task_emb)
        ek = self.experts()
        impl = self.train_impl
        if impl == "auto":
            # Pallas kernels need the real TPU backend; CPU (tests, the
            # driver's virtual-mesh dryrun) takes the exact expert sum.
            # Multi-device data-parallel meshes keep the merged kernels:
            # every stage of merged_conv_persample carries a batch-parallel
            # GSPMD/Shardy rule (ops/mode.py _wrap_batch_parallel), so each
            # chip runs the Pallas kernel on its local batch shard
            # (tests/test_pallas_kernels.py pjit-mesh test: no collectives).
            # Hardware validation status: single-chip Mosaic lowering is
            # validated on a real TPU (tools/smoke_tpu_merged.py — values
            # and grads vs the exact expert sum); the multi-chip
            # Mosaic-under-GSPMD composition is validated only on the
            # virtual CPU mesh (no multi-chip hardware in this environment).
            # The rule also assumes BATCH-dim data parallelism: on meshes
            # that shard activations spatially or by channel it forces
            # replication at every MoDE conv. Escape hatch for both:
            # --train_impl expert_sum (cli/args.py) keeps the exact
            # XLA-only path. See ARCHITECTURE.md §5.
            impl = (
                "merged_pallas"
                if jax.default_backend() == "tpu"
                else "expert_sum"
            )
        if self.domain == "s2d":
            if self.out_chan <= 4:
                # lane-starved output (4*Co <= 16 of 128 lanes): per-sample
                # merged tap-major GEMM instead of five padded convs
                # (conv_out; measured ~3x, tools/bench_bwd.py 2026-08-17)
                s2d_op = mode_conv_tapmajor_merged_s2d
            elif impl == "merged":
                s2d_op = mode_conv_merged_s2d_domain
            elif impl == "merged_pallas":
                s2d_op = mode_conv_merged_s2d_pallas
            else:
                s2d_op = mode_conv_expert_sum_s2d_domain
            op = functools.partial(
                s2d_op,
                compute_dtype=self.compute_dtype,
                channel_sizes=self.input_channel_sizes or None,
            )
        elif impl == "merged":
            op = functools.partial(
                mode_conv_merged,
                kernel_size=self.kernel_size,
                compute_dtype=self.compute_dtype,
            )
        else:
            # native domain (deep levels): expert sum — incl. under 'auto'/
            # 'merged_pallas' (the deep levels are latency-trivial,
            # ARCHITECTURE.md §11; no native-domain Pallas path needed)
            op = functools.partial(
                mode_conv_expert_sum, compute_dtype=self.compute_dtype
            )
        if self.remat:
            op = jax.checkpoint(op)
        y = op(x, ek, g)
        if self.conv_type == "normal":
            y = self.bn(y, train=train)
            y = nn.relu(y)
        if self.compute_dtype is not None:
            # AMP-equivalent residual policy: downstream consumers cast to
            # bf16 anyway; storing the activation in bf16 halves the
            # backward-pass footprint (torch autocast keeps fp16 tensors).
            y = y.astype(self.compute_dtype)
        return y


class MoDESubNet2Conv(nn.Module):
    """Two stacked k=5 MoDE convs (reference MoDESubNet2Conv, RepMode.py:111-120).

    When s2d is set, input/output are s2d-domain tensors and both convs run
    in-domain; input_channel_sizes describes a concatenated s2d input
    (decoder skip + upsampled)."""

    num_experts: int
    num_tasks: int
    n_in: int
    n_out: int
    cfg: ModelConfig
    compute_dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    input_channel_sizes: tuple = ()

    @nn.compact
    def __call__(self, x, task_emb, *, train: bool):
        common = dict(
            num_experts=self.num_experts,
            num_tasks=self.num_tasks,
            kernel_size=self.cfg.kernel_size,
            bn_momentum=self.cfg.bn_momentum,
            bn_eps=self.cfg.bn_eps,
            compute_dtype=self.compute_dtype,
            train_impl=self.cfg.train_impl,
            domain="s2d" if self.s2d else "native",
            remat=self.cfg.remat,
        )
        x = MoDEConv(
            in_chan=self.n_in, out_chan=self.n_out, name="conv1",
            input_channel_sizes=tuple(self.input_channel_sizes), **common,
        )(x, task_emb, train=train)
        x = MoDEConv(in_chan=self.n_out, out_chan=self.n_out, name="conv2", **common)(
            x, task_emb, train=train
        )
        return x


class MoDEEncoderBlock(nn.Module):
    """MoDE double conv -> skip, then strided conv+BN+ReLU downsample
    (reference MoDEEncoderBlock, RepMode.py:74-89).

    s2d levels convert once at block entry; the skip is RETURNED IN THE s2d
    DOMAIN (the matching decoder consumes it there) and the downsample runs
    as a (2,1,1)-over-phase-block conv producing the next level's native
    tensor directly — the full-resolution narrow-channel tensor is never
    materialized."""

    num_experts: int
    num_tasks: int
    in_chan: int
    out_chan: int
    cfg: ModelConfig
    compute_dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    # input already arrives in THIS level's s2d domain (the previous
    # encoder block downsampled straight into it) — skip the entry s2d
    s2d_in: bool = False
    # the NEXT level is s2d too: downsample straight into its s2d domain
    # (ops/s2d.downsample_s2d_to_s2d — full 4Co lanes, no half-lane native
    # write + no rearrange pass; eval twin measured 14.87 -> 15.39 Mvox/s
    # combined with the decoder in-domain route, 2026-08-20). BN then runs
    # phase-aware (phases=4): per-native-channel stats, identical params.
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x, task_emb, *, train: bool):
        if self.s2d and not self.s2d_in:
            x = space_to_depth_hw(x)
        x_skip = MoDESubNet2Conv(
            self.num_experts, self.num_tasks, self.in_chan, self.out_chan,
            self.cfg, self.compute_dtype, s2d=self.s2d, name="conv_more",
        )(x, task_emb, train=train)
        w_down = self.param(
            "down_w", torch_uniform_init(self.out_chan * 8),
            (2, 2, 2, self.out_chan, self.out_chan),
        )
        if self.s2d and self.s2d_out:
            x = downsample_s2d_to_s2d(
                x_skip, s2d_down_kernel(w_down), compute_dtype=self.compute_dtype
            )
        elif self.s2d:
            x = downsample_s2d_domain(
                x_skip, s2d_down_kernel(w_down), compute_dtype=self.compute_dtype
            )
        else:
            x = downsample2x_conv(x_skip, w_down, compute_dtype=self.compute_dtype)
        x = BatchNorm3d(
            self.out_chan, momentum=self.cfg.bn_momentum, eps=self.cfg.bn_eps,
            phases=4 if (self.s2d and self.s2d_out) else 1, name="down_bn",
        )(x, train=train)
        x = nn.relu(x)
        return x, x_skip


class MoDEDecoderBlock(nn.Module):
    """Transposed-conv upsample + BN + ReLU, concat skip, MoDE double conv
    (reference MoDEDecoderBlock, RepMode.py:92-108).

    s2d levels: the transposed conv produces the s2d-domain tensor directly
    (ops/s2d.upsample_to_s2d), BN runs phase-aware, the skip arrives in s2d
    from the encoder, and conv_less runs in-domain with a split-segment
    kernel for the concat. Output stays in the s2d domain (the caller
    converts when the next consumer is native)."""

    num_experts: int
    num_tasks: int
    in_chan: int
    out_chan: int
    cfg: ModelConfig
    compute_dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    # input arrives in the PREVIOUS level's s2d domain (consecutive s2d
    # decoder levels): upsample in-domain (ops/s2d.upsample_s2d_to_s2d)
    # instead of depth_to_space + native-input upsample — the narrow
    # full-resolution native tensor is never materialized (the eval path
    # has run this route since round 2; old route measured 9.5 vs 5.9 ms
    # at the L2->L1 eval shape, bench_edges 2026-08-20)
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x, x_skip, task_emb, *, train: bool):
        # torch ConvTranspose3d fan_in = out_chan * k^3 (weight dim 1)
        w_up = self.param(
            "up_w", torch_uniform_init(self.out_chan * 8),
            (2, 2, 2, self.in_chan, self.out_chan),
        )
        if self.s2d and self.s2d_in:
            x = upsample_s2d_to_s2d(x, w_up, compute_dtype=self.compute_dtype)
        elif self.s2d:
            x = upsample_to_s2d(x, w_up, compute_dtype=self.compute_dtype)
        else:
            x = upsample2x_convt(x, w_up, compute_dtype=self.compute_dtype)
        x = BatchNorm3d(
            self.out_chan, momentum=self.cfg.bn_momentum, eps=self.cfg.bn_eps,
            phases=4 if self.s2d else 1, name="up_bn",
        )(x, train=train)
        x = nn.relu(x)
        x = jnp.concatenate([x_skip, x], axis=-1)  # skip first (RepMode.py:106)
        x = MoDESubNet2Conv(
            self.num_experts, self.num_tasks, self.in_chan, self.out_chan,
            self.cfg, self.compute_dtype, s2d=self.s2d,
            input_channel_sizes=(self.out_chan, self.out_chan) if self.s2d else (),
            name="conv_less",
        )(x, task_emb, train=train)
        return x


class RepModeNet(nn.Module):
    """Task-conditioned MoDE U-Net (reference Net, RepMode.py:8-71)."""

    cfg: ModelConfig
    num_tasks: int
    compute_dtype: str = "float32"  # 'bfloat16' for the AMP-equivalent policy

    def _cdt(self) -> Optional[jnp.dtype]:
        return None if self.compute_dtype == "float32" else jnp.dtype(self.compute_dtype)

    @nn.compact
    def __call__(self, x: jax.Array, task_id: jax.Array, *, train: bool = True) -> jax.Array:
        """x: (N, D, H, W, Cin) fp32; task_id: (N,) int32 -> (N, D, H, W, Cout) fp32."""
        cfg = self.cfg
        cdt = self._cdt()
        e, t = cfg.num_experts, self.num_tasks
        c = cfg.in_channels * cfg.mult_chan  # 32

        # one-hot task embedding (RepMode.py:44-49)
        task_emb = jax.nn.one_hot(task_id, t, dtype=jnp.float32)

        chans = [c * (2**i) for i in range(cfg.depth + 1)]  # [32,64,128,256,512]

        # s2d execution domain for narrow-channel levels (ARCHITECTURE.md §3);
        # mirrors the re-parameterized inference net's dataflow.
        s2d_levels = set()
        if cfg.train_s2d:
            from repmode_tpu.models.reparam import default_s2d_levels

            s2d_levels = set(default_s2d_levels(cfg))

        # In-domain resamples between CONSECUTIVE s2d levels (encoder
        # down -> next level's s2d directly; decoder upsample s2d -> s2d):
        # zero rearrange passes at the level seams, exact math. MEASURED
        # NEGATIVE for training (2026-08-20, clean-window A/B,
        # bench_logs/bench_train_r5_ab.log): 320.3 -> 325.6 ms/step
        # pipelined — the fused-seam einsums' VJPs rebuild the 8D views as
        # backward relayouts that cost more than the forward saves. The
        # same fusions WIN at eval (no backward): 14.87 -> 15.39 Mvox/s
        # (models/reparam.py, default on there). Default OFF here;
        # REPMODE_TRAIN_INDOMAIN_RESAMPLE=1 opts in (exact both ways,
        # golden-parity-tested on both legs).
        indomain = os.environ.get(
            "REPMODE_TRAIN_INDOMAIN_RESAMPLE", "0"
        ) == "1"

        # encoder (RepMode.py:56-59); s2d-level skips stay in the s2d domain
        skips = []
        in_ch = cfg.in_channels
        for i in range(cfg.depth):
            lev = i + 1
            lev_s2d = lev in s2d_levels
            x, x_skip = MoDEEncoderBlock(
                e, t, in_ch, chans[i], cfg, cdt, s2d=lev_s2d,
                s2d_in=indomain and lev_s2d and (lev - 1) in s2d_levels,
                s2d_out=indomain and lev_s2d and (lev + 1) in s2d_levels
                and lev < cfg.depth,
                name=f"encoder_block{lev}",
            )(x, task_emb, train=train)
            skips.append(x_skip)
            in_ch = chans[i]

        # bottleneck (RepMode.py:33,62)
        x = MoDESubNet2Conv(
            e, t, chans[cfg.depth - 1], chans[cfg.depth], cfg, cdt, name="bottle_block"
        )(x, task_emb, train=train)

        # decoder (RepMode.py:65-68); s2d decoder blocks emit s2d tensors —
        # convert back to native only when the next consumer needs it.
        # prev_out_s2d: the running tensor is in the PRODUCING level's s2d
        # domain (consecutive s2d decoder levels skip the d2s round-trip
        # and the next block upsamples in-domain).
        prev_out_s2d = False
        for i in range(cfg.depth, 0, -1):
            level_s2d = i in s2d_levels
            x = MoDEDecoderBlock(
                e, t, chans[i], chans[i - 1], cfg, cdt, s2d=level_s2d,
                s2d_in=prev_out_s2d,
                name=f"decoder_block{i}",
            )(x, skips[i - 1], task_emb, train=train)
            next_consumer_s2d = (i == 1) and level_s2d  # conv_out in-domain
            keep_s2d = (
                indomain and level_s2d and i > 1 and (i - 1) in s2d_levels
            )
            if level_s2d and not next_consumer_s2d and not keep_s2d:
                x = depth_to_space_hw(x)
            prev_out_s2d = keep_s2d

        # final gate-only conv, no BN/ReLU (RepMode.py:42,150-151)
        out_s2d = 1 in s2d_levels
        x = MoDEConv(
            num_experts=e,
            num_tasks=t,
            in_chan=c,
            out_chan=cfg.out_channels,
            kernel_size=cfg.kernel_size,
            conv_type="final",
            compute_dtype=cdt,
            train_impl=cfg.train_impl,
            domain="s2d" if out_s2d else "native",
            remat=cfg.remat,
            name="conv_out",
        )(x, task_emb, train=train)
        if out_s2d:
            x = depth_to_space_hw(x)
        return x
