"""Mixture-of-Diverse-Experts (MoDE) convolution math.

The reference unit (fnet/nn_modules/RepMode.py:123-214) holds 5 experts —
learnable 5^3 / 3^3 / 1^3 convs plus two fixed avg-pool (3^3, 5^3) branches
each composed with a learnable 1^3 conv — and a task-conditioned gate that
produces per-(sample, expert, out_channel) weights. At forward time the
reference merges the experts into one 5^3 kernel per *sample* (routing(),
RepMode.py:171-192) and then runs a Python loop of per-sample F.conv3d calls
(RepMode.py:204-208).

TPU-native formulation. Exact-equivalent execution strategies:

  expert_sum   Convolution is linear in its weights and the gate scales
               per-output-channel, so
                   conv(x_n, sum_e g[n,e,:] (.) K_e) =
                   sum_e g[n,e,:] (.) conv(x_n, K_e).
               We therefore run 5 *full-batch* convs with shared kernels at
               their natural sizes (125+27+3 taps + 2 cheap pools vs 125 for
               the merged kernel) and take the gated combination. Every conv
               is a large, static-shaped batch conv that XLA tiles straight
               onto the MXU — no per-sample kernels, no grouped conv. The
               training path on CPU.

  merged_pallas  The reference's own per-sample routing() merge, executed
               by hand-written Pallas kernels with per-sample weight blocks
               (ops/pallas/conv3d.py): forward, dx, and dW all run at
               merged-kernel FLOPs — 45 s2d taps vs the expert sum's 145.
               The TPU training path (train_impl='auto'; measured step
               642 -> 366 ms, ARCHITECTURE.md §11). Under multi-device
               meshes each stage's batch-parallel GSPMD rule
               (_wrap_batch_parallel) keeps the kernels shard-local.

  merged       The same merge via a vmapped XLA conv (lowers to a
               batch-grouped conv; measured 2x slower — kept as the
               record and for parity testing).

  single       One merged kernel for a task-uniform batch -> a single plain
               conv (the reference eval path, RepMode.py:210). Used by the
               re-parameterized inference net (models/reparam.py), where the
               merge happens once per task for the whole network.

Expert order in the gate matches the reference: [conv5, conv3, conv1,
avg3(.)conv1, avg5(.)conv1] (RepMode.py:184-188).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from repmode_tpu.ops.conv3d import avg_pool_same, conv3d_same


class ExpertKernels(NamedTuple):
    """Learnable expert kernels, DHWIO layout.

    w5: (5,5,5,Ci,Co); w3: (3,3,3,Ci,Co); w1, wa3, wa5: (1,1,1,Ci,Co).
    The fixed avg-pool factors (1/27 over 3^3, 1/125 over 5^3; reference
    buffers at RepMode.py:139-142) are constants and never stored.
    """

    w5: jax.Array
    w3: jax.Array
    w1: jax.Array
    wa3: jax.Array  # 1^3 conv composed with fixed 3^3 avg pool
    wa5: jax.Array  # 1^3 conv composed with fixed 5^3 avg pool


def gate_logits_to_weights(logits: jax.Array, num_experts: int, out_chan: int) -> jax.Array:
    """(N, E*Co) gate logits -> (N, E, Co) softmax over the expert axis.

    Matches reference g.view(N, E, Co) + Softmax(dim=1) (RepMode.py:198-200).
    Softmax runs in fp32 regardless of compute dtype.
    """
    n = logits.shape[0]
    dt = jnp.promote_types(logits.dtype, jnp.float32)
    g = logits.reshape(n, num_experts, out_chan).astype(dt)
    return jax.nn.softmax(g, axis=1)


def _pad_to(k: jax.Array, size: int) -> jax.Array:
    """Zero-pad a DHWIO kernel spatially to size^3 (reference trans_kernel, RepMode.py:165-169)."""
    pd = (size - k.shape[0]) // 2
    ph = (size - k.shape[1]) // 2
    pw = (size - k.shape[2]) // 2
    return jnp.pad(k, ((pd, pd), (ph, ph), (pw, pw), (0, 0), (0, 0)))


def expert_bank(ek: ExpertKernels, kernel_size: int = 5) -> jax.Array:
    """Stack the 5 experts as full-size kernels: (E, k,k,k, Ci, Co).

    Composes the avg-pool branches into dense kernels exactly as the
    reference routing() does via einsum('oidhw,dhw->oidhw', conv1, pool)
    (RepMode.py:176-180): the 1^3 conv broadcast over the pool support.
    """
    k5 = _pad_to(ek.w5, kernel_size)
    k3 = _pad_to(ek.w3, kernel_size)
    k1 = _pad_to(ek.w1, kernel_size)
    ones3 = jnp.full((3, 3, 3, 1, 1), 1.0 / 27.0, ek.wa3.dtype)
    ones5 = jnp.full((5, 5, 5, 1, 1), 1.0 / 125.0, ek.wa5.dtype)
    ka3 = _pad_to(ones3 * ek.wa3, kernel_size)
    ka5 = _pad_to(ones5 * ek.wa5, kernel_size)
    return jnp.stack([k5, k3, k1, ka3, ka5], axis=0)


def merge_kernels(ek: ExpertKernels, g: jax.Array, kernel_size: int = 5) -> jax.Array:
    """Vectorized routing: per-sample merged kernels.

    g: (N, E, Co) gate weights -> (N, k,k,k, Ci, Co). One einsum replaces the
    reference's per-sample Python loop of 5 einsums (RepMode.py:183-190).
    """
    bank = expert_bank(ek, kernel_size)  # (E,k,k,k,Ci,Co)
    return jnp.einsum("neo,edhwio->ndhwio", g, bank)


def mode_conv_expert_sum(
    x: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    compute_dtype=None,
) -> jax.Array:
    """Training-path MoDE conv: 5 shared-kernel batch convs + gated combine.

    x: (N,D,H,W,Ci), g: (N,E,Co) -> (N,D,H,W,Co), fp32 in exact mode /
    compute_dtype under AMP.
    Exactly equals conv(x_n, merged_kernel_n) by linearity (see module doc).
    The s2d-domain formulation of the same contract lives in
    mode_conv_expert_sum_s2d_domain.
    """

    def cv(inp, w):
        # AD-safe: bf16 convs output bf16 (see conv3d_same); the fp32 gate
        # multiply below promotes the combine back to fp32.
        return conv3d_same(
            inp, w, compute_dtype=compute_dtype,
            accum_dtype=jnp.float32 if compute_dtype is None else None,
        )

    # The three 1^3 branches are channel matmuls over x, avg3(x), avg5(x).
    pooled3 = avg_pool_same(x, 3)
    pooled5 = avg_pool_same(x, 5)
    y5 = cv(x, ek.w5)
    y3 = cv(x, ek.w3)
    yc1 = cv(x, ek.w1)
    ya3 = cv(pooled3, ek.wa3)
    ya5 = cv(pooled5, ek.wa5)

    # combine dtype policy: fp32 in exact mode, compute_dtype under AMP
    # (see mode_conv_expert_sum_s2d_domain)
    gdt = jnp.promote_types(g.dtype, jnp.float32) if compute_dtype is None \
        else compute_dtype
    gf = g.astype(gdt)

    def gw(e):  # (N,Co) -> (N,1,1,1,Co)
        return gf[:, e][:, None, None, None, :]

    return (
        gw(0) * y5
        + gw(1) * y3
        + gw(2) * yc1
        + gw(3) * ya3
        + gw(4) * ya5
    )


def _split_s2d_kernel(build, w: jax.Array, channel_sizes) -> jax.Array:
    """s2d-transform a kernel whose input is a concat of s2d segments.

    s2d(concat(a, b)) != concat(s2d(a), s2d(b)) channel-wise, so kernels for
    concatenated s2d inputs are built per native segment and concatenated on
    the input-channel axis (mirrors models/reparam.to_s2d_plain)."""
    if len(channel_sizes) == 1:
        return build(w)
    parts = []
    off = 0
    for c in channel_sizes:
        parts.append(build(w[:, :, :, off : off + c]))
        off += c
    return jnp.concatenate(parts, axis=3)


def mode_conv_expert_sum_s2d_domain(
    x2: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    compute_dtype=None,
    channel_sizes=None,
) -> jax.Array:
    """Expert-sum MoDE conv executed entirely in the s2d domain.

    x2: (N,D,h',w',4*Ci_total) phase-major (possibly a concat of s2d
    segments, see channel_sizes); g: (N,E,Co) -> (N,D,h',w',4*Co), fp32 in
    exact mode / compute_dtype under AMP.
    All five branches run on lane-filling 4C-channel tensors; narrow-channel
    activations are never materialized (the 4x layout-padding + low MXU
    occupancy of C<128 levels, see ARCHITECTURE.md §3).

    The avg-pool branches run in one of two exact forms, picked by lane
    geometry (both measured, tools/bench_avgbranch.py 2026-08-17):

      * narrow inputs (4*Ci < 256, the L1 domain): COMPOSED into dense s2d
        convs, conv1(avg_k(x)) == conv(x, (1/k^3)*broadcast(w1)) — the same
        composition the reference's routing() merge performs
        (RepMode.py:176-180). The explicit box pool loses 2x fwd / 3x bwd
        here: its phase passes add 32/64-lane slices, VPU-hostile, while
        the MXU runs the 45-tap dense kernel at ~80% MFU.
      * wide inputs (4*Ci >= 256, L2 and the decoder concats): explicit
        separable box pool (ops/s2d.box_pool_s2d — full-vreg lane slices)
        + pointwise conv. Measured 5.2/1.6 ms vs the dense form's 7.8/4.2
        (fwd/bwd, L2 a5 branch) — and its VJP is shifted adds + a pointwise
        dW instead of a full 45/27-tap dW + dx conv pair.

    Gradients flow to wa3/wa5 through the broadcast (dense form) or the
    pointwise kernel (box form); both verified against torch fp64 goldens.
    (Grouping same-tap-shape experts into double-width convs was tried and
    measured a wash — 713.9 vs 712.5 ms/step — so the five separate convs
    stay for simplicity.)
    """
    from repmode_tpu.ops.s2d import (
        box_pool_s2d,
        s2d_conv1_kernel,
        s2d_conv_kernel,
    )

    cs = tuple(channel_sizes) if channel_sizes else (ek.w5.shape[3],)
    ones3 = jnp.full((3, 3, 3, 1, 1), 1.0 / 27.0, ek.wa3.dtype)
    ones5 = jnp.full((5, 5, 5, 1, 1), 1.0 / 125.0, ek.wa5.dtype)
    k5 = _split_s2d_kernel(s2d_conv_kernel, ek.w5, cs)
    k3 = _split_s2d_kernel(s2d_conv_kernel, ek.w3, cs)
    k1 = _split_s2d_kernel(s2d_conv1_kernel, ek.w1, cs)

    def cv(inp, w):
        return conv3d_same(
            inp, w, compute_dtype=compute_dtype,
            accum_dtype=jnp.float32 if compute_dtype is None else None,
        )

    y5 = cv(x2, k5)
    y3 = cv(x2, k3)
    yc1 = cv(x2, k1)

    if min(cs) * 4 >= 256:  # per-SEGMENT lane width decides (box slices
        #                     quarter-segments; 32-ch segments are VPU-hostile)
        # box + pointwise (1/k^3 folded into the kernel: no extra pass)
        kp3 = _split_s2d_kernel(
            lambda w: s2d_conv1_kernel(w * (1.0 / 27.0)), ek.wa3, cs
        )
        kp5 = _split_s2d_kernel(
            lambda w: s2d_conv1_kernel(w * (1.0 / 125.0)), ek.wa5, cs
        )
        x2c = x2 if compute_dtype is None else x2.astype(compute_dtype)

        def box(inp, k):
            # phase-major layout is PER s2d segment: box each segment
            if len(cs) == 1:
                return box_pool_s2d(inp, k)
            parts, off = [], 0
            for c in cs:
                parts.append(box_pool_s2d(inp[..., off : off + 4 * c], k))
                off += 4 * c
            return jnp.concatenate(parts, axis=-1)

        ya3 = cv(box(x2c, 3), kp3)
        ya5 = cv(box(x2c, 5), kp5)
    else:
        ka3 = _split_s2d_kernel(
            lambda w: s2d_conv_kernel(ones3 * w), ek.wa3, cs
        )
        ka5 = _split_s2d_kernel(
            lambda w: s2d_conv_kernel(ones5 * w), ek.wa5, cs
        )
        ya3 = cv(x2, ka3)
        ya5 = cv(x2, ka5)

    # Exact mode: fp32 combine. AMP mode: combine in compute_dtype — the
    # reference's AMP merge/conv also run half precision (routing() einsums
    # under autocast), and materializing the fp32 combine cost ~26 ms/step
    # at full scale (profile 2026-08-17); BN computes its stats in fp32
    # from the bf16 tensor, exactly like torch autocast's fp32 BN.
    gdt = jnp.promote_types(g.dtype, jnp.float32) if compute_dtype is None \
        else compute_dtype
    gf = g.astype(gdt)

    def gw(e):  # (N,Co) -> (N,1,1,1,4Co): same gate for every output phase
        return jnp.tile(gf[:, e], (1, 4))[:, None, None, None, :]

    return (
        gw(0) * y5
        + gw(1) * y3
        + gw(2) * yc1
        + gw(3) * ya3
        + gw(4) * ya5
    )


def s2d_expert_bank(ek: ExpertKernels, channel_sizes=None) -> jax.Array:
    """Stack the 5 experts as s2d-domain kernels: (E, kD, 3, 3, 4Ci, 4Co).

    Every expert is transformed to the s2d domain (avg-pool branches composed
    dense, exactly as mode_conv_expert_sum_s2d_domain builds them) and
    spatially zero-padded to the k5 tap grid (kD=5, 3x3 H/W) so the bank can
    be gate-merged into ONE per-sample kernel — the reference's own routing()
    merge (RepMode.py:171-192), executed in the s2d domain.
    """
    from repmode_tpu.ops.s2d import s2d_conv1_kernel, s2d_conv_kernel

    cs = tuple(channel_sizes) if channel_sizes else (ek.w5.shape[3],)
    ones3 = jnp.full((3, 3, 3, 1, 1), 1.0 / 27.0, ek.wa3.dtype)
    ones5 = jnp.full((5, 5, 5, 1, 1), 1.0 / 125.0, ek.wa5.dtype)

    def padD(k, kd=5):  # pad depth taps (centered) and H/W taps to 3
        pd = (kd - k.shape[0]) // 2
        ph = (3 - k.shape[1]) // 2
        pw = (3 - k.shape[2]) // 2
        return jnp.pad(
            k, ((pd, pd), (ph, ph), (pw, pw), (0, 0), (0, 0))
        )

    k5 = _split_s2d_kernel(s2d_conv_kernel, ek.w5, cs)
    k3 = padD(_split_s2d_kernel(s2d_conv_kernel, ek.w3, cs))
    k1 = padD(_split_s2d_kernel(s2d_conv1_kernel, ek.w1, cs))
    ka3 = padD(_split_s2d_kernel(lambda w: s2d_conv_kernel(ones3 * w), ek.wa3, cs))
    ka5 = _split_s2d_kernel(lambda w: s2d_conv_kernel(ones5 * w), ek.wa5, cs)
    return jnp.stack([k5, k3, k1, ka3, ka5], axis=0)


def mode_conv_merged_s2d_domain(
    x2: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    compute_dtype=None,
    channel_sizes=None,
) -> jax.Array:
    """Per-sample merged-kernel MoDE conv in the s2d domain.

    x2: (N,D,h',w',4*Ci_total), g: (N,E,Co) -> (N,D,h',w',4*Co) fp32.

    The expert-sum formulation runs 145 s2d taps per layer (45+27+1+27+45);
    merging the gate-weighted bank into ONE per-sample 45-tap kernel — the
    reference's routing() merge, RepMode.py:183-190 — cuts conv FLOPs 3.2x
    in forward AND in both backward convs (dx, per-sample dW). The vmapped
    conv lowers to an XLA batch-grouped conv; tools/bench_merged.py measures
    it against the expert sum at the real train shapes. Gradients to the
    gate and expert kernels flow through the merge einsum's VJP (per-sample
    dW contracted against bank / gate) — same math as expert-sum by
    linearity, verified in tests/test_s2d.py.
    """
    bank = s2d_expert_bank(ek, channel_sizes)  # (E,5,3,3,4Ci,4Co)
    if compute_dtype is not None:
        bank = bank.astype(compute_dtype)
        x2 = x2.astype(compute_dtype)
    # phase-major output channels: gate value repeats across the 4 phases
    gf = g.astype(bank.dtype)
    g4 = jnp.tile(gf, (1, 1, 4))  # (N,E,4Co)
    w2 = jnp.einsum("neo,edhwio->ndhwio", g4, bank)

    def one(xi, wi):
        return conv3d_same(
            xi[None], wi, compute_dtype=None,
            accum_dtype=jnp.float32 if compute_dtype is None else None,
        )[0]

    y = jax.vmap(one)(x2, w2)
    return y.astype(jnp.promote_types(y.dtype, jnp.float32))


_DW_ACC_BUDGET = 6 * 1024 * 1024
_DW_MIN_CHUNK = 128


def _wrap_batch_parallel(fn, sharding_rule, repl_factors):
    """Give a batch-parallel op a GSPMD/Shardy partitioning rule.

    `fn` takes array arguments that all carry the batch on dim 0, computes
    nothing across samples, and returns a batch-dim-0 result. Under a
    batch-sharded mesh each device then runs `fn` on its local shard only.
    This is what lets the per-sample Pallas kernels (a pallas_call custom
    call has no built-in GSPMD rule, so XLA would force replication of the
    batch-sharded operands) run under pjit data parallelism — the
    TPU-native answer to the reference's DataParallel training
    (fnet_model.py:96-132). Validated on a virtual CPU mesh in
    tests/test_pallas_kernels.py (no all-gathers in the lowered HLO).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    cp = custom_partitioning(fn)

    def _batched(mesh, rank, batch_axes):
        return NamedSharding(
            mesh, PartitionSpec(*([batch_axes] + [None] * (rank - 1)))
        )

    def _batch_axes(arg_shapes):
        # All operands carry the batch on dim 0; take the first one that is
        # actually batch-sharded so data parallelism survives even when
        # operand 0 arrives replicated (e.g. only the per-sample weights
        # carry the sharding after an upstream reshard).
        for a in arg_shapes:
            spec = a.sharding.spec
            if len(spec) and spec[0] is not None:
                return spec[0]
        return None

    def partition(mesh, arg_shapes, result_shape):
        # Demand: batch dim keeps operand 0's axes, everything else
        # replicated (XLA reshards mismatched operands for us).
        b = _batch_axes(arg_shapes)
        args = tuple(_batched(mesh, len(a.shape), b) for a in arg_shapes)
        return mesh, fn, _batched(mesh, len(result_shape.shape), b), args

    def infer(mesh, arg_shapes, result_shape):
        return _batched(
            mesh, len(result_shape.shape), _batch_axes(arg_shapes)
        )

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,
        need_replication_factors=repl_factors,
    )
    return cp


@functools.lru_cache(maxsize=None)
def _ps_conv_partitioned(interpret: bool):
    """Batch-partitioned per-sample 'same' conv (forward and dx stages)."""

    # custom_partitioning resolves args positionally — no kwargs/partials
    def conv(x2, wn):
        return _ps_conv_chunked(x2, wn, interpret)

    # factor order follows first appearance (Shardy requires the
    # need_replication set sorted by factor index)
    return _wrap_batch_parallel(
        conv,
        "n d h w i, n p q r i o -> n d h w o",
        ("d", "h", "w", "i", "p", "q", "r", "o"),
    )


@functools.lru_cache(maxsize=None)
def _ps_convT_partitioned(interpret: bool):
    """Batch-partitioned per-sample TRANSPOSED conv (the dx stage).

    Takes the cotangent dy and the FORWARD per-sample kernels; the Pallas
    kernel reads the taps reversed and contracts on the output axis, so the
    flipped kernels are never materialized in HBM (the old backward wrote
    and re-read a full (N,45,Ci,Co) flipped copy per MoDE conv per step)."""

    def convT(dy, wn):
        return _ps_conv_chunked(dy, wn, interpret, transpose=True)

    return _wrap_batch_parallel(
        convT,
        "n d h w o, n p q r i o -> n d h w i",
        ("d", "h", "w", "o", "p", "q", "r", "i"),
    )


@functools.lru_cache(maxsize=None)
def _ps_dw_partitioned(kd: int, kh: int, kw: int, interpret: bool):
    """Batch-partitioned per-sample tap-correlation (dW stage)."""

    def dw(x2, dyc):
        return _ps_dw_chunked(x2, dyc, kd, kh, kw, interpret)

    return _wrap_batch_parallel(
        dw,
        "n d h w i, n d h w o -> n p q r i o",
        ("d", "h", "w", "i", "o", "p", "q", "r"),
    )


def _lane_chunk(full: int, fits, lane: int = 128) -> int:
    """Largest divisor of `full` that is a multiple of `lane` (the TPU lane
    width — Mosaic DMA slices the channel dim, so chunk boundaries must be
    128-aligned) and satisfies `fits(chunk)`. Falls back to the smallest
    lane-multiple divisor when none fits (the kernel then relies on Mosaic's
    scoped-VMEM checks). `full` itself must be a multiple of the lane width
    (guarded at the merged-pallas dispatch, mode_conv_merged_s2d_pallas);
    the old halving loop could emit a 96-lane chunk at non-power-of-two
    widths (e.g. 384 -> 192 -> 96), which this enumeration cannot."""
    if fits(full):
        return full
    best = full
    for cand in range(full - lane, 0, -lane):
        if full % cand:
            continue
        best = cand
        if fits(cand):
            return cand
    return best


def _ps_conv_chunked(x2, wn, interpret, transpose=False,
                     limit=8 * 1024 * 1024):
    """Per-sample conv, chunked over the OUTPUT channels so every weight
    block fits the TPU's ~16 MB scoped-VMEM window (Mosaic rejects bigger
    kernel-resident blocks — measured at dec2 conv1, 45x512x256 bf16 =
    11.8 MB + slabs). transpose=True is the dx stage: output channels are
    wn's Ci axis, so the chunk slices axis 4 instead of 5."""
    from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_same_persample

    n, kd, kh, kw, ci, co = wn.shape
    cout = ci if transpose else co
    isz = jnp.dtype(wn.dtype).itemsize  # weight block bytes track the
    #                                     compute dtype (fp32 doubles them)
    chunk = _lane_chunk(
        cout,
        lambda c: kd * kh * kw * (ci * c if not transpose else c * co) * isz
        <= limit,
    )

    def one(ws):
        return pallas_conv3d_same_persample(
            x2, ws, compute_dtype=x2.dtype, out_dtype=x2.dtype,
            transpose_taps=transpose, interpret=interpret,
        )

    if chunk == cout:
        return one(wn)
    if transpose:
        return jnp.concatenate(
            [one(wn[..., i : i + chunk, :]) for i in range(0, cout, chunk)],
            axis=-1,
        )
    return jnp.concatenate(
        [one(wn[..., i : i + chunk]) for i in range(0, cout, chunk)], axis=-1
    )


def _ps_dw_chunked(x2, dyc, kd, kh, kw, interpret):
    """Per-sample tap-correlation dW, chunked over Ci.

    Chunks the fp32 dW accumulator under the ~16 MB scoped-VMEM window
    (Mosaic double-buffers the output window, so budget ~6 MB). Chunk
    over CI — slicing x shrinks the accumulator AND the input slab;
    chunking the LAST (lane) dim below 128 would not shrink anything.
    _DW_ACC_BUDGET is module-level so tests can force the chunked path
    at small shapes.
    """
    from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_dw_persample

    ci, co = x2.shape[-1], dyc.shape[-1]
    chunk = _lane_chunk(
        ci, lambda c: kd * kh * kw * c * co * 4 <= _DW_ACC_BUDGET,
        _DW_MIN_CHUNK,
    )
    if chunk == ci:
        return pallas_conv3d_dw_persample(
            x2, dyc, kd, kh, kw, compute_dtype=x2.dtype, interpret=interpret
        )
    return jnp.concatenate(
        [
            pallas_conv3d_dw_persample(
                x2[..., i : i + chunk], dyc, kd, kh, kw,
                compute_dtype=x2.dtype, interpret=interpret,
            )
            for i in range(0, ci, chunk)
        ],
        axis=4,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def merged_conv_persample(x2: jax.Array, wn: jax.Array, interpret: bool = False):
    """Per-sample-kernel 'same' conv with a hand-written backward.

    x2: (N,D,h,w,Ci), wn: (N,kD,kH,kW,Ci,Co). Forward and both backward
    contractions run as Pallas kernels with per-sample weights
    (ops/pallas/conv3d.py) — dx is the same conv with the spatially
    flipped, io-transposed kernels; dW is the per-sample tap correlation.
    All three stages run at merged-kernel FLOPs (45 s2d taps), 3.2x less
    than the expert-sum's 145 — the cut XLA's grouped conv could not
    deliver (ARCHITECTURE.md §11). Every stage carries a batch-parallel
    GSPMD rule (_wrap_batch_parallel), so the op shards over the data
    axis under pjit meshes.
    """
    return _ps_conv_partitioned(interpret)(x2, wn)


def _merged_conv_ps_fwd(x2, wn, interpret):
    return merged_conv_persample(x2, wn, interpret), (x2, wn)


def _merged_conv_ps_bwd(interpret, res, dy):
    x2, wn = res
    dyc = dy.astype(x2.dtype)
    if os.environ.get("REPMODE_DX_TRANSPOSE", "1") != "0":
        # dx via the transposed-tap kernel: reads the FORWARD wn (already
        # resident from the fwd residuals) with reversed taps in-kernel —
        # no flipped/io-transposed per-sample kernel copy in HBM
        dx = _ps_convT_partitioned(interpret)(dyc, wn)
    else:  # A/B escape: materialize flipped kernels (the r3 backward)
        wt = jnp.flip(wn, axis=(1, 2, 3)).swapaxes(-1, -2)
        dx = _ps_conv_partitioned(interpret)(dyc, wt)
    kd, kh, kw = wn.shape[1:4]
    dwn = _ps_dw_partitioned(kd, kh, kw, interpret)(x2, dyc)
    return dx, dwn.astype(wn.dtype)


merged_conv_persample.defvjp(_merged_conv_ps_fwd, _merged_conv_ps_bwd)


def mode_conv_merged_s2d_pallas(
    x2: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    compute_dtype=None,
    channel_sizes=None,
    interpret: bool = False,
) -> jax.Array:
    """Per-sample merged-kernel MoDE conv via the Pallas kernels.

    Same contract as mode_conv_expert_sum_s2d_domain. The gate merge is a
    plain einsum (differentiable: the Pallas backward returns per-sample
    dW, and AD contracts it against the bank / gate automatically) — the
    reference's routing() merge (RepMode.py:171-192) executed at
    merged-kernel FLOPs on the MXU.

    Geometry guard: Mosaic DMA slices the channel (lane) dim, which must be
    128-aligned. Narrow-INPUT convs (enc1 conv1's 4-channel s2d input) take
    the per-sample im2col GEMM instead (mode_conv_im2col_merged_s2d — still
    merged-kernel FLOPs, MXU-shaped contraction); other misaligned
    geometries fall back to the exact expert sum. The co=4 conv_out is
    dispatched to the tap-major path before ever reaching here
    (models/repmode.py MoDEConv).
    """
    co4 = 4 * g.shape[2]
    if x2.shape[-1] % 128 or co4 % 128:
        # NEGATIVE RESULT (2026-08-20, bench_logs/bench_train_r4_ab.log):
        # routing the narrow-input enc1 conv1 through the per-sample
        # im2col GEMM measured +34.5 ms/step at full scale — the 377 MB
        # patch materialization and its 45-slice additive-pad transpose
        # cost more than the lane-starved expert-sum convs it replaces.
        # Kept behind an opt-in env knob as the dated record.
        if (
            x2.shape[-1] <= 64 and co4 % 128 == 0
            and os.environ.get("REPMODE_ENC1_IM2COL", "0") == "1"
        ):
            return mode_conv_im2col_merged_s2d(
                x2, ek, g, compute_dtype=compute_dtype,
                channel_sizes=channel_sizes,
            )
        return mode_conv_expert_sum_s2d_domain(
            x2, ek, g, compute_dtype=compute_dtype,
            channel_sizes=channel_sizes,
        )
    bank = s2d_expert_bank(ek, channel_sizes)  # (E,5,3,3,4Ci,4Co)
    gdt = jnp.promote_types(g.dtype, jnp.float32)
    g4 = jnp.tile(g.astype(gdt), (1, 1, 4))  # (N,E,4Co) phase-major
    wn = jnp.einsum("neo,edhwio->ndhwio", g4, bank.astype(gdt))
    if compute_dtype is not None:
        x2 = x2.astype(compute_dtype)
        wn = wn.astype(compute_dtype)
    else:
        x2 = x2.astype(jnp.promote_types(x2.dtype, jnp.float32))
        wn = wn.astype(x2.dtype)
    return merged_conv_persample(x2, wn, interpret)


def _tap_sum(z: jax.Array, kd: int, kh: int, kw: int, co: int) -> jax.Array:
    """Tap-major shifted-add reduction: z (N,D,H,W,T*co) -> (N,D,H,W,co),
    y[p,o] = sum_t z[p + off_t - ctr, t*co + o] with zero padding.

    Plain AD on purpose. Its transpose builds dz by 45 ADDITIVE pads into
    the padded-z buffer (profiled 22 ms/step at full scale); a gather-form
    custom VJP (45 shifted SLICES of one padded dy, concatenated on lanes)
    was built and MEASURED WORSE: the materialized concat cotangent raised
    peak HBM by >1.36 GB and the full-scale step stopped fitting the chip
    (XLA's scatter accumulates into the buffer it then consumes). Recorded
    2026-08-18; the 22 ms stays because the memory headroom is worth more.
    """
    n, d, h, wl, _ = z.shape
    pd_, ph_, pw_ = (kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    zp = jnp.pad(z, ((0, 0), (pd_, pd_), (ph_, ph_), (pw_, pw_), (0, 0)))
    y = jnp.zeros((n, d, h, wl, co), jnp.float32)
    ti = 0
    for dz_ in range(kd):
        for dy_ in range(kh):
            for dx_ in range(kw):
                y = y + zp[
                    :, dz_ : dz_ + d, dy_ : dy_ + h, dx_ : dx_ + wl,
                    ti * co : (ti + 1) * co,
                ].astype(jnp.float32)
                ti += 1
    return y




def mode_conv_tapmajor_merged_s2d(
    x2: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    compute_dtype=None,
    channel_sizes=None,
) -> jax.Array:
    """MoDE conv for SMALL output channels in the s2d domain: per-sample
    gate-merged kernel + tap-major factorization. AD-safe (pure einsums and
    shifted-slice adds), so the TRAIN path can use it, unlike the fp32-only
    eval helper conv3d_same_tapmajor.

    x2: (N,D,h',w',4*Ci_total), g: (N,E,Co) -> (N,D,h',w',4*Co) fp32.

    conv_out (native co=1 -> 4 s2d output lanes of 128) is the worst MXU
    shape in the net: the expert sum runs FIVE convs each padding 4 lanes
    to 128 (train-mode block measured ~30 ms/batch-8 net of the fetch tax,
    tools/bench_bwd.py 2026-08-17). Merging the gate-weighted bank into one
    per-sample kernel (the reference's routing(), RepMode.py:171-192; tiny
    here: taps x 4Ci x 4Co per sample) and factorizing tap-major gives
    batched MXU GEMMs plus shifted adds — the same lowering that took the
    re-parameterized eval conv_out 15.7 -> 14.2 ms/batch-16
    (ARCHITECTURE.md §10), now with per-sample kernels and gradients. The
    kd depth taps are folded INTO the GEMM contraction (kd shifted reads of
    one depth-padded buffer) so the shifted-add epilogue — and its
    additive-pad VJP, the old 22 ms/step pad_add — only spans the kh*kw
    H/W taps (see the inline comment below).
    """
    bank = s2d_expert_bank(ek, channel_sizes)  # (E,KD,KH,KW,4Ci,4Co)
    e, kd, kh, kw, ci4, co4 = bank.shape
    n, d, h, wl, _ = x2.shape

    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
    g4 = jnp.tile(gf, (1, 1, 4))  # (N,E,4Co), phase-major
    wt = jnp.einsum("neo,edhwio->ndhwio", g4, bank.astype(g4.dtype))
    if compute_dtype is not None:
        x2 = x2.astype(compute_dtype)
        wt = wt.astype(compute_dtype)
    pet = (
        jnp.promote_types(x2.dtype, jnp.float32)
        if compute_dtype is None else None
    )

    # Depth-folded tap-major: contract the kd DEPTH taps inside the GEMMs
    # (kd shifted reads of one depth-padded buffer, K=ci4 each) so only the
    # kh*kw H/W taps remain in the shifted-add epilogue. z shrinks from
    # taps*4Co to kh*kw*4Co lanes (conv_out: 180 -> 36) and — the real win —
    # _tap_sum's additive-pad VJP builds a kh*kw-tap padded cotangent
    # instead of a 45-tap one: profiled 22 ms -> ~4 ms/step at full scale
    # (bench_logs/prof_r4_merged.log pad_add_fusion vs prof_r4_smallc2.log).
    if os.environ.get("REPMODE_TAPMAJOR_DEPTHFOLD", "1") == "0":
        # A/B escape: the r3 form — one GEMM to taps*4Co lanes, 45-tap sum
        t = kd * kh * kw
        wt3 = wt.reshape(n, t, ci4, co4).transpose(0, 2, 1, 3).reshape(
            n, ci4, t * co4
        )
        z = jnp.einsum("ndhwc,nck->ndhwk", x2, wt3,
                       preferred_element_type=pet)
        return _tap_sum(z, kd, kh, kw, co4)

    pd_ = (kd - 1) // 2
    xp = jnp.pad(x2, ((0, 0), (pd_, pd_), (0, 0), (0, 0), (0, 0)))
    z = None
    for dz in range(kd):
        wdz = wt[:, dz].transpose(0, 3, 1, 2, 4).reshape(
            n, ci4, kh * kw * co4
        )
        zd = jnp.einsum(
            "ndhwc,nck->ndhwk", xp[:, dz : dz + d], wdz,
            preferred_element_type=pet,
        )
        z = zd if z is None else z + zd
    return _tap_sum(z, 1, kh, kw, co4)


def mode_conv_im2col_merged_s2d(
    x2: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    compute_dtype=None,
    channel_sizes=None,
) -> jax.Array:
    """Per-sample merged MoDE conv for NARROW s2d inputs, as an im2col GEMM.

    x2: (N,D,h',w',4*Ci_total) with 4*Ci < 128 (enc1 conv1: the 1-channel
    volume's 4 s2d lanes), g: (N,E,Co) -> (N,D,h',w',4*Co) fp32/AMP.

    The Pallas per-sample kernels need 128-aligned channel DMA, and the
    expert sum runs five K=4 contractions here — the MXU's worst case (4 of
    128 contraction lanes live; eval measured it at 6.8 ms/batch-16,
    ARCHITECTURE.md §10). Instead: merge the gate-weighted bank into one
    per-sample kernel (the reference's routing(), RepMode.py:171-192),
    unfold the 45 taps of the NARROW input into patch channels
    (taps*4Ci = 180 — a healthy contraction width), and run ONE batched
    GEMM per sample. AD-safe: the patch build's transpose is 45 additive
    pads of 4-lane slices summed into the narrow input — small, unlike the
    wide-tensor pad_add this replaces on the conv_out side.
    """
    bank = s2d_expert_bank(ek, channel_sizes)  # (E,KD,KH,KW,4Ci,4Co)
    e, kd, kh, kw, ci4, co4 = bank.shape
    n, d, h, wl, _ = x2.shape

    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
    g4 = jnp.tile(gf, (1, 1, 4))  # (N,E,4Co) phase-major
    wn = jnp.einsum("neo,edhwio->ndhwio", g4, bank.astype(g4.dtype))
    wn = wn.reshape(n, kd * kh * kw * ci4, co4)  # tap-major rows, ch minor
    if compute_dtype is not None:
        x2 = x2.astype(compute_dtype)
        wn = wn.astype(compute_dtype)

    pdz, pdy, pdx = (kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(
        x2, ((0, 0), (pdz, pdz), (pdy, pdy), (pdx, pdx), (0, 0))
    )
    parts = []
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                parts.append(
                    xp[:, dz : dz + d, dy : dy + h, dx : dx + wl, :]
                )
    pt = jnp.concatenate(parts, axis=-1)  # (N,D,h,w, taps*4Ci)
    z = jnp.einsum(
        "ndhwc,nck->ndhwk", pt, wn,
        preferred_element_type=jnp.promote_types(x2.dtype, jnp.float32)
        if compute_dtype is None else None,
    )
    return z.astype(jnp.promote_types(z.dtype, jnp.float32))


def im2col_patches(x: jax.Array, k: int) -> jax.Array:
    """'same'-padded im2col: (N,D,H,W,C) -> (N, D*H*W, k^3*C), tap-major.

    Tap order (dz,dy,dx) row-major with channels minor — matching
    w.reshape(k^3*Ci, Co) of a DHWIO kernel, so conv3d_same(x, w) ==
    (im2col_patches(x,k) @ w.reshape(-1,Co)).reshape(x.shape[:4]+(Co,)).

    Motivation (measured, tools/bench_deep.py): at the deep U-Net levels
    (<= a few thousand positions/sample) XLA lowers a 5^3 conv as 125
    sequential tap-matmuls whose M dim never fills the MXU pipeline —
    bottle-level convs ran at ~3% MFU. One (positions, 125*Ci) GEMM is the
    MXU-shaped form; the patch tensor is small at these levels (<= ~260 MB
    bf16) and its build is pure bandwidth.
    """
    n, d, h, w, c = x.shape
    p = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    parts = []
    for dz in range(k):
        for dy in range(k):
            for dx in range(k):
                parts.append(xp[:, dz : dz + d, dy : dy + h, dx : dx + w, :])
    pt = jnp.concatenate(parts, axis=-1)
    return pt.reshape(n, d * h * w, k * k * k * c)


def mode_conv_im2col_bank(
    x: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    kernel_size: int = 5,
    compute_dtype=None,
) -> jax.Array:
    """Expert-sum MoDE conv as ONE im2col GEMM against the stacked bank.

    x: (N,D,H,W,Ci), g: (N,E,Co) -> (N,D,H,W,Co) fp32. Exactly the expert
    sum (same math as mode_conv_expert_sum; the avg branches composed dense
    as in expert_bank): Y = P @ [K_1 .. K_E] -> (positions, E*Co), then the
    fp32 gated combine contracts E. Shared weights keep the dW backward a
    single GEMM (P^T @ dY) — no per-sample kernels materialized.
    """
    n, d, h, w, ci = x.shape
    e, co = g.shape[1], g.shape[2]
    k = kernel_size
    bank = expert_bank(ek, k)  # (E,k,k,k,Ci,Co)
    wall = bank.transpose(1, 2, 3, 4, 0, 5).reshape(k * k * k * ci, e * co)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wall = wall.astype(compute_dtype)
    pt = im2col_patches(x, k)  # (N, P, k^3*Ci)
    y = (pt @ wall).reshape(n, d * h * w, e, co)
    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
    out = jnp.einsum("npeo,neo->npo", y.astype(gf.dtype), gf)
    return out.reshape(n, d, h, w, co)


def mode_conv_im2col_merged(
    x: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    kernel_size: int = 5,
    compute_dtype=None,
) -> jax.Array:
    """Per-sample merged-kernel MoDE conv as an im2col batched GEMM.

    x: (N,D,H,W,Ci), g: (N,E,Co) -> (N,D,H,W,Co) fp32. The reference's
    routing() merge (RepMode.py:171-192) followed by its per-sample conv
    loop (RepMode.py:204-208), executed as einsum('npk,nko->npo') — a
    batched MXU GEMM, 1/E the FLOPs of the bank form, at the cost of
    materializing the (N, k^3*Ci, Co) merged kernels.
    """
    n, d, h, w, ci = x.shape
    co = g.shape[2]
    k = kernel_size
    wn = merge_kernels(ek, g, k).reshape(n, k * k * k * ci, co)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wn = wn.astype(compute_dtype)
    pt = im2col_patches(x, k)  # (N, P, k^3*Ci)
    y = jnp.einsum("npk,nko->npo", pt, wn)
    y = y.astype(jnp.promote_types(y.dtype, jnp.float32))
    return y.reshape(n, d, h, w, co)


def mode_conv_merged(
    x: jax.Array,
    ek: ExpertKernels,
    g: jax.Array,
    *,
    kernel_size: int = 5,
    compute_dtype=None,
) -> jax.Array:
    """Per-sample merged-kernel conv (vmapped; XLA lowers to grouped conv)."""
    w = merge_kernels(ek, g, kernel_size)  # (N,k,k,k,Ci,Co)

    def one(xi, wi):
        return conv3d_same(
            xi[None], wi, compute_dtype=compute_dtype,
            accum_dtype=jnp.float32 if compute_dtype is None else None,
        )[0]

    y = jax.vmap(one)(x, w)
    return y.astype(jnp.promote_types(y.dtype, jnp.float32))


def mode_conv_single(
    x: jax.Array,
    w: jax.Array,
    *,
    compute_dtype=None,
) -> jax.Array:
    """Task-uniform batch: one merged kernel for everyone (RepMode.py:210)."""
    return conv3d_same(x, w, compute_dtype=compute_dtype)
