"""Mixture-of-Diverse-Experts (MoDE) convolution math.

The reference unit (fnet/nn_modules/RepMode.py:123-214) holds 5 experts —
learnable 5^3 / 3^3 / 1^3 convs plus two fixed avg-pool (3^3, 5^3) branches
each composed with a learnable 1^3 conv — and a task-conditioned gate that
produces per-(sample, expert, out_channel) weights. At forward time the
reference merges the experts into one 5^3 kernel per *sample* (routing(),
RepMode.py:171-192) and then runs a Python loop of per-sample F.conv3d calls
(RepMode.py:204-208).

TPU-native formulation. Three exact-equivalent execution strategies:

  expert_sum   Convolution is linear in its weights and the gate scales
               per-output-channel, so
                   conv(x_n, sum_e g[n,e,:] (.) K_e) =
                   sum_e g[n,e,:] (.) conv(x_n, K_e).
               We therefore run 5 *full-batch* convs with shared kernels at
               their natural sizes (125+27+3 taps + 2 cheap pools vs 125 for
               the merged kernel) and take the gated combination. Every conv
               is a large, static-shaped batch conv that XLA tiles straight
               onto the MXU — no per-sample kernels, no grouped conv. This is
               the training path.

  merged       Build the per-sample merged 5^3 kernel (vectorized routing:
               one einsum over the expert bank, replacing the Python loop at
               RepMode.py:183-190) and run a vmapped conv (XLA lowers to a
               batch-grouped conv). Kept for parity testing and benchmarking.

  single       One merged kernel for a task-uniform batch -> a single plain
               conv (the reference eval path, RepMode.py:210). Used by the
               re-parameterized inference net (models/reparam.py), where the
               merge happens once per task for the whole network.

Expert order in the gate matches the reference: [conv5, conv3, conv1,
avg3(.)conv1, avg5(.)conv1] (RepMode.py:184-188).
"""

from __future__ import annotations

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

    x: (N,D,H,W,Ci), g: (N,E,Co) -> (N,D,H,W,Co) fp32.
    Exactly equals conv(x_n, merged_kernel_n) by linearity (see module doc).
    The s2d-domain formulation of the same contract lives in
    mode_conv_expert_sum_s2d_domain — the ONLY s2d execution path.
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

    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))

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
    segments, see channel_sizes); g: (N,E,Co) -> (N,D,h',w',4*Co) fp32.
    All five branches run on lane-filling 4C-channel tensors; narrow-channel
    activations are never materialized (the 4x layout-padding + low MXU
    occupancy of C<128 levels, see ARCHITECTURE.md §3).

    The avg-pool branches are COMPOSED into dense s2d convs,
    conv1(avg_k(x)) == conv(x, (1/k^3)*broadcast(w1)) — the same composition
    the reference's routing() merge performs (RepMode.py:176-180). Measured
    motivation (tools/bench_train_layer.py, 2026-08-17): the explicit
    s2d-domain box pool costs 36-39 ms at the L1 train shape (its per-phase
    slicing materializes 32-lane-minor tensors) while the composed dense
    conv costs ~6 ms; gradients flow to wa3/wa5 through the broadcast.
    (Grouping same-tap-shape experts into double-width convs was tried and
    measured a wash — 713.9 vs 712.5 ms/step — so the five separate convs
    stay for simplicity.)
    """
    from repmode_tpu.ops.s2d import s2d_conv1_kernel, s2d_conv_kernel

    cs = tuple(channel_sizes) if channel_sizes else (ek.w5.shape[3],)
    ones3 = jnp.full((3, 3, 3, 1, 1), 1.0 / 27.0, ek.wa3.dtype)
    ones5 = jnp.full((5, 5, 5, 1, 1), 1.0 / 125.0, ek.wa5.dtype)
    k5 = _split_s2d_kernel(s2d_conv_kernel, ek.w5, cs)
    k3 = _split_s2d_kernel(s2d_conv_kernel, ek.w3, cs)
    k1 = _split_s2d_kernel(s2d_conv1_kernel, ek.w1, cs)
    ka3 = _split_s2d_kernel(
        lambda w: s2d_conv_kernel(ones3 * w), ek.wa3, cs
    )
    ka5 = _split_s2d_kernel(
        lambda w: s2d_conv_kernel(ones5 * w), ek.wa5, cs
    )

    def cv(inp, w):
        return conv3d_same(
            inp, w, compute_dtype=compute_dtype,
            accum_dtype=jnp.float32 if compute_dtype is None else None,
        )

    y5 = cv(x2, k5)
    y3 = cv(x2, k3)
    yc1 = cv(x2, k1)
    ya3 = cv(x2, ka3)
    ya5 = cv(x2, ka5)

    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))

    def gw(e):  # (N,Co) -> (N,1,1,1,4Co): same gate for every output phase
        return jnp.tile(gf[:, e], (1, 4))[:, None, None, None, :]

    return (
        gw(0) * y5
        + gw(1) * y3
        + gw(2) * yc1
        + gw(3) * ya3
        + gw(4) * ya5
    )


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
