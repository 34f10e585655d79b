"""Pallas TPU kernel: 'same' 3D convolution as accumulated shifted matmuls.

Targets the space-to-depth-domain shapes of this framework's U-Net levels
(kernel (kD,3,3), channels >= 128, modest H,W) where the conv is a sum of
kD*3*3 shifted (H*W, Ci) @ (Ci, Co) matmuls — pure MXU work with the input
slab resident in VMEM (each input row is reused 9 times; HBM traffic is
1x input + 1x output per depth slab instead of per tap).

Layout: x (N, D, H, W, Ci) fp32/bf16; w (kD, 3, 3, Ci, Co). The input is
zero-padded outside the kernel (cheap, fused by XLA); each grid step
(n, d, h-tile) DMAs its (kD, TH+2, W+2, Ci) halo slab HBM -> VMEM and
accumulates kD*9 matmuls in fp32.

This is the hand-written counterpart of the XLA s2d conv path (ops/s2d.py);
`repmode_tpu.ops.pallas` kernels are benchmarked against XLA and used when
they win (see ARCHITECTURE.md). Correctness is pinned by interpret-mode
tests against lax.conv_general_dilated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, out_ref, x_vmem, sems, *, kd, kh, kw, th,
                 w_len, ci, co, wpad, compute_dtype):
    """Double-buffered: while step k computes from slot k%2, the DMA for
    step k+1's halo slab streams into the other slot."""
    n = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    step = (n * nd + d) * nh + h
    total = pl.num_programs(0) * nd * nh
    slot = jax.lax.rem(step, 2)
    nxt_slot = jax.lax.rem(step + 1, 2)

    def dma_for(nn, dd, hh, s):
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(dd, kd), pl.ds(hh * th, th + kh - 1)],
            x_vmem.at[s],
            sems.at[s],
        )

    @pl.when(step == 0)
    def _():
        dma_for(n, d, h, slot).start()

    # prefetch the next grid step's slab (grid iterates h fastest, then d, n)
    @pl.when(step + 1 < total)
    def _():
        nstep = step + 1
        nh_i = jax.lax.rem(nstep, nh)
        nd_i = jax.lax.rem(nstep // nh, nd)
        nn_i = nstep // (nh * nd)
        dma_for(nn_i, nd_i, nh_i, nxt_slot).start()

    dma_for(n, d, h, slot).wait()

    acc = jnp.zeros((th * w_len, co), jnp.float32)
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                a = x_vmem[slot, dz, dy : dy + th, dx : dx + w_len, :]
                a = a.reshape(th * w_len, ci).astype(compute_dtype)
                wk = w_ref[dz, dy, dx].astype(compute_dtype)
                acc = acc + jnp.dot(a, wk, preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc.reshape(th, w_len, co)


def _conv_bias_relu_kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sems, *, kd,
                           kh, kw, th, w_len, ci, co, wpad, compute_dtype,
                           relu, out_dtype):
    """Same as _conv_kernel with a fused bias(+ReLU) epilogue — the pointwise
    pass XLA cannot fuse into a custom call happens in-register here."""
    n = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    step = (n * nd + d) * nh + h
    total = pl.num_programs(0) * nd * nh
    slot = jax.lax.rem(step, 2)
    nxt_slot = jax.lax.rem(step + 1, 2)

    def dma_for(nn, dd, hh, s):
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(dd, kd), pl.ds(hh * th, th + kh - 1)],
            x_vmem.at[s],
            sems.at[s],
        )

    @pl.when(step == 0)
    def _():
        dma_for(n, d, h, slot).start()

    @pl.when(step + 1 < total)
    def _():
        nstep = step + 1
        nh_i = jax.lax.rem(nstep, nh)
        nd_i = jax.lax.rem(nstep // nh, nd)
        nn_i = nstep // (nh * nd)
        dma_for(nn_i, nd_i, nh_i, nxt_slot).start()

    dma_for(n, d, h, slot).wait()

    acc = jnp.zeros((th * w_len, co), jnp.float32)
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                a = x_vmem[slot, dz, dy : dy + th, dx : dx + w_len, :]
                a = a.reshape(th * w_len, ci).astype(compute_dtype)
                wk = w_ref[dz, dy, dx].astype(compute_dtype)
                acc = acc + jnp.dot(a, wk, preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)[None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0, 0] = acc.reshape(th, w_len, co).astype(out_dtype)


def pallas_conv3d_same(
    x: jax.Array,
    w: jax.Array,
    bias: "jax.Array | None" = None,
    *,
    relu: bool = False,
    h_tile: int = 0,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """'same' conv for odd (kD, kH, kW) kernels. x: (N,D,H,W,Ci) -> (N,D,H,W,Co).

    With `bias` (shape (Co,)) and/or `relu`, the pointwise epilogue fuses
    into the kernel (out = relu(conv + bias)), emitted in `out_dtype`.
    """
    n, d, h, wl, ci = x.shape
    kd, kh, kw, wci, co = w.shape
    assert kh % 2 == 1 and kw % 2 == 1 and wci == ci, (w.shape, x.shape)
    pad_d = (kd - 1) // 2
    pad_h = (kh - 1) // 2
    pad_w = (kw - 1) // 2
    if h_tile <= 0:
        # largest divisor of H whose double-buffered footprint fits VMEM
        wpad_est = -(-(wl + kw - 1) // 8) * 8
        budget = 12 * 1024 * 1024
        h_tile = 1
        for cand in range(h, 0, -1):
            if h % cand:
                continue
            footprint = (
                2 * kd * (cand + kh - 1) * wpad_est * ci * 2  # slabs (bf16)
                + cand * wl * co * 4                          # out tile (fp32)
                + kd * kh * kw * ci * co * 2                  # weights
            )
            if footprint <= budget:
                h_tile = cand
                break
    assert h % h_tile == 0, (h, h_tile)

    # Mosaic DMA slices must be sublane-aligned: pad W+kw-1 up to a multiple
    # of 8 (the extra right-pad columns are never read by the tap slices).
    wpad = -(-(wl + kw - 1) // 8) * 8
    xp = jnp.pad(
        x.astype(compute_dtype),
        ((0, 0), (pad_d, pad_d), (pad_h, pad_h), (pad_w, wpad - wl - pad_w), (0, 0)),
    )
    wc = w.astype(compute_dtype)

    grid = (n, d, h // h_tile)
    flops = 2 * n * d * h * wl * kd * kh * kw * ci * co
    common = dict(
        kd=kd, kh=kh, kw=kw, th=h_tile, w_len=wl, ci=ci, co=co, wpad=wpad,
        compute_dtype=compute_dtype,
    )
    x_spec = pl.BlockSpec(memory_space=pl.ANY)  # manual DMA (halo slabs)
    w_spec = pl.BlockSpec(
        (kd, kh, kw, ci, co), lambda n_, d_, h_: (0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, h_tile, wl, co), lambda n_, d_, h_: (n_, d_, h_, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scratch = [
        pltpu.VMEM((2, kd, h_tile + kh - 1, wpad, ci), compute_dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=x.size * 2 + w.size * 2, transcendentals=0
    )

    if bias is None and not relu:
        kernel = functools.partial(_conv_kernel, **common)
        return pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, w_spec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, d, h, wl, co), jnp.float32),
            scratch_shapes=scratch, cost_estimate=cost, interpret=interpret,
        )(xp, wc)

    b = jnp.zeros((co,), jnp.float32) if bias is None else bias
    b = b.astype(jnp.float32).reshape(1, co)
    kernel = functools.partial(
        _conv_bias_relu_kernel, relu=relu, out_dtype=out_dtype, **common
    )
    b_spec = pl.BlockSpec(
        (1, co), lambda n_, d_, h_: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel, grid=grid, in_specs=[x_spec, w_spec, b_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, d, h, wl, co), out_dtype),
        scratch_shapes=scratch, cost_estimate=cost, interpret=interpret,
    )(xp, wc, b)
