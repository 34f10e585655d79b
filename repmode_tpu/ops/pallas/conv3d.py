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


def _dpad_kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sems, *, kd, th, nh,
                 d_nat, w_len, wp, ci, co, compute_dtype, relu, out_dtype):
    """Chainable conv on D-padded tensors (pallas_conv3d_dpad).

    Grid (n, dp, h): dp runs over the PADDED depth; halo dp steps write
    zeros (the next conv in the chain reads them as its D halo). H and W
    halos are handled in-kernel: the slab keeps permanent zero W columns
    (written once at warmup) and the edge h tiles zero their boundary row,
    so inputs/outputs stay native-sized in H and W — no jnp.pad pass
    between chained convs.

    Slab W layout: Mosaic requires DMA destination slices 8-aligned on the
    sublane (W) axis, so the input rows land at column 8 and the left conv
    halo is the permanent zero column 7; taps read [dx+7, dx+7+W).
    """
    pd = (kd - 1) // 2
    n = pl.program_id(0)
    dp = pl.program_id(1)
    h = pl.program_id(2)
    nd = pl.num_programs(1)
    interior = jnp.logical_and(dp >= pd, dp < nd - pd)

    # linear index over INTERIOR steps only (slot parity + prefetch chain)
    i_step = (n * d_nat + (dp - pd)) * nh + h
    total = pl.num_programs(0) * d_nat * nh
    slot = jax.lax.rem(i_step, 2)
    nxt = jax.lax.rem(i_step + 1, 2)

    def halo_dma(s, nn, dd, hh, start):
        """Halo-aware slab DMA for interior step (nn, dd, hh). The start and
        wait sides must rebuild the SAME-sized descriptor, branch-matched on
        hh (semaphores count bytes). Rows: slab row l <-> native row
        hh*th - 1 + l; cols: slab col c <-> native col c - 1 (cols 0 and
        W+1.. hold permanent zeros)."""
        h0 = hh * th

        def dma(dst_lo, n_rows, src_lo):
            cp = pltpu.make_async_copy(
                x_hbm.at[nn, pl.ds(dd - pd, kd), pl.ds(src_lo, n_rows)],
                x_vmem.at[s, :, pl.ds(dst_lo, n_rows), pl.ds(8, w_len)],
                sems.at[s],
            )
            cp.start() if start else cp.wait()

        def zrow(r):
            if start:
                x_vmem[s, :, r, :] = jnp.zeros((kd, wp, ci), x_vmem.dtype)

        if nh == 1:  # single tile: both H edges zero
            zrow(0)
            zrow(th + 1)
            dma(1, th, 0)
            return

        @pl.when(hh == 0)
        def _():
            zrow(0)
            dma(1, th + 1, 0)

        @pl.when(hh == nh - 1)
        def _():
            zrow(th + 1)
            dma(0, th + 1, h0 - 1)

        @pl.when(jnp.logical_and(hh > 0, hh < nh - 1))
        def _():
            dma(0, th + 2, h0 - 1)

    @pl.when(interior)
    def _():
        # warmup: permanent zero W-halo columns of both slots, start own DMA
        @pl.when(i_step == 0)
        def _():
            for s in range(2):
                x_vmem[s, :, :, pl.ds(0, 8), :] = jnp.zeros(
                    (kd, th + 2, 8, ci), x_vmem.dtype
                )
                x_vmem[s, :, :, pl.ds(8 + w_len, wp - 8 - w_len), :] = (
                    jnp.zeros((kd, th + 2, wp - 8 - w_len, ci), x_vmem.dtype)
                )
            halo_dma(slot, n, dp, h, start=True)

        # prefetch the next interior step's slab
        @pl.when(i_step + 1 < total)
        def _():
            j = i_step + 1
            h2 = jax.lax.rem(j, nh)
            d2 = pd + jax.lax.rem(j // nh, d_nat)
            n2 = j // (nh * d_nat)
            halo_dma(nxt, n2, d2, h2, start=True)

        halo_dma(slot, n, dp, h, start=False)  # wait for this step's slab

        acc = jnp.zeros((th * w_len, co), jnp.float32)
        for dz in range(kd):
            for dy in range(3):
                for dx in range(3):
                    a = x_vmem[
                        slot, dz, dy : dy + th, dx + 7 : dx + 7 + w_len, :
                    ]
                    a = a.reshape(th * w_len, ci).astype(compute_dtype)
                    wk = w_ref[dz, dy, dx].astype(compute_dtype)
                    acc = acc + jnp.dot(
                        a, wk, preferred_element_type=jnp.float32
                    )
        acc = acc + b_ref[0].astype(jnp.float32)[None, :]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, 0] = acc.reshape(th, w_len, co).astype(out_dtype)

    @pl.when(jnp.logical_not(interior))
    def _():
        out_ref[0, 0] = jnp.zeros((th, w_len, co), out_dtype)


def pallas_conv3d_dpad(
    x: jax.Array,
    w: jax.Array,
    bias: "jax.Array | None" = None,
    *,
    relu: bool = False,
    h_tile: int = 0,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Chainable 'same' conv on D-padded s2d-domain tensors.

    x: (N, D + kd-1, H, W, Ci) with (kd-1)//2 ZERO halo rows at each depth
    edge; w: (kd, 3, 3, Ci, Co) -> (N, D + kd-1, H, W, Co) with zero halo
    rows rewritten. H/W are native — their conv halos are materialized
    in-kernel (module `_dpad_kernel` doc), so chained convs
    (conv1+bias+relu -> conv2+bias+relu per U-Net level) pay ZERO pad/copy
    passes between them; only the level entry pays one depth pad.
    bf16 in/out by default (halves HBM traffic vs the fp32-out kernel).
    """
    n, dp_, h, wl, ci = x.shape
    kd, kh, kw, wci, co = w.shape
    assert kh == 3 and kw == 3 and wci == ci, (w.shape, x.shape)
    pd = (kd - 1) // 2
    d_nat = dp_ - 2 * pd
    assert d_nat > 0, (dp_, kd)

    # slab W: 8 zero cols (left halo at col 7; DMA dst must be 8-aligned),
    # then W input cols, then >=1 zero col (right halo), rounded to 8
    wp = 8 + -(-(wl + 1) // 8) * 8
    if h_tile <= 0:
        budget = 12 * 1024 * 1024
        h_tile = 1
        for cand in range(min(h, 32), 0, -1):
            if h % cand:
                continue
            footprint = (
                2 * kd * (cand + 2) * wp * ci * 2
                + cand * wl * co * 4
                + kd * 9 * ci * co * 2
            )
            if footprint <= budget:
                h_tile = cand
                break
    assert h % h_tile == 0, (h, h_tile)
    nh = h // h_tile

    xc = x.astype(compute_dtype)
    wc = w.astype(compute_dtype)
    b = jnp.zeros((co,), jnp.float32) if bias is None else bias
    b = b.astype(jnp.float32).reshape(1, co)

    grid = (n, dp_, nh)
    kernel = functools.partial(
        _dpad_kernel, kd=kd, th=h_tile, nh=nh, d_nat=d_nat, w_len=wl, wp=wp,
        ci=ci, co=co, compute_dtype=compute_dtype, relu=relu,
        out_dtype=out_dtype,
    )
    flops = 2 * n * d_nat * h * wl * kd * 9 * ci * co
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual halo DMA
            pl.BlockSpec((kd, kh, kw, ci, co), lambda n_, d_, h_: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda n_, d_, h_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_tile, wl, co), lambda n_, d_, h_: (n_, d_, h_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, dp_, h, wl, co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kd, h_tile + 2, wp, ci), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 + w.size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xc, wc, b)


def _conv_kernel_ps(x_hbm, w_ref, out_ref, x_vmem, sems, *, kd, kh, kw, th,
                    w_len, ci, co, compute_dtype, out_dtype,
                    transpose=False):
    """Per-SAMPLE-weight variant of _conv_kernel: w_ref block is sample n's
    kernel (the gate-merged MoDE kernel). Same double-buffered halo slab.

    transpose=True computes the TRANSPOSED conv (the dx backward): the
    slab holds the padded cotangent dy (ci = Co of the stored kernel), the
    taps are read spatially REVERSED and each matmul contracts dy against
    the kernel's OUTPUT axis — dx = conv(dy, flip(w).swap(io)) without ever
    materializing the flipped per-sample kernels in HBM (they cost a full
    (N,45,Ci,Co) write+read per MoDE conv per step in the old backward)."""
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
                if transpose:
                    # reversed tap of the FORWARD kernel, contracted on its
                    # output axis: acc += a @ w[rev_tap].T (a carries dy)
                    wk = w_ref[
                        0, kd - 1 - dz, kh - 1 - dy, kw - 1 - dx
                    ].astype(compute_dtype)
                    acc = acc + jax.lax.dot_general(
                        a, wk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    wk = w_ref[0, dz, dy, dx].astype(compute_dtype)
                    acc = acc + jnp.dot(
                        a, wk, preferred_element_type=jnp.float32
                    )
    out_ref[0, 0] = acc.reshape(th, w_len, co).astype(out_dtype)


def pallas_conv3d_same_persample(
    x: jax.Array,
    w: jax.Array,
    *,
    h_tile: int = 0,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
    transpose_taps: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """'same' conv with a DIFFERENT kernel per sample.

    x: (N,D,H,W,Ci), w: (N,kD,kH,kW,Ci,Co) -> (N,D,H,W,Co). This is the
    execution XLA lacks: its batch-grouped conv lowering measured ~2x
    SLOWER than the 5-conv expert sum (tools/bench_merged.py 2026-08-17),
    while here the weight block is simply indexed by the grid's n — sample
    n's gate-merged kernel stays VMEM-resident across its (d, h) steps.
    This makes the reference's per-sample routing() merge (RepMode.py:
    171-208) executable at merged-kernel FLOPs (45 s2d taps vs the expert
    sum's 145) on the MXU.

    transpose_taps=True: x is the cotangent dy with Co channels and the
    result is dx with Ci channels — the kernel reads w's taps reversed and
    contracts on the output axis (see _conv_kernel_ps). w keeps its
    FORWARD (N,kD,kH,kW,Ci,Co) layout either way.
    """
    n, d, h, wl, cin = x.shape
    wn, kd, kh, kw, wci, wco = w.shape
    if transpose_taps:
        assert wn == n and wco == cin, (w.shape, x.shape)
        cout = wci
    else:
        assert wn == n and wci == cin, (w.shape, x.shape)
        cout = wco
    assert kh % 2 == 1 and kw % 2 == 1
    pad_d = (kd - 1) // 2
    pad_h = (kh - 1) // 2
    pad_w = (kw - 1) // 2
    wpad = -(-(wl + kw - 1) // 8) * 8
    isz = jnp.dtype(compute_dtype).itemsize  # bf16=2, fp32=4: the budget
    #        math must track the actual slab/weight dtype (a hardcoded *2
    #        OOM'd scoped VMEM on fp32 parity runs at 256-ch s2d levels)
    if h_tile <= 0:
        # per-sample weights are a revisited window — assume Mosaic
        # double-buffers it (as measured for the dW accumulator)
        budget = 16 * 1024 * 1024 - 2 * kd * kh * kw * wci * wco * isz \
            - 2 * 1024 * 1024
        h_tile = 1
        for cand in range(h, 0, -1):
            if h % cand:
                continue
            footprint = (
                2 * kd * (cand + kh - 1) * wpad * cin * isz
                + 2 * cand * wl * cout * 4
            )
            if footprint <= budget:
                h_tile = cand
                break
    assert h % h_tile == 0, (h, h_tile)

    xp = jnp.pad(
        x.astype(compute_dtype),
        ((0, 0), (pad_d, pad_d), (pad_h, pad_h),
         (pad_w, wpad - wl - pad_w), (0, 0)),
    )
    wc = w.astype(compute_dtype)

    grid = (n, d, h // h_tile)
    kernel = functools.partial(
        _conv_kernel_ps, kd=kd, kh=kh, kw=kw, th=h_tile, w_len=wl, ci=cin,
        co=cout, compute_dtype=compute_dtype, out_dtype=out_dtype,
        transpose=transpose_taps,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, kd, kh, kw, wci, wco),
                lambda n_, d_, h_: (n_, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h_tile, wl, cout), lambda n_, d_, h_: (n_, d_, h_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, d, h, wl, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kd, h_tile + kh - 1, wpad, cin), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * h * wl * kd * kh * kw * cin * cout,
            bytes_accessed=x.size * 2 + w.size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wc)


def _dw_kernel_ps(x_hbm, g_ref, out_ref, x_vmem, sems, *, kd, kh, kw, th,
                  w_len, ci, co, nh, compute_dtype):
    """Per-sample weight-gradient: out[n,t] = sum_p x[n, p+t-ctr] (x) dy[n, p].

    Grid (n, d, h): the output block depends only on n, so Mosaic keeps the
    fp32 accumulator VMEM-resident across a sample's (d, h) steps; each
    step contracts the halo slab's tap views against the dy tile on the
    MXU (contraction dim = tile positions)."""
    n = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    nd = pl.num_programs(1)
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

    @pl.when(jnp.logical_and(d == 0, h == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    dma_for(n, d, h, slot).wait()

    gt = g_ref[0, 0].reshape(th * w_len, co).astype(compute_dtype)
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                a = x_vmem[slot, dz, dy : dy + th, dx : dx + w_len, :]
                a = a.reshape(th * w_len, ci).astype(compute_dtype)
                part = jax.lax.dot_general(
                    a, gt, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_ref[0, dz, dy, dx] += part


def pallas_conv3d_dw_persample(
    x: jax.Array,
    dy: jax.Array,
    kd: int,
    kh: int,
    kw: int,
    *,
    h_tile: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Per-sample 'same'-conv weight gradient.

    x: (N,D,H,W,Ci), dy: (N,D,H,W,Co) -> (N,kD,kH,kW,Ci,Co) fp32:
    dW[n,t,i,o] = sum_p x[n, p+t-ctr, i] * dy[n, p, o]. This is the
    sufficient statistic of the merged MoDE conv's backward: the expert
    bank gradient is sum_n g[n,e,:] (x) dW[n] and the gate gradient is
    <bank[e], dW[n]> — so ONE 45-tap contraction replaces the expert sum's
    five full dW convolutions (145 taps total).
    """
    n, d, h, wl, ci = x.shape
    co = dy.shape[-1]
    assert dy.shape[:4] == x.shape[:4], (x.shape, dy.shape)
    pad_d = (kd - 1) // 2
    pad_h = (kh - 1) // 2
    pad_w = (kw - 1) // 2
    wpad = -(-(wl + kw - 1) // 8) * 8
    isz = jnp.dtype(compute_dtype).itemsize
    if h_tile <= 0:
        # the fp32 accumulator window is double-buffered by Mosaic (2x
        # kd*kh*kw*ci*co*4 on the scoped-vmem stack, measured: 16.23M at
        # ci=128,co=256 with big slabs) — keep slabs+dy small
        budget = 16 * 1024 * 1024 - 2 * kd * kh * kw * ci * co * 4 \
            - 2 * 1024 * 1024
        h_tile = 1
        for cand in range(h, 0, -1):
            if h % cand:
                continue
            footprint = (
                2 * kd * (cand + kh - 1) * wpad * ci * isz
                + 2 * cand * wl * co * isz
            )
            if footprint <= budget:
                h_tile = cand
                break
    assert h % h_tile == 0, (h, h_tile)

    xp = jnp.pad(
        x.astype(compute_dtype),
        ((0, 0), (pad_d, pad_d), (pad_h, pad_h),
         (pad_w, wpad - wl - pad_w), (0, 0)),
    )
    gc = dy.astype(compute_dtype)

    grid = (n, d, h // h_tile)
    kernel = functools.partial(
        _dw_kernel_ps, kd=kd, kh=kh, kw=kw, th=h_tile, w_len=wl, ci=ci,
        co=co, nh=h // h_tile, compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, h_tile, wl, co), lambda n_, d_, h_: (n_, d_, h_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kd, kh, kw, ci, co),
            lambda n_, d_, h_: (n_, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, kd, kh, kw, ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, kd, h_tile + kh - 1, wpad, ci), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * h * wl * kd * kh * kw * ci * co,
            bytes_accessed=x.size * 2 + dy.size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, gc)


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
