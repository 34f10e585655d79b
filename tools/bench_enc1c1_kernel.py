"""A/B: enc1 conv1 (s2d ci=4) as an in-VMEM tap-concat K=180 Pallas GEMM.

The entry MoDE conv's s2d form contracts K=4 input lanes — ~3% MXU
K-occupancy — and its train-mode expert-sum cluster profiles at ~10-12
ms/step of ~5%-MFU fusions (ARCHITECTURE §13). Two fused reformulations
already measured NEGATIVE because they materialize the patch matrix in HBM
(§12 im2col +34.5 ms/step; §10 `patches` 33 ms at eval). This tool tests
the remaining formulation: build the (tile, 45*4) patch matrix IN VMEM
from the resident halo slab (45 shifted 4-lane slices concatenated on the
lane axis — pure in-register/VMEM data movement, zero HBM traffic) and run
ONE K=180 matmul per tile against the per-sample merged kernel.

Forward only — the decision gate. If this cannot beat the XLA expert-sum
forward at train shapes, the backward is moot and the result is the dated
negative. Compares against:

  xla_es   5-expert sum exactly as mode_conv_expert_sum_s2d_domain runs it
  pallas   the tap-concat kernel with per-sample merged weights

Usage: python tools/bench_enc1c1_kernel.py [--batch 8] [--repeats 6]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(x_hbm, w_ref, out_ref, x_vmem, sems, *, kd, kh, kw, th,
                w_len, ci, co, compute_dtype):
        n = pl.program_id(0)
        d = pl.program_id(1)
        h = pl.program_id(2)
        nd = pl.num_programs(1)
        nh = pl.num_programs(2)
        step = (n * nd + d) * nh + h
        total = pl.num_programs(0) * nd * nh
        slot = jax.lax.rem(step, 2)
        nxt = jax.lax.rem(step + 1, 2)

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
            j = step + 1
            dma_for(j // (nh * nd), jax.lax.rem(j // nh, nd),
                    jax.lax.rem(j, nh), nxt).start()

        dma_for(n, d, h, slot).wait()

        # patch matrix: 45 shifted 4-lane slices -> (th*w, 180) in VMEM
        pieces = []
        for dz in range(kd):
            for dy in range(kh):
                for dx in range(kw):
                    a = x_vmem[slot, dz, dy:dy + th, dx:dx + w_len, :]
                    pieces.append(a.reshape(th * w_len, ci))
        p = jnp.concatenate(pieces, axis=-1).astype(compute_dtype)
        acc = jnp.dot(p, w_ref[0].astype(compute_dtype),
                      preferred_element_type=jnp.float32)
        out_ref[0, 0] = acc.reshape(th, w_len, co).astype(out_ref.dtype)

    def conv(x, wn, *, h_tile=16, interpret=False):
        """x: (N,D,H,W,4) bf16; wn: (N,180,Co) per-sample merged taps
        (tap-major rows: (dz,dy,dx) lexicographic x 4 lanes)."""
        n, d, h, wl, ci = x.shape
        _, k, co = wn.shape
        kd, kh, kw = 5, 3, 3
        assert k == kd * kh * kw * ci
        wpad = -(-(wl + kw - 1) // 8) * 8
        xp = jnp.pad(
            x, ((0, 0), (2, 2), (1, 1), (1, wpad - wl - 1), (0, 0))
        )
        grid = (n, d, h // h_tile)
        kern = functools.partial(
            _kernel, kd=kd, kh=kh, kw=kw, th=h_tile, w_len=wl, ci=ci,
            co=co, compute_dtype=jnp.bfloat16,
        )
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, k, co), lambda n_, d_, h_: (n_, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, h_tile, wl, co), lambda n_, d_, h_: (n_, d_, h_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n, d, h, wl, co), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, kd, h_tile + kh - 1, wpad, ci), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * d * h * wl * k * co,
                bytes_accessed=x.size * 2 + wn.size * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(xp, wn)

    return conv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.mode import (
        ExpertKernels,
        gate_logits_to_weights,
        mode_conv_expert_sum_s2d_domain,
        s2d_expert_bank,
    )

    n = args.batch
    ci, co = 1, 32           # native enc1 conv1 (1 -> mult_chan)
    d, hh, wl = 32, 64, 64   # train patch 32x128x128 in s2d
    rng = np.random.default_rng(0)

    x2 = jnp.asarray(rng.standard_normal((n, d, hh, wl, 4)) * 0.3,
                     jnp.bfloat16)
    ek = ExpertKernels(*[
        jnp.asarray(rng.standard_normal((k, k, k, ci, co)) * 0.1, jnp.float32)
        for k in (5, 3, 1, 1, 1)
    ])
    g = gate_logits_to_weights(
        jnp.asarray(rng.standard_normal((n, 5 * co)), jnp.float32), 5, co
    )

    # per-sample merged taps (N,180,4co): phase-major lanes like the bank
    bank = s2d_expert_bank(ek)                      # (E,5,3,3,4,4co)
    g4 = jnp.tile(g, (1, 1, 4))                     # (N,E,4co)
    wn = jnp.einsum("neo,edhwio->ndhwio", g4, bank) # (N,5,3,3,4,4co)
    wflat = wn.reshape(n, 45 * 4, 4 * co).astype(jnp.bfloat16)

    conv = make_kernel()

    # correctness vs the exact expert sum (bf16 compute on both sides)
    y_ref = np.asarray(
        mode_conv_expert_sum_s2d_domain(
            x2, ek, g, compute_dtype=jnp.bfloat16
        ),
        np.float32,
    )
    y = np.asarray(
        conv(x2, wflat, interpret=args.interpret), np.float32
    )
    err = np.max(np.abs(y - y_ref)) / (np.max(np.abs(y_ref)) + 1e-9)
    print(json.dumps({"check": "pallas", "max_rel_err": float(err)}),
          flush=True)
    assert err < 5e-2, err

    if args.interpret:
        return

    R = args.inner

    def chained(f, *fargs):
        @jax.jit
        def run(x0):
            def body(_i, carry):
                xc, _ = carry
                yv = f(xc, *fargs)
                s = yv.reshape(-1)[0].astype(x0.dtype)
                return (x0 + s * 1e-30, s)

            _, s = jax.lax.fori_loop(
                0, R, body, (x0, jnp.zeros((), x0.dtype)))
            return s

        return run

    flops = 2 * n * d * hh * wl * 180 * 4 * co
    cases = [
        ("xla_es", lambda xx: mode_conv_expert_sum_s2d_domain(
            xx, ek, g, compute_dtype=jnp.bfloat16)),
        ("pallas", lambda xx: conv(xx, wflat)),
    ]
    for name, f in cases:
        run = chained(f)
        _ = float(run(x2))
        ts = []
        for _i in range(args.repeats):
            t0 = time.perf_counter()
            _ = float(run(x2))
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[len(ts) // 2] / R * 1e3
        print(json.dumps({
            "case": name, "ms": round(ms, 3),
            "tflops": round(flops / (ms * 1e-3) / 1e12, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
