"""Deep-level MoDE conv lowerings: expert-sum convs vs im2col GEMMs, on chip.

bench_bwd (round 3) showed the deep U-Net levels are latency-bound, not
FLOP-bound: bottle fwd 15.5 ms for ~0.4 ms of peak-rate conv work (~3% MFU),
enc4 16.3 ms, enc3 18.8 ms — together ~91 ms of the 268 ms train forward.
XLA lowers each 5^3 conv at these shapes as 125 sequential tap-matmuls with
M = a few hundred positions, which never fills the MXU pipeline.

The TPU-right formulation at small spatial extents is im2col: materialize
patches P (N, positions, taps*Ci) ONCE per MoDE layer and express all tap
math as one large GEMM. Candidates measured here, forward and fwd+backward,
at the real train shapes:

  expert_sum     shipping path: 5 'same' convs + gated combine
  im2col_bank    P @ concat(expert kernels) -> (positions, 5*Co), then the
                 gated combine picks expert columns (shared weights, one
                 MXU GEMM, dW backward is one GEMM too)
  im2col_merged  per-sample gate-merged kernel (N, taps*Ci, Co), batched
                 GEMM 'npk,nko->npo' (3.2x fewer FLOPs, but materializes
                 per-sample kernels — Ci*Co*125 each)

Usage: python tools/bench_deep.py [--repeats 3] [--inner 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cases", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.mode import (
        ExpertKernels,
        expert_bank,
        mode_conv_expert_sum,
        mode_conv_im2col_bank,
        mode_conv_im2col_merged,
    )

    R = args.inner
    B = args.batch
    E = 5
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    def mk_ek(ci, co):
        return ExpertKernels(
            mk((5, 5, 5, ci, co)), mk((3, 3, 3, ci, co)),
            mk((1, 1, 1, ci, co)), mk((1, 1, 1, ci, co)),
            mk((1, 1, 1, ci, co)),
        )

    cases = {
        # (x shape, ci, co) at the reference train recipe's deep levels
        "L3_conv": ((B, 8, 16, 16, 128), 128, 128),
        "L4_conv": ((B, 4, 16, 16, 128), 128, 256),
        "L4_conv2": ((B, 4, 16, 16, 256), 256, 256),
        "bottle_conv": ((B, 2, 8, 8, 256), 256, 512),
        "bottle_conv2": ((B, 2, 8, 8, 512), 512, 512),
    }
    if args.cases:
        keep = set(args.cases.split(","))
        cases = {k: v for k, v in cases.items() if k in keep}

    def timed(fn, *fargs):
        out = fn(*fargs)
        _ = float(np.asarray(out).ravel()[0])
        ts = []
        for _i in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(*fargs)
            _ = float(np.asarray(out).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / R

    for name, (xshape, ci, co) in cases.items():
        x = mk(xshape, 1.0)
        ek = mk_ek(ci, co)
        g = jax.nn.softmax(mk((B, E, co), 1.0), axis=1)

        impls = {
            "expert_sum": lambda xx, e, gg: mode_conv_expert_sum(
                xx, e, gg, compute_dtype=jnp.bfloat16
            ),
            "im2col_bank": lambda xx, e, gg: mode_conv_im2col_bank(
                xx, e, gg, compute_dtype=jnp.bfloat16
            ),
            "im2col_merged": lambda xx, e, gg: mode_conv_im2col_merged(
                xx, e, gg, compute_dtype=jnp.bfloat16
            ),
        }

        ref = None
        for iname, impl in impls.items():
            def loss(xx, eek, gg):
                return jnp.sum(impl(xx, eek, gg).astype(jnp.float32) ** 2)

            @jax.jit
            def fwd_chain(x0, eek, gg):
                def body(_i, carry):
                    xc, _ = carry
                    s = loss(xc, eek, gg)
                    return (x0 * (1.0 + s * 1e-30), s)
                _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
                return s

            @jax.jit
            def fb_chain(x0, eek, gg):
                def body(_i, carry):
                    xc, _ = carry
                    gx, ge, ggr = jax.grad(loss, argnums=(0, 1, 2))(xc, eek, gg)
                    s = (jnp.sum(gx.reshape(-1)[:1])
                         + ge.w5.reshape(-1)[0] + ggr.reshape(-1)[0])
                    return (x0 * (1.0 + s * 1e-30), s)
                _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
                return s

            y = impl(x, ek, g)
            if ref is None:
                ref = y
                relerr = 0.0
            else:
                relerr = float(
                    jnp.linalg.norm((y - ref).astype(jnp.float32))
                    / jnp.linalg.norm(ref.astype(jnp.float32))
                )

            tf = timed(fwd_chain, x, ek, g)
            tfb = timed(fb_chain, x, ek, g)
            print(json.dumps({
                "case": name, "impl": iname,
                "fwd_ms": round(tf * 1e3, 2),
                "fwdbwd_ms": round(tfb * 1e3, 2),
                "bwd_ms": round((tfb - tf) * 1e3, 2),
                "rel_err_vs_expert_sum": round(relerr, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
