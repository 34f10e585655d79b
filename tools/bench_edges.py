"""Time every non-chain piece of the s2d forward at full eval scale.

bench_chain.py covers the four big s2d double-convs; this tool times the
rest — edge convs (enc1 conv1 ci=4, conv_out co=4), rearranges, resamples,
concat, and the deep native 5^3 chains — so the measured full forward
(tools/bench_forward.py) decomposes into a complete per-op budget and the
slow non-MXU-shaped pieces are identified by data, not guesswork.

All ops run exactly as plain_forward_s2d executes them (bf16 compute).
Chained-in-jit harness (see bench_chain.py docstring).

Usage: python tools/bench_edges.py [--batch 16] [--repeats 6] [--inner 8]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--only", default="",
                    help="comma-separated case-name filter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.conv3d import (
        conv3d_same,
        downsample2x_conv,
        upsample2x_convt,
    )
    from repmode_tpu.ops.s2d import (
        depth_to_space_hw,
        downsample_s2d_domain,
        space_to_depth_hw,
    )

    R = args.inner
    B = args.batch
    bf = jnp.bfloat16

    def timed(fn, *fargs):
        out = fn(*fargs)
        _ = float(np.asarray(out).ravel()[0])
        times = []
        for _i in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(*fargs)
            _ = float(np.asarray(out).ravel()[0])
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2] / R

    def chained(f):
        @jax.jit
        def run(x0, *rest):
            def body(_i, carry):
                x, _ = carry
                y = f(x, *rest)
                s = y.reshape(-1)[0].astype(x0.dtype)
                return (x0 + s * 1e-30, s)

            _, s = jax.lax.fori_loop(
                0, R, body, (x0, jnp.zeros((), x0.dtype))
            )
            return s

        return run

    rng = np.random.default_rng(0)

    def t(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, bf)

    def cbr(x, w, b):
        return jax.nn.relu(conv3d_same(x, w, compute_dtype=bf) + b)

    def chain(x, w1, b1, w2, b2):
        return cbr(cbr(x, w1, b1), w2, b2)

    # (name, flops, builder) — shapes are the real forward's at B patches
    # of 32x128x128, mult_chan 32, s2d levels (1, 2)
    cases = []

    def case(name, flops, f, *xs):
        cases.append((name, flops, f, xs))

    vox1 = B * 32 * 64 * 64  # s2d L1 voxels

    # edge convs
    case("enc1_conv1_s2d(ci=4)", 2 * vox1 * 45 * 4 * 128,
         lambda x, w, b: cbr(x, w, b),
         t((B, 32, 64, 64, 4)), t((5, 3, 3, 4, 128)), t((128,)))
    case("conv_out_s2d(co=4)+d2s", 2 * vox1 * 45 * 128 * 4,
         lambda x, w: depth_to_space_hw(conv3d_same(x, w, compute_dtype=bf)),
         t((B, 32, 64, 64, 128)), t((5, 3, 3, 128, 4)))
    from repmode_tpu.ops.conv3d import conv3d_same_tapmajor

    case("conv_out_tapmajor+d2s", 2 * vox1 * 45 * 128 * 4,
         lambda x, w: depth_to_space_hw(
             conv3d_same_tapmajor(x, w, compute_dtype=bf)),
         t((B, 32, 64, 64, 128)), t((5, 3, 3, 128, 4)))
    # (A dual K-major expansion for enc1 conv1 (ci=4) was tried and OOM'd:
    # every materialized 4-channel slice pads 32x on the lane axis — the
    # 45-slice concat needed 23.5G HBM. Rejected 2026-08-17.)
    case("L1_single_conv(128->128)", 2 * vox1 * 45 * 128 * 128,
         lambda x, w, b: cbr(x, w, b),
         t((B, 32, 64, 64, 128)), t((5, 3, 3, 128, 128)), t((128,)))

    # rearranges / concat (BW-bound; flops=0, report GB/s instead)
    case("s2d_input(1ch)", 0, space_to_depth_hw, t((B, 32, 128, 128, 1)))
    case("concat_L1", 0, lambda a, b2: jnp.concatenate([a, b2], -1),
         t((B, 32, 64, 64, 128)), t((B, 32, 64, 64, 128)))

    # resamples (as executed: s2d-domain downsample, native up + s2d)
    case("down_L1_s2d", 2 * (vox1 // 2) * 2 * 128 * 64,
         lambda x, w: downsample_s2d_domain(x, w, compute_dtype=bf),
         t((B, 32, 64, 64, 128)), t((2, 1, 1, 128, 64)))
    case("down_L2_s2d", 2 * (B * 8 * 32 * 32) * 2 * 256 * 128,
         lambda x, w: downsample_s2d_domain(x, w, compute_dtype=bf),
         t((B, 16, 32, 32, 256)), t((2, 1, 1, 256, 128)))
    case("up_L2toL1+s2d", 2 * (B * 32 * 128 * 128) * 64 * 32 // 8,
         lambda x, w: space_to_depth_hw(
             upsample2x_convt(x, w, compute_dtype=bf)),
         t((B, 16, 64, 64, 64)), t((2, 2, 2, 64, 32)))
    case("up_L3toL2+s2d", 2 * (B * 16 * 64 * 64) * 128 * 64 // 8,
         lambda x, w: space_to_depth_hw(
             upsample2x_convt(x, w, compute_dtype=bf)),
         t((B, 8, 32, 32, 128)), t((2, 2, 2, 128, 64)))
    # the PRODUCTION decoder routes (models/reparam.plain_forward_s2d):
    # in-domain upsamples that never materialize the narrow native tensor
    from repmode_tpu.ops.s2d import upsample_s2d_to_s2d, upsample_to_s2d

    case("up_L2toL1_prod(s2d->s2d)", 2 * (B * 32 * 128 * 128) * 64 * 32 // 8,
         lambda x, w: upsample_s2d_to_s2d(x, w, compute_dtype=bf),
         t((B, 16, 32, 32, 256)), t((2, 2, 2, 64, 32)))
    case("up_L3toL2_prod(native->s2d)", 2 * (B * 16 * 64 * 64) * 128 * 64 // 8,
         lambda x, w: upsample_to_s2d(x, w, compute_dtype=bf),
         t((B, 8, 32, 32, 128)), t((2, 2, 2, 128, 64)))
    case("down_L3_native", 2 * (B * 4 * 16 * 16) * 8 * 128 * 256,
         lambda x, w: downsample2x_conv(x, w, compute_dtype=bf),
         t((B, 8, 32, 32, 128)), t((2, 2, 2, 128, 256)))

    # deep native 5^3 chains
    def dchain(name, x, ci, cm, co):
        vx = int(np.prod(x.shape[:4]))
        case(name, 2 * vx * 125 * (ci * cm + cm * co), chain,
             x, t((5, 5, 5, ci, cm)), t((cm,)), t((5, 5, 5, cm, co)), t((co,)))

    dchain("L3_enc", t((B, 8, 32, 32, 128)), 128, 128, 128)
    dchain("L3_dec", t((B, 8, 32, 32, 256)), 256, 128, 128)
    dchain("L4_enc", t((B, 4, 16, 16, 256)), 256, 256, 256)
    dchain("L4_dec", t((B, 4, 16, 16, 512)), 512, 256, 256)
    dchain("bottle", t((B, 2, 8, 8, 512)), 512, 512, 512)

    only = set(args.only.split(",")) if args.only else None
    total = 0.0
    for name, flops, f, xs in cases:
        if only and name not in only:
            continue
        tt = timed(chained(f), *xs)
        total += tt
        rec = {"case": name, "ms": round(tt * 1e3, 3)}
        if flops:
            rec["tflops"] = round(flops / tt / 1e12, 1)
        gb = sum(int(np.prod(x.shape)) for x in xs if x.ndim == 5) * 2 / 1e9
        rec["in_gb_s"] = round(gb / tt, 0)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"sum_ms": round(total * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
