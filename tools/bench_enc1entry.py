"""A/B the U-Net entry: s2d-of-input + enc1 conv1 vs fused formulations.

The §10 edge map leaves ~11.6 ms/batch at the entry: space_to_depth of the
1-channel input (4-lane output layout, ~4 GB/s) followed by the ci=4 s2d
conv (K=4 contraction, ~14 TF). Both exist only because the native-domain
entry conv (reference RepMode.py:56, the first MoDEConv of encoder_block1
after re-parameterization) is executed in the s2d domain.

Candidates, all computing the SAME function (verified here vs the shipping
pair):

  ship      space_to_depth_hw(x) -> conv3d_same(w2 (5,3,3,4,128)) + bias/relu
  wbig      ONE strided conv from the native input: out2[h',w',(q,y,o)] =
            native out[2h'+q, 2w'+y, o], so a (5,6,6,1,4Co) kernel with
            window_strides (1,2,2) and padding (2,2)(2,3)(2,3) emits the
            s2d-domain tensor directly — no s2d of the input at all (same
            trick as ops/s2d.upsample_to_s2d's phase-block weights).
  patches   lax.conv_general_dilated_patches (5,6,6)/s2 -> (...,180) then a
            single (180 -> 128) GEMM: forces the K=180 contraction XLA's
            conv lowering won't form on its own.

Usage: python tools/bench_enc1entry.py [--batch 16] [--repeats 6] [--inner 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def wbig_kernel(w, co):
    """(5,5,5,1,Co) native kernel -> (5,6,6,1,4Co) strided s2d-emitting form.

    wb[kz, q+ky, y+kx, 0, (q,y,o)] = w[kz, ky, kx, 0, o]; with strides
    (1,2,2) and pad (2,3) the conv output at (d, h', w') reads native rows
    2h'-2..2h'+3, so channel (q,y,o) receives native out[d, 2h'+q, 2w'+y, o].
    """
    import jax.numpy as jnp

    wb = jnp.zeros((w.shape[0], 6, 6, 1, 4 * co), w.dtype)
    for q in range(2):
        for y in range(2):
            c0 = (q * 2 + y) * co
            wb = wb.at[:, q:q + 5, y:y + 5, :, c0:c0 + co].set(w)
    return wb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--only", default="",
                    help="comma-separated case filter (ship,wbig,patches)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from repmode_tpu.ops.conv3d import DIMNUMS, conv3d_same
    from repmode_tpu.ops.s2d import s2d_bias, s2d_conv_kernel, space_to_depth_hw

    R = args.inner
    B = args.batch
    bf = jnp.bfloat16
    co = 32
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((B, 32, 128, 128, 1)) * 0.1, bf)
    w = jnp.asarray(rng.standard_normal((5, 5, 5, 1, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)

    w2 = s2d_conv_kernel(w).astype(bf)      # (5,3,3,4,128)
    b2 = s2d_bias(b)                        # (128,)
    wb = wbig_kernel(w, co).astype(bf)      # (5,6,6,1,128)
    wflat = wb.reshape(5 * 6 * 6, 4 * co)   # (180,128) for the patches GEMM

    def ship(xn):
        x2 = space_to_depth_hw(xn)
        return jax.nn.relu(conv3d_same(x2, w2, compute_dtype=bf) + b2)

    def wbig(xn):
        y = lax.conv_general_dilated(
            xn.astype(bf), wb, (1, 2, 2),
            ((2, 2), (2, 3), (2, 3)),
            dimension_numbers=DIMNUMS,
            preferred_element_type=jnp.float32,
        )
        return jax.nn.relu(y + b2).astype(bf)

    def patches(xn):
        p = lax.conv_general_dilated_patches(
            xn.astype(bf), (5, 6, 6), (1, 2, 2),
            ((2, 2), (2, 3), (2, 3)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )  # (B,32,64,64,180), channel-major (ci=1 so tap-major)
        y = jnp.einsum("ndhwk,kc->ndhwc", p, wflat,
                       preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b2).astype(bf)

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    # correctness first (bf16 compute on both sides; rtol covers rounding)
    ref = np.asarray(ship(x), np.float32)
    for name, f in (("wbig", wbig), ("patches", patches)):
        if not want(name):
            continue
        got = np.asarray(f(x), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(json.dumps({"check": name, "max_rel_err": float(err)}),
              flush=True)
        assert err < 5e-2, (name, err)

    def chained(f):
        @jax.jit
        def run(x0):
            def body(_i, carry):
                xc, _ = carry
                y = f(xc)
                s = y.reshape(-1)[0].astype(x0.dtype)
                return (x0 + s * 1e-30, s)

            _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros((), x0.dtype)))
            return s

        return run

    flops = 2 * B * 32 * 64 * 64 * 45 * 4 * 128
    for name, f in (("ship", ship), ("wbig", wbig), ("patches", patches)):
        if not (want(name) or name == "ship"):
            continue
        run = chained(f)
        _ = float(run(x))
        times = []
        for _i in range(args.repeats):
            t0 = time.perf_counter()
            _ = float(run(x))
            times.append(time.perf_counter() - t0)
        ms = sorted(times)[len(times) // 2] / R * 1e3
        print(json.dumps({
            "case": name, "ms": round(ms, 3),
            "tflops": round(flops / (ms * 1e-3) / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
