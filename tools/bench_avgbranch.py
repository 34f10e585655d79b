"""Avg-pool expert branch in the s2d domain: composed-dense conv vs
box-pool + pointwise, forward and forward+backward, on chip.

The composed-dense form (round 2) made the FORWARD cheap but its VJP runs a
full 45/27-tap dW conv and a 45/27-tap dx conv per branch — while the
branch's only true parameters are the pointwise Ci x Co. The box form
(ops/s2d.box_pool_s2d: phase-mixing shifted adds, no d2s rearrangement)
makes AD produce shifted adds + a pointwise dW instead.

Usage: python tools/bench_avgbranch.py [--repeats 3] [--inner 8]
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
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.conv3d import conv3d_same
    from repmode_tpu.ops.s2d import (
        box_pool_s2d,
        s2d_conv1_kernel,
        s2d_conv_kernel,
    )

    R = args.inner
    B = args.batch
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    cases = {
        "L1_a5": ((B, 32, 64, 64, 4 * 32), 32, 32, 5),
        "L1_a3": ((B, 32, 64, 64, 4 * 32), 32, 32, 3),
        "L2_a5": ((B, 16, 32, 32, 4 * 64), 64, 64, 5),
    }

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

    for name, (xshape, ci, co, k) in cases.items():
        x2 = mk(xshape, 1.0)
        w1 = mk((1, 1, 1, ci, co))
        ones = jnp.full((k, k, k, 1, 1), 1.0 / k**3, jnp.float32)

        def dense(xx, ww):
            kd = s2d_conv_kernel(ones * ww).astype(jnp.bfloat16)
            return conv3d_same(xx.astype(jnp.bfloat16), kd, accum_dtype=None)

        def box(xx, ww):
            kp = s2d_conv1_kernel(ww * (1.0 / k**3)).astype(jnp.bfloat16)
            p = box_pool_s2d(xx.astype(jnp.bfloat16), k)
            return conv3d_same(p, kp, accum_dtype=None)

        for iname, impl in (("dense", dense), ("box", box)):
            def loss(xx, ww):
                return jnp.sum(impl(xx, ww).astype(jnp.float32) ** 2)

            @jax.jit
            def fwd_chain(x0, ww):
                def body(_i, carry):
                    xc, _ = carry
                    return (x0 * (1.0 + loss(xc, ww) * 1e-30), loss(xc, ww))
                _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
                return s

            @jax.jit
            def fb_chain(x0, ww):
                def body(_i, carry):
                    xc, _ = carry
                    gx, gw = jax.grad(loss, argnums=(0, 1))(xc, ww)
                    s = jnp.sum(gx.reshape(-1)[:1]) + gw.reshape(-1)[0]
                    return (x0 * (1.0 + s * 1e-30), s)
                _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
                return s

            tf = timed(fwd_chain, x2, w1)
            tfb = timed(fb_chain, x2, w1)
            print(json.dumps({
                "case": name, "impl": iname,
                "fwd_ms": round(tf * 1e3, 2),
                "fwdbwd_ms": round(tfb * 1e3, 2),
                "bwd_ms": round((tfb - tf) * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
