"""A/B lowerings of the in-domain decoder upsamples (ops/s2d.py).

The production upsample_s2d_to_s2d runs einsum -> 8D interleave transpose ->
reshape; measured 5.9 ms / 23 GB/s at the L2->L1 eval shape (bench_edges
2026-08-20). Variants:

  cur      the shipping form (separate transpose op)
  direct   einsum emits the final dim ORDER directly (n,d,a,h,p,w,x,k) so the
           relayout can fold into the dot's output layout; reshape is free
  d2s      einsum to phase-last (n,d,h,w,a,p,x,k) then one depth_to_space-
           style collapse per axis pair

Usage: python tools/bench_up_variants.py [--batch 16]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.s2d import upsample_s2d_to_s2d

    bf = jnp.bfloat16
    B = args.batch
    rng = np.random.default_rng(0)
    # L2->L1: x2 (B,16,32,32,256) s2d L2, w (2,2,2,64,32) -> (B,32,64,64,128)
    x2 = jnp.asarray(rng.standard_normal((B, 16, 32, 32, 256)) * 0.1, bf)
    w = jnp.asarray(rng.standard_normal((2, 2, 2, 64, 32)) * 0.1, jnp.float32)

    def cur(x, wk):
        return upsample_s2d_to_s2d(x, wk, compute_dtype=bf)

    def direct(x, wk):
        n, d, hh, ww, c4 = x.shape
        ci = c4 // 4
        co = wk.shape[-1]
        xv = x.astype(bf).reshape(n, d, hh, ww, 2, 2, ci)
        wm = wk.astype(bf).transpose(3, 0, 1, 2, 4).reshape(ci, 2, 4 * co)
        y = jnp.einsum("ndhwpxi,iak->ndahpwxk", xv, wm).astype(bf)
        return y.reshape(n, 2 * d, 2 * hh, 2 * ww, 4 * co)

    def d2s(x, wk):
        n, d, hh, ww, c4 = x.shape
        ci = c4 // 4
        co = wk.shape[-1]
        xv = x.astype(bf).reshape(n, d, hh, ww, 2, 2, ci)
        wm = wk.astype(bf).transpose(3, 0, 1, 2, 4).reshape(ci, 2, 4 * co)
        y = jnp.einsum("ndhwpxi,iak->ndhwapxk", xv, wm).astype(bf)
        # collapse (d,a), (h,p), (w,x) one axis pair at a time
        y = y.transpose(0, 1, 4, 2, 3, 5, 6, 7).reshape(
            n, 2 * d, hh, ww, 2, 2, 4 * co)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            n, 2 * d, 2 * hh, ww, 2, 4 * co)
        return y.transpose(0, 1, 2, 3, 4, 5).reshape(
            n, 2 * d, 2 * hh, 2 * ww, 4 * co)

    ref = np.asarray(cur(x2, w), np.float32)
    for name, f in (("direct", direct), ("d2s", d2s)):
        got = np.asarray(f(x2, w), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(json.dumps({"check": name, "max_rel_err": float(err)}),
              flush=True)
        assert err < 2e-2, (name, err)

    R = args.inner

    def chained(f):
        @jax.jit
        def run(x0):
            def body(_i, carry):
                xc, _ = carry
                y = f(xc, w)
                s = y.reshape(-1)[0].astype(x0.dtype)
                return (x0 + s * 1e-30, s)

            _, s = jax.lax.fori_loop(0, R, body,
                                     (x0, jnp.zeros((), x0.dtype)))
            return s

        return run

    out_bytes = B * 32 * 64 * 64 * 128 * 2
    for name, f in (("cur", cur), ("direct", direct), ("d2s", d2s)):
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
            "out_gb_s": round(out_bytes / (ms * 1e-3) / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
