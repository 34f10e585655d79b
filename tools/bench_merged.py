"""Per-sample merged-kernel MoDE conv vs 5-conv expert sum, on chip.

The expert-sum path (ops/mode.py) runs 5 shared-kernel convs per MoDE layer:
in the s2d domain the tap totals are 45+12+1+12+45 (k5/k3/k1 + two composed
dense avg branches) = 2.56x the taps of ONE merged 45-tap conv. The reference
merges kernels per sample (RepMode.py:171-192) but per-sample kernels need a
batch-grouped conv, historically MXU-hostile. This tool measures, at the real
train shapes, forward and forward+backward of:

  expert_sum   the shipping path (mode_conv_expert_sum_s2d_domain)
  merged_vmap  per-sample merged s2d kernel + vmapped conv (XLA lowers to a
               batch-grouped conv)

If merged_vmap wins despite the grouped lowering, the 2.56x FLOP cut is the
backward-pass fix VERDICT r2 item 3 asks for.

Usage: python tools/bench_merged.py [--repeats 3] [--inner 2]
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
    ap.add_argument("--inner", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cases", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.mode import (
        ExpertKernels,
        mode_conv_expert_sum,
        mode_conv_expert_sum_s2d_domain,
        mode_conv_merged,
        mode_conv_merged_s2d_domain,
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

    # native-channel sizes per level; s2d tensor shapes at train scale.
    # Deep levels (domain="native") probe the latency-bound small-spatial
    # blocks (bench_bwd: enc3..dec3 fwd 15-23 ms each on ~2 ms of FLOPs).
    cases = {
        # (x shape, ci_nat, co_nat, domain)
        "L1_conv": ((B, 32, 64, 64, 4 * 32), 32, 32, "s2d"),
        "L2_conv": ((B, 16, 32, 32, 4 * 64), 64, 64, "s2d"),
        "L3_conv": ((B, 8, 16, 16, 128), 128, 128, "native"),
        "L4_conv": ((B, 4, 8, 8, 256), 256, 256, "native"),
        "bottle_conv": ((B, 2, 8, 8, 512), 512, 512, "native"),
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

    for name, (xshape, ci, co, domain) in cases.items():
        x2 = mk(xshape, 1.0)
        ek = mk_ek(ci, co)
        g = jax.nn.softmax(mk((B, E, co), 1.0), axis=1)

        if domain == "s2d":
            impls = {
                "expert_sum": lambda x, e, gg: mode_conv_expert_sum_s2d_domain(
                    x, e, gg, compute_dtype=jnp.bfloat16
                ),
                "merged_vmap": lambda x, e, gg: mode_conv_merged_s2d_domain(
                    x, e, gg, compute_dtype=jnp.bfloat16
                ),
            }
        else:
            impls = {
                "expert_sum": lambda x, e, gg: mode_conv_expert_sum(
                    x, e, gg, compute_dtype=jnp.bfloat16
                ),
                "merged_vmap": lambda x, e, gg: mode_conv_merged(
                    x, e, gg, compute_dtype=jnp.bfloat16
                ),
            }

        ref = None
        for iname, impl in impls.items():
            def loss(xx, eek, gg):
                return jnp.sum(impl(xx, eek, gg).astype(jnp.float32) ** 2)

            @jax.jit
            def fwd_chain(x0, eek, gg):
                def body(_i, carry):
                    x, _ = carry
                    s = loss(x, eek, gg)
                    return (x0 * (1.0 + s * 1e-30), s)
                _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
                return s

            @jax.jit
            def fb_chain(x0, eek, gg):
                def body(_i, carry):
                    x, _ = carry
                    gx, ge, ggr = jax.grad(loss, argnums=(0, 1, 2))(x, eek, gg)
                    s = (jnp.sum(gx.reshape(-1)[:1])
                         + ge.w5.reshape(-1)[0] + ggr.reshape(-1)[0])
                    return (x0 * (1.0 + s * 1e-30), s)
                _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
                return s

            # numerical check vs expert_sum (fp32-ish tolerance for bf16)
            y = impl(x2, ek, g)
            if ref is None:
                ref = y
                relerr = 0.0
            else:
                relerr = float(
                    jnp.linalg.norm((y - ref).astype(jnp.float32))
                    / jnp.linalg.norm(ref.astype(jnp.float32))
                )

            tf = timed(fwd_chain, x2, ek, g)
            tfb = timed(fb_chain, x2, ek, g)
            print(json.dumps({
                "case": name, "impl": iname,
                "fwd_ms": round(tf * 1e3, 2),
                "fwdbwd_ms": round(tfb * 1e3, 2),
                "bwd_ms": round((tfb - tf) * 1e3, 2),
                "rel_err_vs_expert_sum": round(relerr, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
