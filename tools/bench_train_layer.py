"""Decompose one train-mode MoDE layer at L1 scale on chip.

The full train-mode forward measured 487.9 ms (tools/bench_train.py
--decomp) vs ~80 ms for the reparam eval forward at the same batch — this
tool times each component of mode_conv_expert_sum_s2d_domain plus
train-mode BatchNorm at the L1 shape (batch 8, s2d (8,32,64,64,128)).

Historical finding (2026-08-17): the layer measured 83 ms, of which the two
explicit s2d-domain box pools were 35.7 + 38.7 ms (their per-phase slicing
materializes 32-lane-minor tensors); every conv was ~6 ms. The pools were
then COMPOSED into dense s2d convs (ops/mode.py) and the pool op removed.

Chained-in-jit harness (see bench_chain.py).

Usage: python tools/bench_train_layer.py [--repeats 6] [--inner 8]
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
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.conv3d import conv3d_same
    from repmode_tpu.ops.mode import (
        ExpertKernels,
        gate_logits_to_weights,
        mode_conv_expert_sum_s2d_domain,
    )
    from repmode_tpu.ops.s2d import s2d_conv1_kernel, s2d_conv_kernel

    R = args.inner
    bf = jnp.bfloat16

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
    B, ci, co = 8, 32, 32  # native L1 channels; s2d = 128
    x2 = jnp.asarray(
        rng.standard_normal((B, 32, 64, 64, 4 * ci)) * 0.1, jnp.float32
    )
    ek = ExpertKernels(
        *[jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32) for s in [
            (5, 5, 5, ci, co), (3, 3, 3, ci, co), (1, 1, 1, ci, co),
            (1, 1, 1, ci, co), (1, 1, 1, ci, co)]]
    )
    g = gate_logits_to_weights(
        jnp.asarray(rng.standard_normal((B, 5 * co)), jnp.float32), 5, co
    )

    k5 = s2d_conv_kernel(ek.w5)
    k3 = s2d_conv_kernel(ek.w3)
    k1 = s2d_conv1_kernel(ek.w1)

    cases = {
        "full_layer": lambda x, g_: mode_conv_expert_sum_s2d_domain(
            x, ek, g_, compute_dtype=bf),
        "y5_conv45": lambda x: conv3d_same(
            x, k5, compute_dtype=bf, accum_dtype=None),
        "y3_conv27": lambda x: conv3d_same(
            x, k3, compute_dtype=bf, accum_dtype=None),
        "y1_pointwise": lambda x: conv3d_same(
            x, k1, compute_dtype=bf, accum_dtype=None),
        "gated_combine_5term": lambda x, g_: sum(
            jnp.tile(g_[:, e], (1, 4))[:, None, None, None, :] *
            x.astype(jnp.float32)
            for e in range(5)
        ),
    }

    for name, f in cases.items():
        fargs = (x2, g) if "g_" in f.__code__.co_varnames else (x2,)
        t = timed(chained(f), *fargs)
        print(json.dumps({"case": name, "ms": round(t * 1e3, 3)}), flush=True)

    # train-mode BatchNorm at the same shape (flax semantics: batch stats
    # in fp32 over N,D,H,W)
    import flax.linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = bn.init(jax.random.PRNGKey(0), x2)

    def bn_apply(x):
        y, _ = bn.apply(v, x, mutable=["batch_stats"])
        return y

    t = timed(chained(bn_apply), x2)
    print(json.dumps({"case": "batchnorm_train", "ms": round(t * 1e3, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
