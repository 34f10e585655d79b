"""Chain-level bench on the real chip: XLA vs the Pallas dpad chain.

Times each s2d level's double conv (conv1+bias+relu -> conv2+bias+relu) the
way plain_forward_s2d_pallas actually executes it (depth-padded activations,
pallas_conv3d_dpad per conv) against the XLA path (conv3d_same), to judge
VERDICT r1 weak #2 at the granularity that matters end-to-end.

Measurement: the tunneled chip costs ~31 ms per scalar fetch
(ARCHITECTURE.md §8), so each timed sample runs R sequential applications
inside ONE jit — iteration i+1's input depends on iteration i's output via
a negligible scalar perturbation (x0 + s*1e-30, not constant-foldable), and
the per-application time is t/R with a single end fetch.

Usage: python tools/bench_chain.py [--batch 16] [--repeats 8] [--inner 8]
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
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.conv3d import conv3d_same
    from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_dpad

    R = args.inner

    def timed(fn, *fargs):
        """Median per-application seconds of R chained applications."""
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
        """jit of R sequential f applications with forced data dependency.

        x0 must arrive as the jit ARGUMENT (closing over a concrete device
        array would bake a ~1GB constant into the program and stall the
        remote compile — same failure mode the device sampler hit).
        """

        @jax.jit
        def run(x0):
            def body(_i, carry):
                x, _ = carry
                y = f(x)
                s = y.reshape(-1)[0].astype(x0.dtype)
                return (x0 + s * 1e-30, s)

            _, s = jax.lax.fori_loop(
                0, R, body, (x0, jnp.zeros((), x0.dtype))
            )
            return s

        return run

    B = args.batch
    # (name, x NDHWC native, cm, co): the two s2d levels' double convs
    cases = [
        ("L1_enc", (B, 32, 64, 64, 128), 128, 128),
        ("L1_dec", (B, 32, 64, 64, 256), 128, 128),
        ("L2_enc", (B, 16, 32, 32, 256), 256, 256),
        ("L2_dec", (B, 16, 32, 32, 512), 256, 256),
    ]

    rng = np.random.default_rng(0)
    for name, xs, cm, co in cases:
        ci = xs[-1]
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((5, 3, 3, ci, cm)) * 0.05,
                         jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((cm,)), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((5, 3, 3, cm, co)) * 0.05,
                         jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        vox = int(np.prod(xs[:4]))
        flops = 2 * vox * 45 * (ci * cm + cm * co)

        def xla_chain(x_):
            return jax.nn.relu(
                conv3d_same(
                    jax.nn.relu(
                        conv3d_same(x_, w1, compute_dtype=jnp.bfloat16) + b1
                    ),
                    w2, compute_dtype=jnp.bfloat16,
                ) + b2
            )

        t_xla = timed(chained(xla_chain), x)

        def pal_chain(x_):
            xp = jnp.pad(x_.astype(jnp.bfloat16),
                         ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
            y1 = pallas_conv3d_dpad(xp, w1, b1, relu=True)
            return pallas_conv3d_dpad(y1, w2, b2, relu=True)

        t_pal = timed(chained(pal_chain), x)

        # steady-state: input already padded (as inside the forward chain)
        xp0 = jnp.pad(x.astype(jnp.bfloat16),
                      ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))

        def pal_padded(xp_):
            y1 = pallas_conv3d_dpad(xp_, w1, b1, relu=True)
            return pallas_conv3d_dpad(y1, w2, b2, relu=True)

        t_palp = timed(chained(pal_padded), xp0)

        print(json.dumps({
            "case": name, "x": list(xs), "cm": cm, "co": co,
            "gflop": round(flops / 1e9, 1),
            "xla_ms": round(t_xla * 1e3, 3),
            "xla_tflops": round(flops / t_xla / 1e12, 1),
            "pallas_ms": round(t_pal * 1e3, 3),
            "pallas_padded_ms": round(t_palp * 1e3, 3),
            "pallas_tflops": round(flops / t_palp / 1e12, 1),
            "speedup_vs_xla": round(t_xla / t_palp, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
