"""A/B on the real chip: XLA conv vs pallas_conv3d_same_persample at EVAL shapes.

The per-sample merged-kernel Pallas path cut the train step 642 -> 366 ms and
its xplane self-times read >90% MFU at L1 — but trace self-times exclude
overlapped DMA waits, while the dpad eval kernel measured only parity (±5%)
against XLA under chained wall-clock timing (ARCHITECTURE.md §9). This script
settles whether the persample kernel's execution actually beats XLA's conv at
the re-parameterized EVAL shapes (one shared kernel per batch, s2d domain),
using the same chained-in-jit timing protocol as tools/bench_chain.py.

Usage: python tools/bench_ps_eval.py [--batch 16] [--repeats 6] [--inner 8]
"""

import argparse
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

    from repmode_tpu.ops.conv3d import conv3d_same
    from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_same_persample

    R = args.inner

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
        def run(x0):
            def body(_i, carry):
                x, _ = carry
                y = f(x)
                s = y.reshape(-1)[0].astype(x0.dtype)
                return (x0 + s * 1e-30, s)

            _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros((), x0.dtype)))
            return s

        return run

    B = args.batch
    key = jax.random.PRNGKey(0)
    # eval s2d-domain shapes: (name, x shape, kernel ci->co)
    cases = [
        ("L1 128->128", (B, 32, 64, 64, 128), (5, 3, 3, 128, 128)),
        ("L1dec 256->128", (B, 32, 64, 64, 256), (5, 3, 3, 256, 128)),
        ("L2 256->256", (B, 16, 32, 32, 256), (5, 3, 3, 256, 256)),
    ]
    for name, xs, ws in cases:
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, xs, jnp.bfloat16)
        w = (jax.random.normal(k2, ws, jnp.float32) * 0.05).astype(jnp.bfloat16)
        b = jnp.zeros((ws[-1],), jnp.bfloat16)
        wn = jnp.broadcast_to(w[None], (B,) + ws)

        flops = 2 * np.prod(xs[:4]) * np.prod(ws[:3]) * ws[3] * ws[4]

        def f_xla(xx):
            y = conv3d_same(xx, w, compute_dtype=jnp.bfloat16,
                            accum_dtype=None)
            return jax.nn.relu(y + b)

        def f_ps(xx):
            y = pallas_conv3d_same_persample(xx, wn)
            return jax.nn.relu(y + b)

        t_xla = timed(chained(f_xla), x)
        t_ps = timed(chained(f_ps), x)
        print(
            f"{name}: xla {t_xla*1e3:7.2f} ms ({flops/t_xla/1e12:6.1f} TF) | "
            f"pallas_ps {t_ps*1e3:7.2f} ms ({flops/t_ps/1e12:6.1f} TF) | "
            f"speedup {t_xla/t_ps:.3f}"
        )


if __name__ == "__main__":
    main()
