"""enc1 conv1 (s2d ci=4) K-contraction experiments, on the real chip.

The eval forward's last named edge (ARCHITECTURE.md §10): the encoder1
conv1 in the s2d domain contracts K=4 input channels — 6.8 ms/batch at
~14 TF, an MXU lane floor. The round-2 "dual K-major expansion" was
rejected because XLA materialized each 4-lane shifted slice padded 32x
(23.5 GB for the 45-slice concat). These variants fold TAPS into the
contraction instead, with bounded materializations:

  A. baseline: conv3d_same (5,3,3) ci=4 -> co=128
  B. d-fold:  concat 5 depth shifts -> ci=20, conv (1,3,3)
  C. hw-fold: concat 9 h/w shifts  -> ci=36, conv (5,1,1)
  D. full-fold: concat 45 shifts   -> ci=180, pointwise einsum
  E. dw-fold: concat 15 d/w shifts -> ci=60, conv (1,3,1)

All bit-checked against A (bf16 compute, fp32 accum) before timing.

Usage: python tools/bench_enc1.py [--batch 16] [--repeats 6] [--inner 8]
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
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--variants", default="ABCDE",
                    help="subset of variants to run (tunnel compiles are "
                         "~40s each; split across invocations)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.ops.conv3d import conv3d_same

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
    k1, k2 = jax.random.split(key)
    xs = (B, 32, 64, 64, 4)
    ws = (5, 3, 3, 4, 128)
    x = jax.random.normal(k1, xs, jnp.bfloat16)
    w = (jax.random.normal(k2, ws, jnp.float32) * 0.2).astype(jnp.bfloat16)
    flops = 2 * np.prod(xs[:4]) * np.prod(ws[:3]) * ws[3] * ws[4]

    def shift(h, axis, s):
        """x shifted so out[d] = x[d+s], zero-padded ('same' conv reach)."""
        pad = [(0, 0)] * h.ndim
        if s >= 0:
            pad[axis] = (0, s)
            sl = [slice(None)] * h.ndim
            sl[axis] = slice(s, None)
        else:
            pad[axis] = (-s, 0)
            sl = [slice(None)] * h.ndim
            sl[axis] = slice(None, s)
        return jnp.pad(h[tuple(sl)], pad)

    def f_a(xx):
        return conv3d_same(xx, w, compute_dtype=jnp.bfloat16)

    def f_b(xx):
        xd = jnp.concatenate([shift(xx, 1, s) for s in range(-2, 3)], -1)
        wf = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(1, 3, 3, 20, 128)
        return conv3d_same(xd, wf, compute_dtype=jnp.bfloat16)

    def f_c(xx):
        xhw = jnp.concatenate(
            [shift(shift(xx, 2, sy), 3, sx)
             for sy in range(-1, 2) for sx in range(-1, 2)], -1)
        wf = jnp.transpose(w, (0, 1, 2, 3, 4)).reshape(5, 1, 1, 36, 128)
        return conv3d_same(xhw, wf, compute_dtype=jnp.bfloat16)

    def f_d(xx):
        x45 = jnp.concatenate(
            [shift(shift(shift(xx, 1, sz), 2, sy), 3, sx)
             for sz in range((-2), 3)
             for sy in range(-1, 2) for sx in range(-1, 2)], -1)
        wf = w.reshape(45 * 4, 128)
        y = jnp.einsum("ndhwk,kc->ndhwc", x45, wf,
                       preferred_element_type=jnp.float32)
        return y

    def f_e(xx):
        xdw = jnp.concatenate(
            [shift(shift(xx, 1, sz), 3, sx)
             for sz in range(-2, 3) for sx in range(-1, 2)], -1)
        # channel order (sz, sx, ci); kernel tap dy remains
        wf = jnp.transpose(w, (1, 0, 2, 3, 4)).reshape(1, 3, 1, 60, 128)
        return conv3d_same(xdw, wf, compute_dtype=jnp.bfloat16)

    ref = np.asarray(jax.jit(f_a)(x), np.float32)
    fns = {"A": ("A conv ci=4", f_a), "B": ("B d-fold ci=20", f_b),
           "C": ("C hw-fold ci=36", f_c), "D": ("D full-fold ci=180", f_d),
           "E": ("E dw-fold ci=60", f_e)}
    for v in args.variants:
        name, f = fns[v]
        got = np.asarray(jax.jit(f)(x), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        t = timed(chained(f), x)
        print(f"{name}: {t*1e3:7.2f} ms ({flops/t/1e12:6.1f} TF) "
              f"rel-err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
