"""Per-block forward AND forward+backward timing of the train step, on chip.

Round-2 left the 433 ms backward pass undecomposed (ARCHITECTURE.md §10:
fwd 268 / bwd 433 / opt ~12 at batch 8 x 32x128x128 bf16). This tool times
every U-Net block of the train-mode RepModeNet at its full-scale shape —
forward alone and forward+grad (w.r.t. input AND params) — so the backward
cost attributes per block: bwd_ms = (fwd+bwd) - fwd.

Chained-in-jit harness (bench_chain.py pattern: R applications inside one
jit, one scalar fetched) — per tpu-bench-harness rules, never fetch arrays.

Usage: python tools/bench_bwd.py [--repeats 5] [--inner 4] [--blocks enc1,...]
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
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--blocks", type=str, default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.config import ModelConfig
    from repmode_tpu.models.repmode import (
        MoDEConv,
        MoDEDecoderBlock,
        MoDEEncoderBlock,
        MoDESubNet2Conv,
    )

    R = args.inner
    B = args.batch
    E, T = 5, 12
    cfg = ModelConfig()  # mult_chan 32, depth 4, k 5, train_s2d default
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)

    emb = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, T, B), jnp.int32), T, dtype=jnp.float32
    )

    # Block zoo at the reference recipe's full-scale train shapes
    # (batch 8 x 32x128x128 input, mult_chan 32, depth 4; s2d levels {1,2}).
    # Each case: (module, example_inputs) where inputs[0] is differentiated.
    def enc(i, cin, cout, s2d, shape):
        m = MoDEEncoderBlock(E, T, cin, cout, cfg, cdt, s2d=s2d)
        return m, (mk(shape),)

    def dec(i, cin, cout, s2d, xshape, skipshape):
        m = MoDEDecoderBlock(E, T, cin, cout, cfg, cdt, s2d=s2d)
        return m, (mk(xshape), mk(skipshape))

    cases = {
        # encoder path (skips returned in-domain)
        "enc1_s2d": enc(1, 1, 32, True, (B, 32, 128, 128, 1)),
        "enc2_s2d": enc(2, 32, 64, True, (B, 16, 64, 64, 32)),
        "enc3": enc(3, 64, 128, False, (B, 8, 32, 32, 64)),
        "enc4": enc(4, 128, 256, False, (B, 4, 16, 16, 128)),
        "bottle": (
            MoDESubNet2Conv(E, T, 256, 512, cfg, cdt),
            (mk((B, 2, 8, 8, 256)),),
        ),
        "dec4": dec(4, 512, 256, False, (B, 2, 8, 8, 512), (B, 4, 16, 16, 256)),
        "dec3": dec(3, 256, 128, False, (B, 4, 16, 16, 256), (B, 8, 32, 32, 128)),
        # s2d decoders: x arrives native, skip arrives in the s2d domain
        "dec2_s2d": dec(2, 128, 64, True, (B, 8, 32, 32, 128),
                        (B, 16, 32, 32, 256)),
        "dec1_s2d": dec(1, 64, 32, True, (B, 16, 64, 64, 64),
                        (B, 32, 64, 64, 128)),
        "conv_out_s2d": (
            MoDEConv(num_experts=E, num_tasks=T, in_chan=32, out_chan=1,
                     kernel_size=5, conv_type="final", compute_dtype=cdt,
                     domain="s2d"),
            (mk((B, 32, 64, 64, 128)),),
        ),
    }
    if args.blocks:
        keep = set(args.blocks.split(","))
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

    total_f, total_fb = 0.0, 0.0
    for name, (mod, xs) in cases.items():
        variables = mod.init(jax.random.PRNGKey(0), *xs, emb, train=True)

        # NOTE: extra inputs (decoder skips, up to 536 MB) must be jit
        # ARGUMENTS — closing over them bakes them into the HLO as
        # constants, which blows the remote-compile body limit (HTTP 413).
        def apply_loss(inp, rest, params, batch_stats):
            out, _ = mod.apply(
                {"params": params, "batch_stats": batch_stats},
                inp, *rest, emb, train=True, mutable=["batch_stats"],
            )
            if isinstance(out, tuple):  # encoder returns (down, skip)
                return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        @jax.jit
        def fwd_chain(x0, rest, params, batch_stats):
            def body(_i, carry):
                x, _ = carry
                s = apply_loss(x, rest, params, batch_stats)
                return (x0 * (1.0 + s * 1e-30), s)

            _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
            return s

        @jax.jit
        def fwdbwd_chain(x0, rest, params, batch_stats):
            def body(_i, carry):
                x, _ = carry
                gx, gp = jax.grad(apply_loss, argnums=(0, 2))(
                    x, rest, params, batch_stats
                )
                s = jnp.sum(gx.reshape(-1)[:1]) + jax.tree.leaves(gp)[0].reshape(-1)[0]
                return (x0 * (1.0 + s * 1e-30), s)

            _, s = jax.lax.fori_loop(0, R, body, (x0, jnp.zeros(())))
            return s

        p, bs = variables["params"], variables.get("batch_stats", {})
        tf = timed(fwd_chain, xs[0], list(xs[1:]), p, bs)
        tfb = timed(fwdbwd_chain, xs[0], list(xs[1:]), p, bs)
        total_f += tf
        total_fb += tfb
        print(json.dumps({
            "block": name,
            "fwd_ms": round(tf * 1e3, 2),
            "fwdbwd_ms": round(tfb * 1e3, 2),
            "bwd_ms": round((tfb - tf) * 1e3, 2),
        }), flush=True)

    print(json.dumps({
        "block": "TOTAL",
        "fwd_ms": round(total_f * 1e3, 1),
        "fwdbwd_ms": round(total_fb * 1e3, 1),
        "bwd_ms": round((total_fb - total_f) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
