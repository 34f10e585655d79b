"""Time the full re-parameterized forward on chip: XLA vs Pallas path.

Isolates the network forward (batch of eval patches) from the tiled
predictor so the end-to-end bench decomposes into
    volume_time = n_batches * t_forward + overhead(gather/stitch/divide)
and the VERDICT r1 question "does the Pallas path beat XLA on the full
reparam forward" gets a direct, soundly-measured answer (chained-in-jit
harness — per-application time, single scalar fetch per sample).

Usage: python tools/bench_forward.py [--batch 16] [--repeats 6] [--inner 4]
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
    ap.add_argument("--inner", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.config import Config, EvalConfig, TrainConfig
    from repmode_tpu.models.reparam import make_inference
    from repmode_tpu.train.state import create_train_state
    from repmode_tpu.utils.flops import tiled_inference_flops

    R = args.inner
    B = args.batch
    patch = (32, 128, 128)

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
        """f(x, *rest) -> jit(run)(x0, *rest). Everything big (input AND
        params) must be a jit argument — closures bake device arrays into
        the program as constants and blow the remote-compile size limit."""

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
    x = jnp.asarray(
        rng.standard_normal((B,) + patch + (1,)).astype(np.float32)
    )

    fl = tiled_inference_flops(Config().model, (32, 624, 924), patch)
    patch_flops = fl["total_flops"] / fl["n_patches"] * B

    out = {}
    for name, pallas in (("xla", False), ("pallas", True)):
        cfg = Config(
            train=TrainConfig(batch_size_eval=B, compute_dtype="bfloat16"),
            eval=EvalConfig(pallas_conv=pallas),
        )
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        prepare, forward = make_inference(cfg)
        plain = prepare(state.variables, 0)
        t = timed(chained(lambda x_, p: forward(p, x_)), x, plain)
        out[name] = {
            "ms_per_batch": round(t * 1e3, 3),
            "tflops": round(patch_flops / t / 1e12, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)

    out["speedup_pallas_vs_xla"] = round(
        out["xla"]["ms_per_batch"] / out["pallas"]["ms_per_batch"], 3
    )
    # predictor decomposition at the headline protocol (126 patches)
    n_batches = -(-fl["n_patches"] // B)
    out["n_patches"] = fl["n_patches"]
    out["forward_seconds_per_volume_xla"] = round(
        out["xla"]["ms_per_batch"] * n_batches / 1e3, 4
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
