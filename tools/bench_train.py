"""Training-step throughput at the reference recipe's full scale, on chip.

One jitted train step (fwd+bwd+Adam+sync-BN, repmode_tpu/train/step.py) at
batch 8 x 32x128x128 patches, mult_chan 32, 12 tasks, bf16 — the
reference's exact training configuration (scripts/run/train_and_eval.sh:
batch 8, Adam 1e-4; fnet_model.py:104-113 AMP -> bf16). Reports
ms/step and training voxels/s.

The per-step scalar loss fetch (~31 ms tunnel tax, ARCHITECTURE.md §8) is
amortized over a >1 s step; steps chain through the state so execution is
sequential.

Usage: python tools/bench_train.py [--steps 6] [--batch 8] [--remat]
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
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--train_impl", type=str, default="auto",
                    help="auto|expert_sum|merged_pallas|merged")
    ap.add_argument("--decomp", action="store_true",
                    help="also time fwd-only and fwd+bwd to decompose the "
                         "step cost")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.config import Config, ModelConfig, TrainConfig
    from repmode_tpu.train.state import create_train_state
    from repmode_tpu.train.step import make_train_step

    patch = (32, 128, 128)
    cfg = Config(
        model=ModelConfig(remat=args.remat, train_impl=args.train_impl),
        train=TrainConfig(
            batch_size=args.batch, patch_size=patch,
            compute_dtype="bfloat16",
        ),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)

    rng = np.random.default_rng(0)
    n = args.batch
    batch = {
        "signal": jnp.asarray(
            rng.standard_normal((n,) + patch + (1,)), jnp.float32
        ),
        "target": jnp.asarray(
            rng.standard_normal((n,) + patch + (1,)), jnp.float32
        ),
        "task": jnp.asarray(rng.integers(0, 12, n), jnp.int32),
    }

    def timed(fn, *fargs):
        out = fn(*fargs)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        ts = []
        for _i in range(args.steps):
            t0 = time.perf_counter()
            out = fn(*fargs)
            _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    rec = {
        "batch": n, "patch": list(patch), "remat": args.remat,
        "train_impl": args.train_impl,
        "device": jax.devices()[0].device_kind,
    }

    if args.decomp:
        from repmode_tpu.models import build_model

        net = build_model(cfg)

        @jax.jit
        def fwd_only(params, stats, b):
            out, _ = net.apply(
                {"params": params, "batch_stats": stats},
                b["signal"], b["task"], train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - b["target"]) ** 2)

        t = timed(fwd_only, state.params, state.batch_stats, batch)
        rec["fwd_only_ms"] = round(t * 1e3, 1)
        print(json.dumps({"fwd_only_ms": rec["fwd_only_ms"]}), flush=True)

        grad_fn = jax.jit(jax.grad(
            lambda p, s, b: fwd_only.__wrapped__(p, s, b)
        ))
        t = timed(grad_fn, state.params, state.batch_stats, batch)
        rec["fwd_bwd_ms"] = round(t * 1e3, 1)
        print(json.dumps({"fwd_bwd_ms": rec["fwd_bwd_ms"]}), flush=True)

    state, m = step(state, batch)  # compile + warmup
    _ = float(m["loss"])
    times = []
    for _i in range(args.steps):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    vox = n * int(np.prod(patch))
    rec["ms_per_step"] = round(med * 1e3, 1)
    rec["train_voxels_per_s"] = round(vox / med, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
