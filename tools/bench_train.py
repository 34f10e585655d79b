"""Training-step throughput at the reference recipe's full scale, on chip.

One jitted train step (fwd+bwd+Adam+sync-BN, repmode_tpu/train/step.py) at
batch 8 x 32x128x128 patches, mult_chan 32, 12 tasks, bf16 — the
reference's exact training configuration (scripts/run/train_and_eval.sh:
batch 8, Adam 1e-4; fnet_model.py:104-113 AMP -> bf16). Reports
ms/step and training voxels/s.

Two protocols, both reported:

  ms_per_step            one step at a time, blocking on the loss scalar
                         each iteration — includes the host dispatch gap
                         and the axon tunnel's scalar-fetch tax
                         (ARCHITECTURE.md §8) once per step.
  ms_per_step_pipelined  the steady-state training loop: all steps
                         dispatched back-to-back (states chain through
                         donated buffers, so the device serializes them),
                         one block at the end. This is what a real epoch
                         costs per step — the reference's loop equally
                         overlaps host work with device steps via CUDA
                         async dispatch (fnet_model.py:96-132).

MFU is reported against the analytic model FLOPs (utils/flops.py):
3 x forward FLOPs per step (fwd + dx + dW), batch x patch voxels.

Usage: python tools/bench_train.py [--steps 6] [--batch 8] [--remat]
                                   [--out BENCH_TRAIN.json]
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
    ap.add_argument("--out", type=str, default=None,
                    help="also write the result record to this JSON file")
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
        # the dispatch knobs this number was measured under (default-on
        # harvest legs + the flat-buffer Adam; ARCHITECTURE.md §12)
        "env": {
            k: os.environ.get(
                k,
                "<default=0>" if k in (
                    "REPMODE_ENC1_IM2COL",
                    "REPMODE_TRAIN_INDOMAIN_RESAMPLE",
                ) else "<default=1>",
            )
            for k in (
                "REPMODE_FLAT_ADAM", "REPMODE_DX_TRANSPOSE",
                "REPMODE_TAPMAJOR_DEPTHFOLD", "REPMODE_ENC1_IM2COL",
                "REPMODE_TRAIN_INDOMAIN_RESAMPLE",
            )
        },
        "ab_chain": (
            "bench_logs/bench_train_r4_ab.log + bench_logs/README.md "
            "(per-flag A/B windows); ARCHITECTURE.md §12 (fix-by-fix chain)"
        ),
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

    # steady-state loop: dispatch every step, block once at the end
    t0 = time.perf_counter()
    for _i in range(args.steps):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    piped = (time.perf_counter() - t0) / args.steps
    rec["ms_per_step_pipelined"] = round(piped * 1e3, 1)
    rec["train_voxels_per_s_pipelined"] = round(vox / piped, 1)

    from repmode_tpu.utils.flops import inference_flops_per_patch

    step_flops = 3 * n * inference_flops_per_patch(cfg.model, patch)
    rec["model_flops_per_step"] = step_flops
    tflops = step_flops / piped / 1e12
    rec["tflops_effective"] = round(tflops, 2)
    peaks = {"TPU v5e": 197.0, "TPU v5 lite": 197.0, "TPU v4": 275.0}
    peak = peaks.get(rec["device"])
    rec["device_peak_bf16_tflops"] = peak
    rec["mfu"] = round(tflops / peak, 4) if peak else None

    # Derived V100 training baseline, same analytic style as BASELINE.md's
    # inference derivation (the reference publishes no numbers). Training
    # FLOPs/voxel = 3 x 2.084 MFLOP (fwd+dx+dW, merged-kernel cost — the
    # reference's train path also convolves one merged 5^3 kernel per
    # sample, RepMode.py:204-208), no tiling redundancy. The reference
    # trains under CUDA AMP (fnet_model.py:104-113) so V100 tensor cores
    # apply: 125 TFLOP/s fp16 peak x an assumed 20% [10%, 35%] wall
    # efficiency (batch-1 per-sample conv3d calls in a Python loop, 19
    # routing() einsum merges per step, GradScaler sync; narrow-channel
    # NCDHW 3D convs sit below cuDNN's fp16 sweet spot) = 25 TFLOP/s
    # effective -> 4.0 Mvox/s central, range [2.0, 7.0].
    v100_train_voxps = 4.0e6
    rec["baseline_v100_train_voxps"] = v100_train_voxps
    rec["baseline_v100_train_range"] = [2.0e6, 7.0e6]
    rec["vs_baseline_train"] = round((vox / piped) / v100_train_voxps, 3)
    rec["baseline_method"] = (
        "analytic: 26.2 TFLOP/step (3x fwd, utils/flops.py) / (125 fp16 "
        "TFLOP/s x 0.20 assumed AMP wall efficiency); see BASELINE.md for "
        "the inference-side anchor of the efficiency band"
    )
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
