"""Same-hardware head-to-head: reference Model.predict vs our TiledPredictor.

The reference publishes no benchmark numbers and no V100 is available here,
so this tool grounds the baseline the only way this environment allows
(VERDICT r1 item #4): run BOTH frameworks' full tiled-inference protocol on
the SAME silicon (this machine's CPU, fp32 — the reference's inference path
is fp32 anyway: its only autocast is fnet_model.py:106 in do_train_iter) and
record the measured ratio plus achieved FLOP/s. Writes BASELINE_CPU.json.

The reference side is the actual /root/reference code (read-only import) —
Model.predict (fnet/fnet_model.py:149-223) driven exactly as do_eval_iter
does. A wandb stub is injected (module-level import; not installed here).

Usage: python tools/bench_reference.py [--vol 32,128,192] [--repeats 2]
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
TASKS = ["t%d" % i for i in range(12)]


def bench_reference(vol, repeats, batch_size_eval):
    sys.modules.setdefault("wandb", types.SimpleNamespace(
        log=lambda *a, **k: None, init=lambda *a, **k: None,
        watch=lambda *a, **k: None))
    sys.path.insert(0, REFERENCE)
    import torch

    from fnet.fnet_model import Model

    opts = types.SimpleNamespace(
        adopted_datasets=TASKS, gpu_ids=-1, batch_size_eval=batch_size_eval,
    )
    model = Model(opts, nn_module="RepMode", lr=1e-4, gpu_ids=-1)
    signal = torch.from_numpy(
        np.random.default_rng(0).standard_normal((1, 1) + vol).astype(np.float32)
    )
    task = torch.tensor([0])

    # warmup (first call pays allocator + cuDNN-equivalent algo selection)
    model.predict(signal, task, model.patch_size)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        model.predict(signal, task, model.patch_size)
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_ours(vol, repeats, batch_size_eval):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from repmode_tpu.config import Config, EvalConfig, TrainConfig
    from repmode_tpu.infer.predict import TiledPredictor
    from repmode_tpu.models.reparam import make_inference
    from repmode_tpu.train.state import create_train_state

    cfg = Config(
        train=TrainConfig(batch_size_eval=batch_size_eval,
                          compute_dtype="float32"),  # fp32 like the reference
        eval=EvalConfig(s2d=False),  # s2d packing targets the MXU, not CPU
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    prepare, _ = make_inference(cfg)
    plain = prepare(state.variables, 0)
    predictor = TiledPredictor(cfg)
    volarr = np.random.default_rng(0).standard_normal(vol).astype(np.float32)

    np.asarray(predictor(plain, volarr))  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(predictor(plain, volarr))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vol", default="32,128,192")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--batch-size-eval", type=int, default=4)
    ap.add_argument("--side", choices=["both", "reference", "ours"],
                    default="both")
    ap.add_argument("--out", default=os.path.join(REPO, "BASELINE_CPU.json"))
    args = ap.parse_args()
    vol = tuple(int(v) for v in args.vol.split(","))

    sys.path.insert(0, REPO)
    from repmode_tpu.config import ModelConfig
    from repmode_tpu.utils.flops import tiled_inference_flops

    fl = tiled_inference_flops(ModelConfig(), vol, (32, 128, 128))
    voxels = int(np.prod(vol))
    rec = {
        "volume_shape": list(vol),
        "voxels": voxels,
        "model_flops_per_volume": fl["total_flops"],
        "precision": "float32 (reference inference has no autocast, "
                     "fnet_model.py:106)",
        "hardware": f"{os.uname().machine} CPU, "
                    f"{os.cpu_count()} core(s), single process",
        "batch_size_eval": args.batch_size_eval,
    }
    if args.side in ("both", "reference"):
        t = bench_reference(vol, args.repeats, args.batch_size_eval)
        rec["reference_seconds"] = round(t, 3)
        rec["reference_voxps"] = round(voxels / t, 1)
        rec["reference_gflops"] = round(fl["total_flops"] / t / 1e9, 2)
    if args.side in ("both", "ours"):
        t = bench_ours(vol, args.repeats, args.batch_size_eval)
        rec["ours_seconds"] = round(t, 3)
        rec["ours_voxps"] = round(voxels / t, 1)
        rec["ours_gflops"] = round(fl["total_flops"] / t / 1e9, 2)
    if "reference_seconds" in rec and "ours_seconds" in rec:
        rec["speedup_same_cpu"] = round(
            rec["reference_seconds"] / rec["ours_seconds"], 3)

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
