"""Headline benchmark: full-volume tiled inference throughput on one TPU chip.

Reproduces the reference's eval protocol (fnet/fnet_model.py:149-223): a full
~32x624x924 volume, sliding-window 32x128x128 patches at 50% overlap,
Gaussian-blended stitching — run through the RE-PARAMETERIZED RepMode network
(experts merged per task + BN folded; models/reparam.py) in bf16.

Prints ONE JSON line:
  {"metric": ..., "value": voxels/sec, "unit": "voxels/s", "vs_baseline": ...}

vs_baseline is value / (5x assumed V100 throughput). The reference publishes
no benchmark numbers (BASELINE.md): V100_VOXELS_PER_SEC below is an estimate
for the reference implementation on its documented hardware (V100 32GB, AMP,
batch_size_eval 8) from its FLOP profile (~7.4 effective MFLOP/voxel after
~3.6x tiling redundancy) and realistic achieved tensor-core throughput, with
its per-batch re-merge and Python stitching overheads. vs_baseline >= 1.0
means the >=5x north-star (BASELINE.json) is met.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_VOXELS_PER_SEC = 1.0e6  # estimated reference throughput (see docstring)
NORTH_STAR_MULTIPLIER = 5.0

VOL_SHAPE = (32, 624, 924)  # reference full-volume size (SURVEY.md §3.3)


def main():
    from repmode_tpu.config import Config, EvalConfig, TrainConfig
    from repmode_tpu.infer.predict import TiledPredictor
    from repmode_tpu.models.reparam import make_inference
    from repmode_tpu.train.state import create_train_state

    # batch_size_eval 16: measured best on v5e (13.7 vs 13.0 Mvox/s at 8);
    # the reference's own default (8) remains the framework config default.
    cfg = Config(
        train=TrainConfig(batch_size_eval=16, compute_dtype="bfloat16"),
        eval=EvalConfig(),
    )

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    prepare, _ = make_inference(cfg)
    plain = prepare(state.variables, 0)

    rng = np.random.default_rng(0)
    vol = rng.standard_normal(VOL_SHAPE).astype(np.float32)

    predictor = TiledPredictor(cfg)

    # compile + warmup (fetch an element: block_until_ready is unreliable on
    # the tunneled platform, so every timed iteration syncs via a scalar
    # fetch; the output feeds the next input to force sequential execution)
    out = predictor(plain, vol)
    _ = float(out[0, 0, 0])

    times = []
    for _i in range(4):
        t0 = time.perf_counter()
        out = predictor(plain, out)
        _ = float(out[0, 0, 0])
        times.append(time.perf_counter() - t0)
    best = sorted(times)[len(times) // 2]  # median
    voxels = float(np.prod(VOL_SHAPE))
    vps = voxels / best
    print(
        json.dumps(
            {
                "metric": "full_volume_tiled_inference_throughput",
                "value": round(vps, 1),
                "unit": "voxels/s",
                "vs_baseline": round(
                    vps / (NORTH_STAR_MULTIPLIER * V100_VOXELS_PER_SEC), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
