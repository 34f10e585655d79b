"""Decompose the tiled predictor's volume time into forward vs stitch.

Times, at the headline protocol (32x624x924 volume, 32x128x128 patches,
batch 16, bf16), the two_phase predictor's phases separately —
  phase 1: gather + forward for all patch batches
  phase 2: Gaussian scatter-add stitch + divide
The fused predictor's end-to-end number is bench.py. Historical finding
(2026-08-17): fused == phase1 alone (XLA hides the entire stitch behind the
convs in the fused scan), which killed the whole-pipeline-in-s2d predictor
experiment — see ARCHITECTURE.md §"measured honestly".

Tunnel-safe measurement: every timed jit returns a SCALAR sum of its real
output (full-array fetches cost seconds through the tunnel and a bare
scalar slice would let XLA dead-code the rest); arguments are device-
resident before timing.

Usage: python tools/bench_predictor.py [--reps 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOL = (32, 624, 924)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from repmode_tpu.config import Config, EvalConfig, TrainConfig
    from repmode_tpu.infer.predict import TiledPredictor
    from repmode_tpu.models.reparam import make_inference
    from repmode_tpu.train.state import create_train_state

    def timed(fn, *fargs):
        out = fn(*fargs)
        _ = float(out)
        ts = []
        for _i in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*fargs)
            _ = float(out)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    cfg = Config(
        train=TrainConfig(batch_size_eval=16, compute_dtype="bfloat16"),
        eval=EvalConfig(),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    prepare, _fwd = make_inference(cfg)
    plain = prepare(state.variables, 0)
    vol = np.random.default_rng(0).standard_normal(VOL).astype(np.float32)

    pred = TiledPredictor(cfg)
    starts, valid, _ = pred.grid(VOL)
    v = jnp.asarray(vol, jnp.float32)

    def forward_all(plain_, vol_, starts_):
        gather = pred._gather_fn()

        def one_batch(st_b):
            patches = jax.vmap(gather, in_axes=(None, 0))(vol_, st_b)
            return pred._forward(plain_, patches[..., None])[..., 0]

        return jax.lax.map(one_batch, starts_)

    def stitch(preds_, starts_, valid_):
        ps = jnp.zeros(VOL, jnp.float32)
        ws = jnp.zeros(VOL, jnp.float32)

        def body(carry, inp):
            pb, sb, vb = inp
            return pred._accumulate(carry, pb, sb, vb), None

        (ps, ws), _ = jax.lax.scan(body, (ps, ws), (preds_, starts_, valid_))
        return ps / ws

    st = jnp.asarray(starts)
    va = jnp.asarray(valid)
    t1 = timed(
        jax.jit(lambda p, v_, s: forward_all(p, v_, s).sum()), plain, v, st
    )
    preds = jax.jit(forward_all)(plain, v, st)
    _ = float(preds.reshape(-1)[0])
    t2 = timed(
        jax.jit(lambda p_, s, va_: stitch(p_, s, va_).sum()), preds, st, va
    )
    print(json.dumps({
        "phase1_fwd_s": round(t1, 4),
        "phase2_stitch_s": round(t2, 4),
        "n_batches": int(starts.shape[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
