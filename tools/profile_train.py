"""Capture a jax.profiler trace of the full train step and print op stats.

The block-level benches (tools/bench_bwd.py) attribute ~239 ms of backward
across blocks while the in-situ step measures 433 ms of backward — this tool
exists to locate the difference with a real device trace rather than
speculation. Parses the xplane.pb with tensorflow's XSpace proto and prints
the top device ops by self time.

Usage: python tools/profile_train.py [--steps 2] [--dir /tmp/prof]
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(profile_dir: str, steps: int, batch: int):
    import jax
    import jax.numpy as jnp

    from repmode_tpu.config import Config, ModelConfig, TrainConfig
    from repmode_tpu.train.state import create_train_state
    from repmode_tpu.train.step import make_train_step

    patch = (32, 128, 128)
    cfg = Config(
        model=ModelConfig(),
        train=TrainConfig(
            batch_size=batch, patch_size=patch, compute_dtype="bfloat16",
        ),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    rng = np.random.default_rng(0)
    b = {
        "signal": jnp.asarray(
            rng.standard_normal((batch,) + patch + (1,)), jnp.float32
        ),
        "target": jnp.asarray(
            rng.standard_normal((batch,) + patch + (1,)), jnp.float32
        ),
        "task": jnp.asarray(rng.integers(0, 12, batch), jnp.int32),
    }
    state, m = step(state, b)  # compile + warmup
    _ = float(m["loss"])
    with jax.profiler.trace(profile_dir):
        for _ in range(steps):
            state, m = step(state, b)
        _ = float(m["loss"])


def parse(profile_dir: str, top: int):
    xplane_pb2 = None
    for mod in (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
        "tensorflow.core.profiler.protobuf.xplane_pb2",
    ):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        print(json.dumps({"error": "no xplane proto module available"}))
        return

    paths = sorted(glob.glob(os.path.join(profile_dir, "**/*.xplane.pb"),
                             recursive=True))
    if not paths:
        print(json.dumps({"error": f"no xplane.pb under {profile_dir}"}))
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    print(json.dumps({"planes": [p.name for p in space.planes]}), flush=True)

    def category(nm: str) -> str:
        own = nm.split("=")[0].lstrip("%")  # op's own name, not operands
        for key in ("convolution", "copy-start", "copy-done", "copy",
                    "all-reduce", "dynamic-slice", "dynamic-update-slice",
                    "fusion", "transpose", "reshape", "dot", "pad",
                    "reduce", "select-and-scatter", "scatter"):
            if key in own:
                return key
        return "other"

    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        metas = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            tot = defaultdict(int)
            cnt = defaultdict(int)
            cat = defaultdict(int)
            for ev in line.events:
                nm = metas.get(ev.metadata_id, str(ev.metadata_id))
                tot[nm] += ev.duration_ps
                cnt[nm] += 1
                cat[category(nm)] += ev.duration_ps
            if not tot:
                continue
            line_ms = round(sum(tot.values()) / 1e9, 1)
            cats = {
                k: round(v / 1e9, 1)
                for k, v in sorted(cat.items(), key=lambda kv: -kv[1])
            }
            print(json.dumps({
                "plane": plane.name, "line": line.name,
                "events_ms_total": line_ms, "by_category_ms": cats,
            }), flush=True)
            rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
            for k, v in rows:
                print(json.dumps({
                    "op": k[:130], "ms": round(v / 1e9, 3), "n": cnt[k]
                }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dir", type=str, default="/tmp/prof_train")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.dir, args.steps, args.batch)
    parse(args.dir, args.top)


if __name__ == "__main__":
    main()
