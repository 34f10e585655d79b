"""Device-trace the re-parameterized eval forward and print op self-times.

The round-2 edge-op table (ARCHITECTURE.md §10) came from isolated
micro-benches; this captures the in-situ picture — which fusions/copies XLA
actually schedules inside the production forward (plain_forward_s2d at the
headline eval batch), including any padded-layout copies on the narrow-minor
s2d tensors. Reuses profile_train's xplane parser.

Usage: python tools/profile_forward.py [--batch 16] [--dir /tmp/prof_fwd]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.profile_train import parse  # noqa: E402


def capture(profile_dir: str, batch: int, reps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from repmode_tpu.config import Config, EvalConfig, TrainConfig
    from repmode_tpu.models.reparam import make_inference
    from repmode_tpu.train.state import create_train_state

    patch = (32, 128, 128)
    cfg = Config(
        train=TrainConfig(batch_size_eval=batch, compute_dtype="bfloat16"),
        eval=EvalConfig(),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    prepare, forward = make_inference(cfg)
    plain = prepare(state.variables, 0)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch,) + patch + (1,)).astype(np.float32)
    )
    y = fwd(plain, x)
    y.block_until_ready()
    with jax.profiler.trace(profile_dir):
        for _ in range(reps):
            y = fwd(plain, x)
        y.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dir", type=str, default="/tmp/prof_fwd")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.dir, args.batch, args.reps)
    parse(args.dir, args.top)


if __name__ == "__main__":
    main()
