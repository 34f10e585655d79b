"""Real-TPU validation of the merged-Pallas training path (single chip).

The interpret-mode tests pin the per-sample kernels' math on CPU; this
harness validates the actual Mosaic lowering on TPU hardware: values and
gradients of mode_conv_merged_s2d_pallas vs the exact expert sum at real
layer geometries (incl. a Co-chunked one), plus one full train step with
train_impl='merged_pallas' vs 'expert_sum'.

Backs the dispatch note at models/repmode.py (train_impl='auto'):
single-chip hardware validation of the Pallas path. Multi-chip
Mosaic-under-GSPMD remains virtual-mesh-validated only (one chip here).

Run:  python tools/smoke_tpu_merged.py        (needs a TPU backend)
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from repmode_tpu.ops.mode import (
    ExpertKernels,
    mode_conv_expert_sum_s2d_domain,
    mode_conv_merged_s2d_pallas,
)


def _ek(key, ci, co, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    mk = lambda k, s: 0.1 * jax.random.normal(k, s, dtype)
    return ExpertKernels(
        w5=mk(ks[0], (5, 5, 5, ci, co)),
        w3=mk(ks[1], (3, 3, 3, ci, co)),
        w1=mk(ks[2], (1, 1, 1, ci, co)),
        wa3=mk(ks[3], (1, 1, 1, ci, co)),
        wa5=mk(ks[4], (1, 1, 1, ci, co)),
    )


def check_layer(name, n, d, h, w, ci, co, key):
    """ci/co are NATIVE channels; the s2d tensors carry 4x."""
    kx, ke, kg = jax.random.split(key, 3)
    x2 = jax.random.normal(kx, (n, d, h, w, 4 * ci), jnp.float32)
    ek = _ek(ke, ci, co)
    g = jax.nn.softmax(jax.random.normal(kg, (n, 5, co), jnp.float32), 1)

    def loss(f):
        def run(xx, eek, gg):
            return jnp.sum(
                f(xx, eek, gg, compute_dtype=jnp.bfloat16) ** 2
            )

        return jax.jit(jax.value_and_grad(run, argnums=(0, 1, 2)))

    v0, g0 = loss(mode_conv_expert_sum_s2d_domain)(x2, ek, g)
    v1, g1 = loss(mode_conv_merged_s2d_pallas)(x2, ek, g)
    rel_v = float(abs(v1 - v0) / (abs(v0) + 1e-12))
    rels = []
    for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        p, q = np.asarray(p, np.float64), np.asarray(q, np.float64)
        rels.append(float(np.abs(q - p).max() / (np.abs(p).max() + 1e-12)))
    out = {"layer": name, "rel_value": rel_v, "max_rel_grad": max(rels)}
    print(json.dumps(out))
    # bf16 compute on two differently-ordered exact formulations: allow a
    # few bf16 ulps of accumulated divergence
    assert rel_v < 2e-2 and max(rels) < 6e-2, out
    return out


def main():
    backend = jax.default_backend()
    print(json.dumps({"backend": backend, "device": str(jax.devices()[0])}))
    assert backend == "tpu", "this harness validates the REAL TPU lowering"

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # L1 conv geometry (enc1 conv2: 32->32 native, 128->128 s2d lanes)
    check_layer("L1 128->128", 4, 8, 32, 32, 32, 32, k1)
    # L1 decoder concat entry (64->32 native, 256->128 s2d)
    check_layer("L1dec 256->128", 4, 8, 32, 32, 64, 32, k2)
    # Co-chunked geometry (dec2 conv1: 128->64 native, 512->256 s2d lanes
    # exceeds the VMEM weight budget -> _lane_chunk splits Co)
    check_layer("dec2 512->256 (chunked)", 2, 4, 16, 16, 128, 64, k3)

    # one full train step, merged_pallas vs expert_sum
    from repmode_tpu.config import Config, ModelConfig, TrainConfig
    from repmode_tpu.train.state import create_train_state
    from repmode_tpu.train.step import make_train_step

    losses = {}
    for impl in ("merged_pallas", "expert_sum"):
        cfg = Config(
            model=ModelConfig(mult_chan=8, train_impl=impl),
            train=TrainConfig(
                batch_size=2, patch_size=(16, 64, 64),
                compute_dtype="bfloat16",
            ),
        )
        state = create_train_state(cfg, jax.random.PRNGKey(7))
        step = make_train_step(cfg)
        kb = jax.random.PRNGKey(11)
        batch = {
            "signal": jax.random.normal(kb, (2, 16, 64, 64, 1), jnp.float32),
            "target": jax.random.normal(
                jax.random.fold_in(kb, 1), (2, 16, 64, 64, 1), jnp.float32
            ),
            "task": jnp.array([0, 3], jnp.int32),
        }
        _, metrics = step(state, batch)
        losses[impl] = float(metrics["loss"])
    rel = abs(losses["merged_pallas"] - losses["expert_sum"]) / (
        abs(losses["expert_sum"]) + 1e-12
    )
    print(json.dumps({"train_step_losses": losses, "rel": rel}))
    assert rel < 2e-2, losses
    print(json.dumps({"smoke_tpu_merged": "ok"}))


if __name__ == "__main__":
    main()
