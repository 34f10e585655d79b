"""Checkpoint round-trip: full train state + config survive save/restore."""

import os

import jax
import numpy as np

from repmode_tpu.ckpt import load_checkpoint, save_checkpoint
from repmode_tpu.ckpt.checkpoint import load_config
from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from repmode_tpu.train import create_train_state, make_train_step


def tiny_cfg():
    return Config(
        model=ModelConfig(mult_chan=2, depth=2),
        train=TrainConfig(batch_size=2, patch_size=(8, 16, 16), compute_dtype="float32"),
        data=DataConfig(adopted_datasets=("a", "b")),
        exp_name="ckpt_test",
    )


def test_roundtrip(tmp_path, rng):
    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(1))
    # advance one step so opt_state/counters are non-trivial
    step = make_train_step(cfg, donate=False)
    batch = {
        "signal": np.zeros((2, 8, 16, 16, 1), np.float32),
        "target": np.ones((2, 8, 16, 16, 1), np.float32) * 0.1,
        "task": np.asarray([0, 1], np.int32),
    }
    state, _ = step(state, batch)

    path = str(tmp_path / "ck")
    save_checkpoint(path, state, cfg)
    restored, cfg2 = load_checkpoint(path)

    assert cfg2 == cfg  # config embedded & round-trips (fnet_model.py:60 parity)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state is immediately trainable
    state2, m = step(restored, batch)
    assert np.isfinite(float(m["loss"]))


def test_config_json_roundtrip():
    cfg = tiny_cfg()
    assert Config.from_json(cfg.to_json()) == cfg


def test_load_config_only(tmp_path):
    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ck2")
    save_checkpoint(path, state, cfg)
    assert load_config(path) == cfg
