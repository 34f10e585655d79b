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


def _one_step_state(cfg, tx, rng_seed=1):
    import jax.numpy as jnp

    state = create_train_state(cfg, jax.random.PRNGKey(rng_seed), tx=tx)
    step = make_train_step(cfg, donate=False, tx=tx)
    batch = {
        "signal": np.random.default_rng(0).standard_normal(
            (2, 8, 16, 16, 1)).astype(np.float32),
        "target": np.ones((2, 8, 16, 16, 1), np.float32) * 0.1,
        "task": np.asarray([0, 1], np.int32),
    }
    state, _ = step(state, batch)
    return state, step, batch


class TestOptSchemaMigration:
    """Checkpoints restore across the flat_adam <-> per-tensor optax.adam
    schema change (round-4 regression: pre-flat_adam checkpoints could no
    longer restore at all). The moments are the same numbers in both
    layouts; restore relayouts them to whatever the current optimizer is."""

    def test_per_tensor_checkpoint_restores_under_flat_default(
        self, tmp_path, monkeypatch
    ):
        import optax

        from repmode_tpu.train.state import FlatAdamState

        cfg = tiny_cfg()
        # save under the pre-round-4 layout (per-tensor Adam)
        per_tensor = optax.adam(cfg.train.lr, b1=0.9, b2=0.999, eps=1e-8)
        state, _, batch = _one_step_state(cfg, per_tensor)
        path = str(tmp_path / "old_ck")
        save_checkpoint(path, state, cfg)
        # also simulate a pre-meta.json checkpoint
        os.remove(os.path.join(path, "meta.json"))

        # restore under the flat default
        monkeypatch.delenv("REPMODE_FLAT_ADAM", raising=False)
        restored, _ = load_checkpoint(path)
        assert isinstance(restored.opt_state, FlatAdamState)

        # the migrated moments are the SAME numbers: continuing training
        # matches continuing with the original per-tensor state exactly
        from repmode_tpu.train import make_train_step as mts

        step_flat = mts(cfg, donate=False)
        cont_flat, _ = step_flat(restored, batch)
        step_pt = mts(cfg, donate=False, tx=per_tensor)
        cont_pt, _ = step_pt(state, batch)
        for a, b in zip(
            jax.tree.leaves(cont_flat.params), jax.tree.leaves(cont_pt.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
            )

    def test_flat_checkpoint_restores_under_per_tensor_escape(
        self, tmp_path, monkeypatch
    ):
        import optax

        cfg = tiny_cfg()
        monkeypatch.delenv("REPMODE_FLAT_ADAM", raising=False)
        state, _, _ = _one_step_state(cfg, None)  # default = flat
        path = str(tmp_path / "flat_ck")
        save_checkpoint(path, state, cfg)

        monkeypatch.setenv("REPMODE_FLAT_ADAM", "0")
        restored, _ = load_checkpoint(path)
        assert isinstance(restored.opt_state, tuple)
        assert isinstance(restored.opt_state[0], optax.ScaleByAdamState)
        # moment values survived the relayout
        from jax.flatten_util import ravel_pytree

        mu_rt, _ = ravel_pytree(restored.opt_state[0].mu)
        np.testing.assert_allclose(
            np.asarray(mu_rt), np.asarray(state.opt_state.mu),
            rtol=0, atol=0,
        )

    def test_migrated_restore_feeds_dp_mesh_step(self, tmp_path, monkeypatch):
        """A per-tensor-Adam checkpoint restored under the flat default must
        also work as the start of DATA-PARALLEL training: replicate the
        migrated state onto an 8-device mesh and run one sharded step."""
        import optax

        from repmode_tpu.parallel import make_mesh, replicate, shard_batch
        from repmode_tpu.train import make_train_step

        cfg = tiny_cfg()
        per_tensor = optax.adam(cfg.train.lr, b1=0.9, b2=0.999, eps=1e-8)
        state, _, _ = _one_step_state(cfg, per_tensor)
        path = str(tmp_path / "dp_old_ck")
        save_checkpoint(path, state, cfg)

        monkeypatch.delenv("REPMODE_FLAT_ADAM", raising=False)
        restored, _ = load_checkpoint(path)

        mesh = make_mesh(8)
        restored = replicate(mesh, restored)
        step = make_train_step(cfg, donate=False)
        batch = shard_batch(mesh, {
            "signal": np.random.default_rng(1).standard_normal(
                (8, 8, 16, 16, 1)).astype(np.float32),
            "target": np.zeros((8, 8, 16, 16, 1), np.float32),
            "task": np.arange(8, dtype=np.int32) % 2,
        })
        new_state, m = step(restored, batch)
        assert np.isfinite(float(m["loss"]))
        assert int(new_state.step) == 2  # resumed counter + one DP step

    def test_meta_json_records_schema(self, tmp_path):
        import json

        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        path = str(tmp_path / "meta_ck")
        save_checkpoint(path, state, cfg)
        with open(os.path.join(path, "meta.json")) as f:
            assert json.load(f)["opt_schema"] == "flat"


def test_config_json_roundtrip():
    cfg = tiny_cfg()
    assert Config.from_json(cfg.to_json()) == cfg


def test_load_config_only(tmp_path):
    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ck2")
    save_checkpoint(path, state, cfg)
    assert load_config(path) == cfg
