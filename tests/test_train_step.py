"""Train step: loss decreases, per-task metrics, data-parallel equivalence."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from repmode_tpu.parallel import make_mesh, replicate, shard_batch
from repmode_tpu.train import create_train_state, make_train_step


def tiny_cfg(compute="float32", num_tasks=3):
    return Config(
        model=ModelConfig(mult_chan=2, depth=2),
        train=TrainConfig(
            batch_size=4, patch_size=(8, 16, 16), compute_dtype=compute, lr=1e-3
        ),
        data=DataConfig(adopted_datasets=tuple(f"t{i}" for i in range(num_tasks))),
    )


def make_batch(rng, cfg, n=4):
    d, h, w = cfg.train.patch_size
    sig = rng.standard_normal((n, d, h, w, 1)).astype(np.float32)
    # learnable relationship: target = smoothed signal
    tgt = (sig * 0.5).astype(np.float32)
    task = rng.integers(0, cfg.num_tasks, n).astype(np.int32)
    return {
        "signal": jnp.asarray(sig),
        "target": jnp.asarray(tgt),
        "task": jnp.asarray(task),
    }


class TestTrainStep:
    def test_loss_decreases(self, rng):
        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg)
        batch = make_batch(rng, cfg)
        losses = []
        for _ in range(40):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses
        assert int(state.step) == 40

    def test_per_task_metrics_consistent(self, rng):
        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, donate=False)
        batch = make_batch(rng, cfg)
        _, m = step(state, batch)
        sums = np.asarray(m["per_task_loss_sum"])
        counts = np.asarray(m["per_task_count"])
        assert counts.sum() == 4
        # weighted per-task mean == overall loss
        np.testing.assert_allclose(
            sums.sum() / counts.sum(), float(m["loss"]), rtol=1e-5
        )
        # counts match the batch's task histogram
        hist = np.bincount(np.asarray(batch["task"]), minlength=cfg.num_tasks)
        np.testing.assert_array_equal(counts.astype(int), hist)

    def test_bn_stats_update(self, rng):
        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg, donate=False)
        batch = make_batch(rng, cfg)
        new_state, _ = step(state, batch)
        before = jax.tree.leaves(state.batch_stats)
        after = jax.tree.leaves(new_state.batch_stats)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
        )
        assert changed


class TestDataParallel:
    def test_dp_matches_single_device(self, rng):
        """The 8-way sharded step must produce the same result as 1-device.
        (Sync-BN + global loss mean make the math device-count invariant.)
        SGD optimizer: its update is linear in the gradient, so parameter
        comparison directly reflects gradient equality (Adam's first step is
        ~sign(g)*lr, which amplifies reduction-order noise on ~0 gradients)."""
        import optax

        cfg = tiny_cfg()
        batch = make_batch(rng, cfg, n=8)
        sgd = optax.sgd(0.1)

        # single device
        state1 = create_train_state(cfg, jax.random.PRNGKey(0), tx=sgd)
        step1 = make_train_step(cfg, donate=False, tx=sgd)
        out1, m1 = step1(state1, batch)

        # 8-device mesh
        mesh = make_mesh(8)
        state8 = create_train_state(cfg, jax.random.PRNGKey(0), tx=sgd)
        state8 = replicate(mesh, state8)
        step8 = make_train_step(cfg, donate=False, tx=sgd)
        sharded = shard_batch(mesh, batch)
        out8, m8 = step8(state8, sharded)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=1e-5
        )
        for a, b in zip(jax.tree.leaves(out1.params), jax.tree.leaves(out8.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
            )
        # BN batch stats (computed globally = sync-BN) must also agree
        for a, b in zip(
            jax.tree.leaves(out1.batch_stats), jax.tree.leaves(out8.batch_stats)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_batch_actually_sharded(self, rng):
        cfg = tiny_cfg()
        mesh = make_mesh(8)
        batch = make_batch(rng, cfg, n=8)
        sharded = shard_batch(mesh, batch)
        assert len(sharded["signal"].sharding.device_set) == 8


class TestDistributedEval:
    def test_dp_experiment_with_sharded_eval(self, rng, tmp_path):
        """Full experiment: 8-device DP training + two_phase sharded eval."""
        from repmode_tpu.config import Config, DataConfig, EvalConfig, ModelConfig
        from repmode_tpu.data import synthetic_store
        from repmode_tpu.train.loop import run_experiment

        datasets = ("a", "b")
        cfg = Config(
            model=ModelConfig(mult_chan=2, depth=2),
            train=TrainConfig(
                num_epochs=1, batch_size=8, batch_size_eval=4,
                patch_size=(8, 16, 16), interval_val=1,
                compute_dtype="float32", num_devices=8,
            ),
            eval=EvalConfig(patch_size=(8, 16, 16), predictor="two_phase"),
            data=DataConfig(adopted_datasets=datasets),
            path_exp_dir=str(tmp_path / "dp_exp"),
            exp_name="dp_exp",
        )
        stores = {
            split: synthetic_store(datasets, volumes_per_task=2,
                                   vol_shape=(8, 24, 24), seed=i)
            for i, split in enumerate(["train", "val", "test"])
        }
        results = run_experiment(cfg, stores)
        assert results["best_path"] is not None
        assert np.isfinite(results["test_log"]["metric_test/MSE"])
