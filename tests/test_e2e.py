"""End-to-end: synthetic data -> train -> val -> best checkpoint -> test -> CSVs.

The rebuild's equivalent of the reference's integration smoke test
(scripts/dataset/integ_dataset.sh + a short training run).
"""

import os

import numpy as np
import pytest

from repmode_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
)
from repmode_tpu.data import synthetic_store
from repmode_tpu.train.loop import run_experiment


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exp")
    datasets = ("taskA", "taskB")
    cfg = Config(
        model=ModelConfig(mult_chan=2, depth=2),
        train=TrainConfig(
            num_epochs=2,
            batch_size=2,
            batch_size_eval=4,
            patch_size=(8, 16, 16),
            interval_val=1,
            compute_dtype="float32",
            lr=1e-3,
        ),
        eval=EvalConfig(patch_size=(8, 16, 16)),
        data=DataConfig(adopted_datasets=datasets),
        path_exp_dir=str(tmp / "exp1"),
        exp_name="exp1",
    )
    stores = {
        split: synthetic_store(datasets, volumes_per_task=2,
                               vol_shape=(12, 24, 24), seed=i)
        for i, split in enumerate(["train", "val", "test"])
    }
    return cfg, stores


def test_full_experiment(tiny_setup):
    cfg, stores = tiny_setup
    results = run_experiment(cfg, stores)

    # best checkpoint was selected and exists
    assert results["best_path"] is not None
    assert os.path.isdir(results["best_path"])

    # test metrics produced with reference CSV schema
    test_log = results["test_log"]
    assert "metric_test/MSE" in test_log
    assert np.isfinite(test_log["metric_test/MSE"])
    mdir = os.path.join(cfg.path_exp_dir, "metrics")
    for prefix in ("comp", "spec", "final"):
        assert os.path.exists(os.path.join(mdir, f"{prefix}_exp1.csv"))

    # config snapshot written (main.py:107-108 parity)
    assert os.path.exists(
        os.path.join(cfg.path_exp_dir, "logs", "train_options_exp1.json")
    )
    # metrics jsonl written by tracker
    assert os.path.exists(os.path.join(cfg.path_exp_dir, "logs", "metrics.jsonl"))


def test_zero_epoch_smoke(tiny_setup, tmp_path):
    """--num_epochs 0 integ-dataset behavior: no training, straight to test."""
    cfg, stores = tiny_setup
    cfg = cfg.replace(
        train=cfg.train.__class__(
            num_epochs=0, batch_size=2, batch_size_eval=4,
            patch_size=(8, 16, 16), interval_val=1, compute_dtype="float32",
        ),
        path_exp_dir=str(tmp_path / "exp0"),
        exp_name="exp0",
    )
    results = run_experiment(cfg, stores)
    assert results["best_path"] is None
    assert "test_log" in results


def test_on_device_pipeline_experiment(tiny_setup, tmp_path):
    """Full experiment with the HBM-resident on-device patch pipeline."""
    cfg, stores = tiny_setup
    cfg = cfg.replace(
        train=cfg.train.__class__(
            num_epochs=1, batch_size=2, batch_size_eval=4,
            patch_size=(8, 16, 16), interval_val=1, compute_dtype="float32",
            on_device_pipeline=True,
        ),
        path_exp_dir=str(tmp_path / "exp_dev"),
        exp_name="exp_dev",
    )
    results = run_experiment(cfg, stores)
    assert results["best_path"] is not None
    assert np.isfinite(results["test_log"]["metric_test/MSE"])


def test_resume_from_checkpoint(tiny_setup, tmp_path):
    """Crash-resume: restoring a checkpoint continues from count_epoch
    (reference main.py:157-158 + fnet_model.load_state)."""
    cfg, stores = tiny_setup
    base = cfg.train.__class__(
        num_epochs=1, batch_size=2, batch_size_eval=4,
        patch_size=(8, 16, 16), interval_val=1, compute_dtype="float32",
    )
    cfg1 = cfg.replace(train=base, path_exp_dir=str(tmp_path / "r1"), exp_name="r1")
    r1 = run_experiment(cfg1, stores)
    assert r1["best_path"] is not None
    step_after_1 = int(r1["state"].step)

    # resume with a larger horizon: should train exactly one more epoch
    cfg2 = cfg1.replace(
        train=base.__class__(
            num_epochs=2, batch_size=2, batch_size_eval=4,
            patch_size=(8, 16, 16), interval_val=1, compute_dtype="float32",
        ),
        path_exp_dir=str(tmp_path / "r2"), exp_name="r2",
        path_load_model=r1["best_path"],
    )
    r2 = run_experiment(cfg2, stores)
    assert int(r2["state"].epoch) == 2
    assert int(r2["state"].step) == 2 * step_after_1
