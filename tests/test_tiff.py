"""First-party TIFF writer/reader round-trip + save-preds integration."""

import numpy as np
import pytest

from repmode_tpu.utils import tiff


def test_roundtrip_3d(tmp_path, rng):
    vol = rng.standard_normal((5, 7, 9)).astype(np.float32)
    p = str(tmp_path / "v.tiff")
    tiff.imwrite(p, vol)
    back = tiff.imread(p)
    np.testing.assert_array_equal(back, vol)


def test_roundtrip_2d(tmp_path, rng):
    img = rng.standard_normal((6, 4)).astype(np.float32)
    p = str(tmp_path / "i.tiff")
    tiff.imwrite(p, img)
    back = tiff.imread(p)
    np.testing.assert_array_equal(back[0], img)


def test_readable_by_tifffile_if_present(tmp_path, rng):
    tifffile = pytest.importorskip("tifffile")
    vol = rng.standard_normal((3, 8, 8)).astype(np.float32)
    p = str(tmp_path / "x.tiff")
    tiff.imwrite(p, vol)
    np.testing.assert_array_equal(tifffile.imread(p), vol)


def test_save_test_preds_writes_tiffs(tmp_path, rng):
    from repmode_tpu.config import (
        Config, DataConfig, EvalConfig, ModelConfig, TrainConfig,
    )
    from repmode_tpu.data import synthetic_store
    from repmode_tpu.infer.predict import TiledPredictor
    from repmode_tpu.train.loop import run_eval_pass
    from repmode_tpu.train.state import create_train_state
    import jax
    import os

    datasets = ("a",)
    cfg = Config(
        model=ModelConfig(mult_chan=2, depth=2),
        train=TrainConfig(batch_size_eval=4, patch_size=(8, 16, 16),
                          compute_dtype="float32"),
        eval=EvalConfig(patch_size=(8, 16, 16), save_test_preds=True),
        data=DataConfig(adopted_datasets=datasets),
    )
    store = synthetic_store(datasets, volumes_per_task=1, vol_shape=(8, 16, 16))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    predictor = TiledPredictor(cfg)
    pred_dir = str(tmp_path / "preds")
    os.makedirs(pred_dir)
    run_eval_pass(cfg, state, store, predictor, "test", pred_dir=pred_dir)
    files = os.listdir(pred_dir)
    assert any(f.endswith(".tiff") and "_pred_" in f for f in files)
    vol = tiff.imread(os.path.join(pred_dir, [f for f in files if "_pred_" in f][0]))
    assert vol.shape == (8, 16, 16)
