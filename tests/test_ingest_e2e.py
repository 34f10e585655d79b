"""End-to-end ingest: CSVs + synthetic CZI files -> VolumeStore.

Exercises the full reference-equivalent slow path (SSPdataset.py:45-87):
per-dataset CSVs, CZI decode, channel extraction, z-score, XY zoom.
"""

import os

import numpy as np
import pandas as pd
import pytest

from repmode_tpu.config import Config, DataConfig
from repmode_tpu.data.ingest import ingest_split
from tests.test_czi import write_czi


@pytest.fixture
def dataset_dir(tmp_path, rng):
    """Two datasets x two volumes, CZI + CSV layout like the reference."""
    czi_dir = tmp_path / "czis"
    csv_dir = tmp_path / "csvs"
    os.makedirs(czi_dir)
    truth = {}
    for ds in ["taskA", "taskB"]:
        rows = []
        for v in range(2):
            data = rng.integers(0, 4000, size=(2, 6, 40, 40)).astype(np.uint16)
            name = f"{ds}_{v}.czi"
            write_czi(str(czi_dir / name), data)
            truth[name] = data
            # reference CSVs carry 'data'-prefixed paths (SSPdataset.py:61)
            rows.append({
                "path_czi": f"data/{name}",
                "channel_signal": 0,
                "channel_target": 1,
                "structureProteinName": ds,
                "colony_position": "edge",
            })
        d = csv_dir / ds
        os.makedirs(d)
        pd.DataFrame(rows).to_csv(d / "train.csv", index=False)
    return czi_dir, csv_dir, truth


def make_cfg(czi_dir, csv_dir, workers=1):
    return Config(
        data=DataConfig(
            adopted_datasets=("taskA", "taskB"),
            path_dataset_csv=str(csv_dir),
            path_dataset_czi=str(czi_dir),
            num_workers=workers,
        )
    )


def test_ingest_split(dataset_dir):
    czi_dir, csv_dir, truth = dataset_dir
    cfg = make_cfg(czi_dir, csv_dir)
    store = ingest_split(cfg, "train")
    assert len(store) == 4
    rec = store[0]
    # z-scored + XY zoomed 40 * 0.37241 -> 15
    assert rec.signal.shape == (6, 15, 15)
    assert rec.target.shape == (6, 15, 15)
    assert abs(float(rec.signal.mean())) < 0.1  # z-score before resize
    assert rec.task == cfg.task_index(rec.dataset)
    assert rec.info["path_czi"].startswith("data/")


def test_ingest_threaded_matches_serial(dataset_dir):
    czi_dir, csv_dir, _ = dataset_dir
    s1 = ingest_split(make_cfg(czi_dir, csv_dir, workers=1), "train")
    s4 = ingest_split(make_cfg(czi_dir, csv_dir, workers=4), "train")
    for a, b in zip(s1.records, s4.records):
        np.testing.assert_array_equal(a.signal, b.signal)
        np.testing.assert_array_equal(a.target, b.target)
        assert a.dataset == b.dataset


def test_ingest_matches_reference_transforms(dataset_dir):
    """Pipeline == normalize (float64 z-score) then scipy zoom, per channel."""
    scipy = pytest.importorskip("scipy")
    import scipy.ndimage

    czi_dir, csv_dir, truth = dataset_dir
    cfg = make_cfg(czi_dir, csv_dir)
    store = ingest_split(cfg, "train")
    rec = store[0]
    name = os.path.basename(rec.info["path_czi"])
    raw = truth[name][0].astype(np.float64)  # channel_signal = 0
    ref = (raw - raw.mean()) / raw.std()
    ref = scipy.ndimage.zoom(ref, (1, 0.37241, 0.37241), mode="nearest")
    np.testing.assert_allclose(rec.signal, ref.astype(np.float32), rtol=1e-6)
