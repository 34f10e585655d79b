"""Offline CZI -> VolumeStore ingest.

The rebuild of the reference's dataset slow path (fnet/data/SSPdataset.py:45-87):
per-dataset CSVs (schema: path_czi, channel_signal, channel_target, ...) are
concatenated, each row's CZI is decoded, the signal/target channels extracted,
z-score normalized in float64 (fnet/transforms.py:9-14) and XY-rescaled
0.108 -> 0.29 um/px with scipy.ndimage.zoom(..., mode='nearest')
(transforms.py:190-200, factors SSPdataset.py:22-25). Results land in an
in-RAM VolumeStore and can be persisted as npz + manifest (store.save —
replacing the reference's torch .pth pickles, SSPdataset.py:90-100).
"""

from __future__ import annotations

import os
import numpy as np
import pandas as pd

from repmode_tpu.config import Config
from repmode_tpu.data.czi import CziVolumeReader
from repmode_tpu.data.store import VolumeRecord, VolumeStore


def normalize(img: np.ndarray) -> np.ndarray:
    """Float64 z-score (transforms.py:9-14)."""
    result = img.astype(np.float64)
    result -= np.mean(result)
    result /= np.std(result)
    return result


def resize(img: np.ndarray, factors) -> np.ndarray:
    """scipy zoom, spline order 3, mode 'nearest' (transforms.py:197)."""
    import scipy.ndimage

    return scipy.ndimage.zoom(img, tuple(factors), mode="nearest")


def load_split_dataframe(cfg: Config, split: str) -> pd.DataFrame:
    """Concat per-dataset CSVs with a 'dataset' column (SSPdataset.py:46-53)."""
    csvs = []
    for ds_name in cfg.data.adopted_datasets:
        path_csv = os.path.join(cfg.data.path_dataset_csv, ds_name, f"{split}.csv")
        single = pd.read_csv(path_csv)
        single.insert(loc=0, column="dataset", value=ds_name)
        csvs.append(single)
    df = pd.concat(csvs)
    required = ["path_czi", "channel_signal", "channel_target"]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"CSV missing columns: {missing}")
    return df


def ingest_row(cfg: Config, row) -> VolumeRecord:
    """Decode + transform one CSV row."""
    # reference strips the leading 'data' from path_czi (SSPdataset.py:61)
    path_czi = cfg.data.path_dataset_czi + str(row["path_czi"]).lstrip("data")
    reader = CziVolumeReader(path_czi)

    has_target = not np.isnan(row["channel_target"])
    factors = cfg.data.resize_factors

    signal = resize(normalize(reader.get_volume(int(row["channel_signal"]))), factors)
    target = None
    if has_target:
        target = resize(
            normalize(reader.get_volume(int(row["channel_target"]))), factors
        ).astype(np.float32)

    datasets = cfg.data.adopted_datasets
    ds = row["dataset"]
    return VolumeRecord(
        signal=signal.astype(np.float32),
        target=target,
        dataset=ds,
        task=datasets.index(ds),
        info=dict(row),
    )


def ingest_split(cfg: Config, split: str, logger=None) -> VolumeStore:
    """Decode a whole split; rows run in a thread pool (cfg.data.num_workers —
    the reference burned DataLoader worker *processes* on this; numpy/scipy
    release the GIL for the heavy parts)."""
    df = load_split_dataframe(cfg, split)
    rows = [df.iloc[i] for i in range(len(df))]
    workers = max(1, int(cfg.data.num_workers))
    if workers == 1 or len(rows) <= 1:
        records = [ingest_row(cfg, r) for r in rows]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            records = list(ex.map(lambda r: ingest_row(cfg, r), rows))
    if logger is not None:
        logger.info(
            f"[DATASET] {split} ingested with CziVolumeReader ({len(df)} volumes)"
        )
    return VolumeStore(records, cfg.data.adopted_datasets)
