"""Dataset CSV tooling: train/val/test splits + DNA-task synthesis.

Functional ports of the reference's offline scripts, preserving their RNG
protocol (np.random.RandomState(seed), pandas sample(frac=1.0)) so the same
seeds reproduce the same splits:
  * split_dataset     — scripts/python/split_dataset.py:17-57 (train/test)
  * make_sampled_dataset — scripts/python/make_dataset.py:8-77 (the 'dna'
    task is sampled from the 11 other datasets, since every image carries a
    DNA channel annotation; README.md:80-81)
Driven by the shell cadence in scripts/dataset/*.sh: split 0.75 train/test,
then 0.9 train/val, dna 54/6/20 samples.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import numpy as np
import pandas as pd


def split_dataset(
    src_csv: str,
    dst_dir: str,
    train_size: Union[int, float] = 0.8,
    seed: int = 42,
    shuffle: bool = True,
    names=("train", "test"),
    name: Optional[str] = None,
) -> Optional[tuple]:
    """Shuffle + head/tail split of one dataset CSV into <dst>/<name>/{a,b}.csv.

    `name` overrides the dataset-directory name; the train/val pass must pass
    the dataset name explicitly because its src is `<ds>/train.csv` (the
    reference's split_dataset_val.py derives it as src.split('/')[-2]).
    """
    if name is None:
        name = os.path.basename(src_csv).split(".")[0]
    out_dir = os.path.join(dst_dir, name)
    path_a = os.path.join(out_dir, f"{names[0]}.csv")
    path_b = os.path.join(out_dir, f"{names[1]}.csv")
    if os.path.exists(path_a) and os.path.exists(path_b):
        return None  # keep existing split (split_dataset.py:32-34)

    rng = np.random.RandomState(seed)
    df_all = pd.read_csv(src_csv)
    if shuffle:
        df_all = df_all.sample(frac=1.0, random_state=rng).reset_index(drop=True)
    if train_size == 0:
        df_a, df_b = df_all[0:0], df_all
    else:
        idx = (
            int(train_size)
            if isinstance(train_size, int) and not isinstance(train_size, bool)
            else round(len(df_all) * float(train_size))
        )
        df_a, df_b = df_all[:idx], df_all[idx:]
    os.makedirs(out_dir, exist_ok=True)
    df_a.to_csv(path_a, index=False)
    df_b.to_csv(path_b, index=False)
    return df_a, df_b


def make_sampled_dataset(
    src_dir: str,
    src_csv: str,
    dst_dir: str,
    ds_type: str,
    used_ds: Sequence[str],
    sample_num: int = 54,
    seed: int = 42,
    shuffle: bool = True,
) -> Optional[pd.DataFrame]:
    """Build a derived task CSV by sampling rows whose images appear in the
    other tasks' splits (make_dataset.py semantics, e.g. the 'dna' task)."""
    ds_name = os.path.basename(src_csv).rstrip(".csv")
    out_dir = os.path.join(dst_dir, ds_name)
    path_out = os.path.join(out_dir, f"{ds_type}.csv")
    if os.path.exists(path_out):
        return None

    rng = np.random.RandomState(seed)
    frames = [
        pd.read_csv(os.path.join(src_dir, ds, f"{ds_type}.csv")) for ds in used_ds
    ]
    df_used = pd.concat(frames)
    df_src = pd.read_csv(src_csv)
    if shuffle:
        df_used = df_used.sample(frac=1.0, random_state=rng).reset_index(drop=True)

    idxs = np.arange(len(df_used))
    rng.shuffle(idxs)
    src_paths = df_src["path_czi"].tolist()
    selected: List[pd.DataFrame] = []
    cnt = 0
    for idx in idxs:
        path = df_used.iloc[idx]["path_czi"]
        if path in src_paths:
            selected.append(df_src[df_src["path_czi"] == path])
            cnt += 1
        if cnt >= sample_num:
            break

    os.makedirs(out_dir, exist_ok=True)
    out = pd.concat(selected)
    out.to_csv(path_out, index=False)
    return out
