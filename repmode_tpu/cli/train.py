"""Train + eval entry point (reference main.py).

    python -m repmode_tpu.cli.train --path_exp_dir exps/my_exp [...]
    python -m repmode_tpu.cli.train --synthetic --num_epochs 2 [...]
"""

from __future__ import annotations

import json
import random
import time

import numpy as np

from repmode_tpu.cli.args import build_parser, to_config
from repmode_tpu.data import VolumeStore, synthetic_store
from repmode_tpu.train.loop import ExperimentDirs, run_experiment
from repmode_tpu.utils.logging import setup_logger
from repmode_tpu.utils.tracking import Tracker


def build_stores(cfg, logger, synthetic: bool = False):
    """Load train/val/test VolumeStores (reference main.py:118-120)."""
    stores = {}
    if synthetic:
        for i, split in enumerate(["train", "val", "test"]):
            stores[split] = synthetic_store(
                cfg.data.adopted_datasets, volumes_per_task=2, seed=cfg.train.seed + i
            )
            logger.info(f"[DATASET] Synthetic {split}: {len(stores[split])} volumes")
        return stores

    if cfg.data.path_load_dataset:
        for split in ["train", "val", "test"]:
            try:
                stores[split] = VolumeStore.load(
                    cfg.data.path_load_dataset, split, cfg.data.adopted_datasets
                )
                logger.info(
                    f"[DATASET] {split} loaded from {cfg.data.path_load_dataset}: "
                    f"{len(stores[split])} volumes"
                )
            except FileNotFoundError:
                logger.info(f"[DATASET] no {split} manifest — skipped")
        if stores:
            return stores

    # fall back to CZI ingest (reference SSPdataset slow path, SSPdataset.py:45-87)
    from repmode_tpu.data.ingest import ingest_split

    for split in ["train", "val", "test"]:
        stores[split] = ingest_split(cfg, split, logger)
        if cfg.data.path_save_dataset:
            stores[split].save(cfg.data.path_save_dataset, split)
            logger.info(f"[DATASET] {split} saved to {cfg.data.path_save_dataset}")
    return stores


def snapshot_sources(cfg):
    """Key source files to snapshot into the run record (reference
    main.py:100-106 wandb.save of SSPdataset/fnet_model/<nn_module>/config)."""
    import os

    import repmode_tpu

    pkg = os.path.dirname(repmode_tpu.__file__)
    model_file = {"RepMode": "repmode.py", "UNet": "unet.py"}.get(cfg.model.name)
    files = [
        os.path.join(pkg, "data", "sampler.py"),
        os.path.join(pkg, "train", "step.py"),
        os.path.join(pkg, "config.py"),
    ]
    if model_file:
        files.insert(2, os.path.join(pkg, "models", model_file))
    return files


def main(argv=None):
    t0 = time.time()
    ns = build_parser().parse_args(argv)
    cfg = to_config(ns)

    # seed host RNGs (main.py:28-32; device RNG is explicit PRNGKey threading)
    random.seed(cfg.train.seed)
    np.random.seed(cfg.train.seed)

    dirs = ExperimentDirs(cfg)
    logger = setup_logger(dirs.logs, cfg.exp_name)
    logger.info("[ACTION]  Loading dataset ...")
    logger.info(f"[DATASET] Adopted datasets: {cfg.data.adopted_datasets}")

    tracker = Tracker(
        dirs.logs,
        run_name=cfg.run_name,
        config=json.loads(cfg.to_json()),
        tags=cfg.tags,
        offline=cfg.debugging or cfg.exp_name == "integ_dataset",
        run_id=ns.id,
        code_files=snapshot_sources(cfg),
    )

    stores = build_stores(cfg, logger, synthetic=ns.synthetic)
    logger.info("[TIME]    Elapsed time: {:.1f} s".format(time.time() - t0))

    results = run_experiment(cfg, stores, logger=logger, tracker=tracker)
    logger.info("[TIME]    Elapsed time: {:.1f} s".format(time.time() - t0))
    return results


if __name__ == "__main__":
    main()
