"""Experiment orchestration: train -> periodic val -> best checkpoint -> test.

The rebuild of the reference driver (main.py:21-234, run_train:240-266,
run_eval:269-326). Behavioral parity:

  * epoch loop from state.epoch (resume, main.py:157-158), validation every
    interval_val epochs, scheduled + best-on-val-MSE checkpoints;
  * eval iterates full volumes (batch 1, unshuffled — functions.py:47-48)
    through sliding-window prediction and aggregates per-volume MSE/MAE/R²
    per dataset and overall, written as comp_/spec_/final_ CSVs;
  * after training, the best checkpoint is reloaded and tested.

TPU-native structure:

  * one jitted train step (fwd+bwd+opt+BN) consuming prefetched host batches;
    per-task losses accumulate on device, transferred once per epoch;
  * before each eval pass the network is re-parameterized ONCE per task
    (models/reparam.py) — sliding-window inference runs the folded plain
    conv net, not the gated MoDE net;
  * under data parallelism the batch is sharded over the mesh and the ragged
    tail batch is padded to static shape (sampler) to avoid recompilation.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from repmode_tpu.ckpt import CheckpointPolicy, restore_train_state
from repmode_tpu.config import Config
from repmode_tpu.data.sampler import PatchSampler
from repmode_tpu.data.store import VolumeStore
from repmode_tpu.infer.predict import TiledPredictor
from repmode_tpu.metrics import MetricAggregator, metric_stats
from repmode_tpu.models.reparam import make_inference
from repmode_tpu.parallel import make_mesh, replicate, shard_batch
from repmode_tpu.train.state import TrainState, create_train_state, param_count
from repmode_tpu.train.step import make_train_step
from repmode_tpu.utils.tracking import Tracker


class ExperimentDirs:
    """exps/<exp>/{logs,checkpoints,metrics,preds} (main.py:35-54)."""

    def __init__(self, cfg: Config):
        base = cfg.path_exp_dir or os.path.join("exps", cfg.exp_name)
        self.base = base
        self.logs = os.path.join(base, "logs")
        self.checkpoints = os.path.join(base, "checkpoints")
        self.metrics = os.path.join(base, "metrics")
        self.preds = os.path.join(base, "preds")
        for d in (self.logs, self.checkpoints, self.metrics, self.preds):
            os.makedirs(d, exist_ok=True)


def run_train_epoch(
    cfg: Config,
    state: TrainState,
    step_fn,
    sampler: PatchSampler,
    epoch: int,
    mesh=None,
) -> tuple:
    """One epoch; returns (state, log_dict). Host sync once, at epoch end."""
    t0 = time.perf_counter()
    num_tasks = cfg.num_tasks
    loss_sum = 0.0
    n_batches = 0
    task_sums = np.zeros(num_tasks, np.float64)
    task_counts = np.zeros(num_tasks, np.float64)
    pending = []  # device metric dicts; drained at epoch end

    for batch in sampler.epoch(pad_tail_to_batch=mesh is not None):
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch)
        pending.append(metrics)
        n_batches += 1

    grad_norms = []
    for metrics in pending:  # single sync point
        loss_sum += float(metrics["loss"])
        task_sums += np.asarray(metrics["per_task_loss_sum"], np.float64)
        task_counts += np.asarray(metrics["per_task_count"], np.float64)
        if "grad_norm" in metrics:
            grad_norms.append(float(metrics["grad_norm"]))

    state = state.replace(epoch=state.epoch + 1)
    log = {"X-axis/epoch": epoch + 1}
    log["loss/epoch"] = loss_sum / max(n_batches, 1)
    for i, name in enumerate(cfg.data.adopted_datasets):
        if task_counts[i] > 0:
            log[f"loss_epoch/{name}"] = task_sums[i] / task_counts[i]
    if grad_norms:
        log["monitor/grad_norm"] = float(np.mean(grad_norms))
        log["monitor/param_norm"] = float(pending[-1]["param_norm"])
    log["time/train"] = time.perf_counter() - t0
    return state, log


def run_train_epoch_device(
    cfg: Config,
    state: TrainState,
    step_fn,
    sample_fn,
    steps: int,
    epoch: int,
    key,
) -> tuple:
    """Epoch with the on-device pipeline: jitted sampling feeds the jitted
    step; no host work inside the loop. The sampler visits every volume once
    per epoch via an on-device permutation (device_sampler module doc)."""
    t0 = time.perf_counter()
    num_tasks = cfg.num_tasks
    pending = []
    for s in range(steps):
        state, metrics = step_fn(state, sample_fn(key, epoch, s))
        pending.append(metrics)

    loss_sum = 0.0
    task_sums = np.zeros(num_tasks, np.float64)
    task_counts = np.zeros(num_tasks, np.float64)
    for metrics in pending:
        loss_sum += float(metrics["loss"])
        task_sums += np.asarray(metrics["per_task_loss_sum"], np.float64)
        task_counts += np.asarray(metrics["per_task_count"], np.float64)

    state = state.replace(epoch=state.epoch + 1)
    log = {"X-axis/epoch": epoch + 1, "loss/epoch": loss_sum / max(steps, 1)}
    for i, name in enumerate(cfg.data.adopted_datasets):
        if task_counts[i] > 0:
            log[f"loss_epoch/{name}"] = task_sums[i] / task_counts[i]
    log["time/train"] = time.perf_counter() - t0
    return state, log


def run_eval_pass(
    cfg: Config,
    state: TrainState,
    store: VolumeStore,
    predictor: TiledPredictor,
    eval_type: str,
    epoch: Optional[int] = None,
    pred_dir: Optional[str] = None,
) -> tuple:
    """Full-volume eval over a store; returns (log_dict, aggregator)."""
    t0 = time.perf_counter()
    agg = MetricAggregator()
    variables = state.variables
    prepare, _ = make_inference(cfg)  # predictor was built with the same cfg
    plain_cache: Dict[int, dict] = {}

    for i in range(len(store)):
        rec = store[i]
        if rec.task not in plain_cache:
            plain_cache[rec.task] = prepare(variables, rec.task)
        pred = predictor(plain_cache[rec.task], rec.signal)
        pred_np = np.asarray(pred)
        stats = metric_stats(pred_np, rec.target)
        agg.add(rec.dataset, rec.info.get("path_czi", str(i)), stats)

        if eval_type == "test" and pred_dir is not None:
            if cfg.eval.save_test_preds:
                _save_volume(pred_dir, i, "pred", rec, pred_np)
            if cfg.eval.save_test_signals_and_targets:
                _save_volume(pred_dir, i, "signal", rec, rec.signal)
                _save_volume(pred_dir, i, "target", rec, rec.target)

    log = agg.log_dict(eval_type, epoch if eval_type == "val" else None)
    log[f"time/{eval_type}"] = time.perf_counter() - t0
    return log, agg


def _save_volume(pred_dir: str, idx: int, kind: str, rec, arr: np.ndarray):
    """Save as multi-page float32 TIFF (reference format, main.py:288-297)
    using the first-party writer (utils/tiff.py)."""
    from repmode_tpu.utils import tiff

    img_id = os.path.basename(rec.info.get("path_czi", f"{idx}")).rstrip(".czi")
    base = os.path.join(pred_dir, f"{idx:0>3d}_{kind}_{rec.dataset}_{img_id}")
    tiff.imwrite(base + ".tiff", np.asarray(arr, np.float32))


def run_experiment(
    cfg: Config,
    stores: Dict[str, VolumeStore],
    logger=None,
    tracker: Optional[Tracker] = None,
) -> Dict:
    """Full train+val+test experiment (reference main.main, main.py:21-234)."""
    import logging

    logger = logger or logging.getLogger("SSP")
    dirs = ExperimentDirs(cfg)
    tracker = tracker or Tracker(dirs.logs, offline=True)

    with open(os.path.join(dirs.logs, f"train_options_{cfg.exp_name}.json"), "w") as f:
        f.write(cfg.to_json())

    # mesh
    mesh = None
    if cfg.train.num_devices > 1:
        mesh = make_mesh(cfg.train.num_devices)
        logger.info(f"[MESH]    Data-parallel mesh over {cfg.train.num_devices} devices")

    # model init / resume (main.py:129-138)
    if cfg.path_load_model and os.path.exists(cfg.path_load_model):
        state, _ = restore_train_state(cfg.path_load_model, cfg)
        logger.info(f"[MODEL]   Model loaded from: {cfg.path_load_model}")
    else:
        state = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
        logger.info(f"[MODEL]   Model initialized as: {cfg.model.name}")
    logger.info(f"[MODEL]   Parameters: {param_count(state):,}")
    if mesh is not None:
        state = replicate(mesh, state)

    step_fn = make_train_step(cfg)
    sampler = None
    device_sample = None
    steps_per_epoch = 0
    if "train" in stores and len(stores["train"]):
        from repmode_tpu.data.device_sampler import (
            DeviceVolumeBank,
            make_device_sampler,
        )

        # on-device pipeline: measured 1252 vs 1526 ms/step at full scale
        # (ARCHITECTURE.md); auto-on when the padded bank fits the budget
        use_device = cfg.train.on_device_pipeline
        if use_device is None:
            bank_bytes = DeviceVolumeBank.padded_nbytes(stores["train"])
            use_device = 0 < bank_bytes <= cfg.train.device_bank_budget_bytes
            if not use_device:
                logger.info(
                    f"[DATA]    Device bank would need {bank_bytes / 1e9:.2f} "
                    "GB > budget — using the host pipeline"
                )
        if use_device:
            bank = DeviceVolumeBank.from_store(stores["train"])
            device_sample, steps_per_epoch = make_device_sampler(
                bank, cfg.train.batch_size, cfg.train.patch_size,
                cfg.train.random_flip_prob, mesh=mesh,
            )
            logger.info(
                f"[DATA]    On-device pipeline: bank of {bank.num_volumes} "
                f"volumes padded to {bank.vol_shape} in HBM "
                "(once-per-volume permutation epochs)"
            )
        else:
            sampler = PatchSampler(
                stores["train"],
                cfg.train.batch_size,
                cfg.train.patch_size,
                seed=cfg.train.seed,
                flip_prob=cfg.train.random_flip_prob,
            )
    # Under DP, eval must use all devices: the two_phase predictor shards
    # the patch grid over the mesh (infer/predict.py), so it is the
    # effective mode whenever a mesh exists — the default 'fused' predictor
    # is a single-device program and would silently evaluate on one chip.
    pred_mode = cfg.eval.predictor
    if mesh is not None and pred_mode == "fused":
        pred_mode = "two_phase"
        logger.info(
            "[EVAL]    DP mesh: predictor fused -> two_phase "
            "(patch grid sharded over all devices)"
        )
    predictor = TiledPredictor(
        cfg, mode=pred_mode, mesh=mesh if pred_mode == "two_phase" else None
    )
    policy = CheckpointPolicy(cfg, dirs.checkpoints)

    # epoch loop (main.py:156-199)
    # REPMODE_PROFILE_DIR=<dir> captures a jax.profiler trace of the first
    # trained epoch (SURVEY.md §5.1: profiling as a first-class module).
    profile_dir = os.environ.get("REPMODE_PROFILE_DIR")
    start_epoch = int(state.epoch)
    sample_key = jax.random.PRNGKey(cfg.train.seed + 1)

    def train_one_epoch(state, epoch):
        if device_sample is not None:
            return run_train_epoch_device(
                cfg, state, step_fn, device_sample, steps_per_epoch, epoch,
                sample_key,
            )
        return run_train_epoch(cfg, state, step_fn, sampler, epoch, mesh)

    for epoch in range(start_epoch, cfg.train.num_epochs):
        if profile_dir and epoch == start_epoch:
            from repmode_tpu.utils.timing import profile_trace

            with profile_trace(profile_dir):
                state, log = train_one_epoch(state, epoch)
        else:
            state, log = train_one_epoch(state, epoch)
        logger.info(
            "[TRAIN]   NO.{} epoch training | loss: {:.6f}".format(
                epoch + 1, log["loss/epoch"]
            )
        )
        tracker.log(log)

        if (epoch + 1) % cfg.train.interval_val == 0 and "val" in stores:
            val_log, _ = run_eval_pass(
                cfg, state, stores["val"], predictor, "val", epoch
            )
            logger.info(
                "[VAL]     NO.{} epoch validation | MSE: {:.6f}".format(
                    epoch + 1, val_log["metric_val/MSE"]
                )
            )
            tracker.log(val_log)
            saved = policy.on_validation(epoch, val_log["metric_val/MSE"], state)
            for p in saved:
                logger.info(f"[MODEL]   Checkpoint saved to: {p}")
            if policy.best_path in saved:
                tracker.set_summary("metric_val/MSE_best@epoch", epoch + 1)
                tracker.set_summary("metric_val/MSE_best", policy.best_metric)

    # reload best + final test (main.py:209-225)
    if policy.best_path is not None:
        state, _ = restore_train_state(policy.best_path, cfg)
        if mesh is not None:
            state = replicate(mesh, state)
        logger.info(f"[ACTION]  Evaluate model: {policy.best_path}")
        tracker.set_summary("path_eval_model", policy.best_path)

    results: Dict = {"state": state, "best_path": policy.best_path}
    if "test" in stores:
        test_log, agg = run_eval_pass(
            cfg, state, stores["test"], predictor, "test", pred_dir=dirs.preds
        )
        logger.info("[TEST]    Test | MSE: {:.6f}".format(test_log["metric_test/MSE"]))
        agg.to_csvs(dirs.metrics, cfg.exp_name)
        for k, v in test_log.items():
            tracker.set_summary(k, v)
        results["test_log"] = test_log

    tracker.finish()
    logger.info("[ACTION]  Experiment ends.")
    return results
