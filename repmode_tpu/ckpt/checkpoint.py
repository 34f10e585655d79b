"""Checkpoint save/restore (Orbax) + the reference's checkpoint policy.

Reference behavior preserved (fnet/fnet_model.py:57-94, main.py:183-198):
  * a checkpoint carries the FULL training state — params, BN stats,
    optimizer state, iteration & epoch counters — plus the config that
    produced it (the reference pickles `opts` into the state dict);
  * scheduled checkpoints at configured epochs + a rolling 'best' checkpoint
    selected on validation MSE;
  * restore rebuilds the optimizer and resumes from count_epoch.

TPU-native: Orbax writes sharded arrays natively (multi-host safe), and the
config travels as JSON instead of a pickle.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from repmode_tpu.config import Config, expanded_checkpoint_epochs
from repmode_tpu.train.state import TrainState, create_train_state

_STATE_DIR = "state"
_CONFIG_FILE = "config.json"


def save_checkpoint(path: str, state: TrainState, cfg: Config) -> None:
    """Write state + config under `path` (a directory)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, _STATE_DIR), state, force=True)
    with open(os.path.join(path, _CONFIG_FILE), "w") as f:
        f.write(cfg.to_json())


def load_config(path: str) -> Config:
    with open(os.path.join(os.path.abspath(path), _CONFIG_FILE)) as f:
        return Config.from_json(f.read())


def load_checkpoint(path: str, cfg: Optional[Config] = None) -> Tuple[TrainState, Config]:
    """Restore (state, config). Like the reference load_state
    (fnet_model.py:84-94), the *saved* config wins unless one is supplied."""
    path = os.path.abspath(path)
    saved_cfg = load_config(path)
    cfg = cfg if cfg is not None else saved_cfg
    abstract = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.PRNGKey(0))
    )
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, _STATE_DIR), abstract)
    return state, cfg


def restore_train_state(path: str, cfg: Optional[Config] = None) -> Tuple[TrainState, Config]:
    """Alias used by drivers (mirrors fnet.load_model_from_path, functions.py:39-42)."""
    return load_checkpoint(path, cfg)


class CheckpointPolicy:
    """Scheduled + best-on-val-MSE checkpointing (main.py:183-198)."""

    def __init__(self, cfg: Config, checkpoint_dir: str):
        self.cfg = cfg
        self.dir = checkpoint_dir
        self.scheduled = set(expanded_checkpoint_epochs(cfg))
        self.best_metric = float(np.inf)
        self.best_path: Optional[str] = None

    def on_validation(self, epoch: int, val_mse: float, state: TrainState):
        """Called after each validation pass; returns list of saved paths."""
        saved = []
        exp = self.cfg.exp_name
        if (epoch + 1) in self.scheduled:
            p = os.path.join(self.dir, f"model_{exp}_{epoch + 1:04d}")
            save_checkpoint(p, state, self.cfg)
            saved.append(p)
        if val_mse < self.best_metric:
            self.best_metric = val_mse
            p = os.path.join(self.dir, f"model_best_{exp}")
            save_checkpoint(p, state, self.cfg)
            self.best_path = p
            saved.append(p)
        return saved
