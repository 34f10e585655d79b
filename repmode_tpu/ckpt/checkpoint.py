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
import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np
import optax
import orbax.checkpoint as ocp
from jax.flatten_util import ravel_pytree

from repmode_tpu.config import Config, expanded_checkpoint_epochs
from repmode_tpu.train.state import (
    FlatAdamState,
    TrainState,
    create_train_state,
    flat_adam,
    make_optimizer,
)

_STATE_DIR = "state"
_CONFIG_FILE = "config.json"
_META_FILE = "meta.json"

logger = logging.getLogger(__name__)

# Optimizer state schemas a checkpoint can carry. 'flat' = FlatAdamState
# (one raveled mu/nu buffer, the make_optimizer default since round 4);
# 'per_tensor' = optax.adam's chain state (per-leaf mu/nu trees, the
# pre-round-4 layout and the REPMODE_FLAT_ADAM=0 escape). Adam has no
# cross-parameter coupling, so the two are the same numbers in different
# layouts — restore migrates between them losslessly via ravel_pytree.
_SCHEMAS = ("flat", "per_tensor")


def _schema_of_opt_state(opt_state) -> Optional[str]:
    if isinstance(opt_state, FlatAdamState):
        return "flat"
    if (
        isinstance(opt_state, tuple)
        and len(opt_state) >= 1
        and isinstance(opt_state[0], optax.ScaleByAdamState)
    ):
        return "per_tensor"
    return None  # custom tx (e.g. tests' SGD) — no migration support


def _tx_for_schema(cfg: Config, schema: str) -> optax.GradientTransformation:
    if schema == "flat":
        return flat_adam(cfg.train.lr)
    return optax.adam(cfg.train.lr, b1=0.9, b2=0.999, eps=1e-8)


def _migrate_opt_state(opt_state, params, target: str):
    """Relayout an Adam opt_state between 'flat' and 'per_tensor'.

    ravel_pytree's leaf order over the mu/nu trees matches its order over
    `params` (identical tree structure), so flat<->per-tensor is a pure
    relayout of the same moment values; `count` carries over unchanged.
    """
    source = _schema_of_opt_state(opt_state)
    if source == target:
        return opt_state
    if source == "per_tensor" and target == "flat":
        adam_state = opt_state[0]
        mu, _ = ravel_pytree(adam_state.mu)
        nu, _ = ravel_pytree(adam_state.nu)
        return FlatAdamState(
            count=jax.numpy.asarray(adam_state.count, jax.numpy.int32),
            mu=mu, nu=nu,
        )
    if source == "flat" and target == "per_tensor":
        _, unravel = ravel_pytree(params)
        return (
            optax.ScaleByAdamState(
                count=jax.numpy.asarray(opt_state.count, jax.numpy.int32),
                mu=unravel(opt_state.mu),
                nu=unravel(opt_state.nu),
            ),
            optax.EmptyState(),
        )
    raise ValueError(
        f"cannot migrate optimizer state from schema {source!r} to {target!r}"
    )


def save_checkpoint(path: str, state: TrainState, cfg: Config) -> None:
    """Write state + config under `path` (a directory). A meta.json records
    the optimizer-state schema so restore needn't guess (reference analog:
    the checkpoint pickle embeds the full opts, fnet_model.py:57-65)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, _STATE_DIR), state, force=True)
    with open(os.path.join(path, _CONFIG_FILE), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump({"opt_schema": _schema_of_opt_state(state.opt_state)}, f)


def load_config(path: str) -> Config:
    with open(os.path.join(os.path.abspath(path), _CONFIG_FILE)) as f:
        return Config.from_json(f.read())


def _load_meta(path: str) -> dict:
    p = os.path.join(path, _META_FILE)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _restore_with_schema(path: str, cfg: Config, schema: Optional[str]) -> TrainState:
    tx = _tx_for_schema(cfg, schema) if schema in _SCHEMAS else None
    abstract = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.PRNGKey(0), tx=tx)
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, _STATE_DIR), abstract)


def load_checkpoint(path: str, cfg: Optional[Config] = None) -> Tuple[TrainState, Config]:
    """Restore (state, config). Like the reference load_state
    (fnet_model.py:84-94), the *saved* config wins unless one is supplied.

    Optimizer-schema compatible: a checkpoint saved under either Adam
    layout (per-tensor optax.adam, pre-round-4 / REPMODE_FLAT_ADAM=0;
    or the flat-buffer FlatAdamState default) restores under either
    current setting — the saved moments are relayouted to the current
    optimizer's schema so training resumes with identical math.
    """
    path = os.path.abspath(path)
    saved_cfg = load_config(path)
    cfg = cfg if cfg is not None else saved_cfg

    current_tx = make_optimizer(cfg)
    abstract_params = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.PRNGKey(0))
    ).params
    current_schema = _schema_of_opt_state(
        jax.eval_shape(current_tx.init, abstract_params)
    )

    saved_schema = _load_meta(path).get("opt_schema")
    if saved_schema in _SCHEMAS:
        order = [saved_schema]
    else:
        # pre-meta.json checkpoint: try the current layout first, then the
        # alternate (pre-round-4 checkpoints are per-tensor Adam)
        order = [current_schema] + [s for s in _SCHEMAS if s != current_schema]

    errors = []
    state = None
    restored_schema = None
    for schema in order:
        try:
            state = _restore_with_schema(path, cfg, schema)
            restored_schema = schema
            break
        except Exception as e:  # orbax raises ValueError/KeyError on tree mismatch
            errors.append(f"  as {schema!r}: {type(e).__name__}: {e}")
    if state is None:
        raise ValueError(
            f"could not restore checkpoint at {path} under any known "
            f"optimizer-state schema {order}; if it was saved with a custom "
            "optimizer, set REPMODE_FLAT_ADAM accordingly or restore with "
            "the matching transform. Attempts:\n" + "\n".join(errors)
        )

    if restored_schema != current_schema and current_schema in _SCHEMAS:
        logger.info(
            "migrating optimizer state %s -> %s for checkpoint %s",
            restored_schema, current_schema, path,
        )
        state = state.replace(
            opt_state=_migrate_opt_state(state.opt_state, state.params, current_schema)
        )
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
