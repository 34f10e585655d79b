"""Jitted train / eval steps.

Replaces the reference do_train_iter (fnet/fnet_model.py:96-132). Key
behavioral parity: MSE loss meaned over all elements (fnet_model.py:108-109),
Adam step, BN running stats updated. Key TPU differences:

  * the whole step (fwd + bwd + optimizer + BN update) is one jitted,
    donated program — no Python between ops;
  * per-task loss logging (fnet_model.py:115-130) is computed *inside* the
    step as segment sums over the task axis and returned as two small arrays
    (sum, count per task) — no per-iteration device->host sync; the host
    aggregates once per epoch;
  * under a data-parallel mesh the batch arrives sharded on the 'data' axis;
    jnp means become global reductions (XLA inserts the ICI allreduce), so
    gradients and BN batch stats are globally synchronized (sync-BN).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from repmode_tpu.config import Config
from repmode_tpu.models import build_model
from repmode_tpu.train.state import TrainState, make_optimizer

Batch = Dict[str, jax.Array]  # signal (N,D,H,W,C), target (N,D,H,W,C), task (N,)


def _per_task_loss(per_sample_loss: jax.Array, task: jax.Array, num_tasks: int):
    """Segment-sum per-sample losses by task id -> (sums, counts)."""
    onehot = jax.nn.one_hot(task, num_tasks, dtype=per_sample_loss.dtype)  # (N,T)
    sums = onehot.T @ per_sample_loss  # (T,)
    counts = jnp.sum(onehot, axis=0)
    return sums, counts


def make_train_step(
    cfg: Config,
    *,
    donate: bool = True,
    tx: Optional[optax.GradientTransformation] = None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jax.Array]]]:
    net = build_model(cfg)
    tx = tx if tx is not None else make_optimizer(cfg)
    num_tasks = cfg.num_tasks
    monitor = cfg.monitor_model  # grad/param norms (reference wandb.watch,
    #                              main.py:143-149) computed in-step

    def loss_fn(params, batch_stats, batch):
        out, mut = net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["signal"],
            batch["task"],
            train=True,
            mutable=["batch_stats"],
        )
        err = (out - batch["target"]) ** 2
        loss = jnp.mean(err)
        # per-sample mean loss (reference loss_diff, fnet_model.py:119)
        per_sample = jnp.mean(err, axis=(1, 2, 3, 4))
        return loss, (mut["batch_stats"], per_sample)

    def step(state: TrainState, batch: Batch):
        (loss, (new_stats, per_sample)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        sums, counts = _per_task_loss(per_sample, batch["task"], num_tasks)
        metrics = {
            "loss": loss,
            "per_task_loss_sum": sums,
            "per_task_count": counts,
        }
        if monitor:
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["param_norm"] = optax.global_norm(new_params)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_loss_step(cfg: Config):
    """Eval-mode forward + MSE (no param update) for quick validation loss."""
    net = build_model(cfg)

    def step(state: TrainState, batch: Batch):
        out = net.apply(state.variables, batch["signal"], batch["task"], train=False)
        return jnp.mean((out - batch["target"]) ** 2)

    return jax.jit(step)
