"""Train state: params, BN stats, optimizer state, counters.

Replaces the reference Model wrapper's mutable members (fnet/fnet_model.py:16-55:
net + Adam + scaler + count_iter/count_epoch) with one immutable pytree that
jitted steps thread through. No GradScaler: bf16 on TPU needs no loss scaling.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from repmode_tpu.config import Config
from repmode_tpu.models import build_model


@flax.struct.dataclass
class TrainState:
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray   # iteration counter (count_iter, fnet_model.py:30)
    epoch: jnp.ndarray  # epoch counter (count_epoch, fnet_model.py:31)

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam, lr from config, torch defaults (betas 0.9/0.999, eps 1e-8) —
    matching the reference's torch.optim.Adam(lr) (fnet_model.py:55): no
    scheduler, no weight decay, no gradient clipping."""
    return optax.adam(cfg.train.lr, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(cfg: Config, rng: jax.Array) -> TrainState:
    """Initialize model params + optimizer (reference _init_model, fnet_model.py:48-55)."""
    net = build_model(cfg)
    d, h, w = cfg.train.patch_size
    x = jnp.zeros((1, d, h, w, cfg.model.in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    init = jax.jit(functools.partial(net.init, train=True))
    variables = init({"params": rng}, x, t)
    tx = make_optimizer(cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def param_count(state: TrainState) -> int:
    return sum(p.size for p in jax.tree.leaves(state.params))
