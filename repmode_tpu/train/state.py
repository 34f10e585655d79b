"""Train state: params, BN stats, optimizer state, counters.

Replaces the reference Model wrapper's mutable members (fnet/fnet_model.py:16-55:
net + Adam + scaler + count_iter/count_epoch) with one immutable pytree that
jitted steps thread through. No GradScaler: bf16 on TPU needs no loss scaling.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

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


class FlatAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (bias correction)
    mu: jnp.ndarray     # first moment, one flat fp32 vector
    nu: jnp.ndarray     # second moment, one flat fp32 vector


def flat_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam over ONE flattened fp32 buffer instead of per-tensor state.

    Elementwise-identical to optax.adam / torch.optim.Adam (fnet_model.py:55)
    — Adam has no cross-parameter coupling, so raveling changes nothing
    numerically. What it changes is the XLA program: the reference-recipe
    model updates 100+ parameter tensors, and per-tensor Adam lowers to that
    many small kernel-shaped fusions (profiled 14.8 ms/step at full scale,
    ARCHITECTURE.md §12 — ~13x the update's HBM-bandwidth floor). One flat
    (P,) update runs as a single bandwidth-bound fusion; the ravel/unravel
    of the gradient/update trees are pure layout concats/slices XLA fuses.

    Requires all-fp32 leaves (true for every model here; guarded at init).
    """

    def init(params):
        flat, _ = ravel_pytree(params)
        assert flat.dtype == jnp.float32, (
            "flat_adam expects all-fp32 params; mixed dtypes would be "
            f"promoted by ravel_pytree (got {flat.dtype})"
        )
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
        )

    def update(grads, state, params=None):
        del params
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        t = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** t)
        nu_hat = nu / (1.0 - b2 ** t)
        upd = (-lr) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(upd), FlatAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam, lr from config, torch defaults (betas 0.9/0.999, eps 1e-8) —
    matching the reference's torch.optim.Adam(lr) (fnet_model.py:55): no
    scheduler, no weight decay, no gradient clipping. Ships the flat-buffer
    lowering (flat_adam, same math element for element);
    REPMODE_FLAT_ADAM=0 falls back to per-tensor optax.adam for A/B."""
    if os.environ.get("REPMODE_FLAT_ADAM", "1") == "0":
        return optax.adam(cfg.train.lr, b1=0.9, b2=0.999, eps=1e-8)
    return flat_adam(cfg.train.lr, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(
    cfg: Config,
    rng: jax.Array,
    tx: "optax.GradientTransformation | None" = None,
) -> TrainState:
    """Initialize model params + optimizer (reference _init_model, fnet_model.py:48-55).

    `tx` overrides the configured optimizer; it MUST match the `tx` later
    given to make_train_step — opt_state layout is transform-specific
    (flat_adam's 3-field buffer vs optax chains), and a mismatch throws at
    the first update.
    """
    net = build_model(cfg)
    d, h, w = cfg.train.patch_size
    x = jnp.zeros((1, d, h, w, cfg.model.in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    init = jax.jit(functools.partial(net.init, train=True))
    variables = init({"params": rng}, x, t)
    tx = tx if tx is not None else make_optimizer(cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def param_count(state: TrainState) -> int:
    return sum(p.size for p in jax.tree.leaves(state.params))
