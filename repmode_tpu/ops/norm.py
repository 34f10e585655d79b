"""Batch normalization with torch BatchNorm3d semantics.

The reference uses torch.nn.BatchNorm3d after every MoDE conv and every
down/upsample conv (RepMode.py:82,99,147). Torch specifics reproduced here
(flax.linen.BatchNorm differs in the running-var update):

  * normalization uses the *biased* batch variance,
  * the running variance update uses the *unbiased* variance (x n/(n-1)),
  * running = (1 - momentum) * running + momentum * batch, momentum = 0.1.

Stats are computed in fp32 over (N, D, H, W). Under data parallelism the
batch axis is sharded and jnp.mean/var inside jit become global reductions —
i.e. sync-BN across the mesh (stronger than the reference's per-GPU
DataParallel stats, fnet_model.py:40-44; documented per SURVEY.md section 7
hard-part #3).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_AXES = (0, 1, 2, 3)  # reduce over N, D, H, W


def batch_norm_apply(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Normalize with given statistics (eval mode / after stats computation)."""
    dt = jnp.promote_types(x.dtype, jnp.float32)  # fp32 floor; fp64 stays fp64
    x32 = x.astype(dt)
    inv = jax.lax.rsqrt(var.astype(dt) + eps)
    return (x32 - mean) * inv * scale + bias


def batch_norm_train(
    x: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axes: Tuple[int, ...] = _AXES,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Training mode: normalize by batch stats, return updated running stats.

    `axes` are the reduction axes (default: N,D,H,W of a 5D tensor; s2d-domain
    callers reduce every axis but the native channel). Returns
    (y, new_running_mean, new_running_var).
    """
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    bmean = jnp.mean(x32, axis=axes)
    bvar = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(bmean)
    bvar = jnp.maximum(bvar, 0.0)
    y = batch_norm_apply(x32, bmean, bvar, scale, bias, eps)

    n = 1
    for ax in axes:
        n *= x.shape[ax]
    unbiased = bvar * (n / max(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean + momentum * bmean
    new_var = (1.0 - momentum) * running_var + momentum * unbiased
    return y, new_mean, new_var
