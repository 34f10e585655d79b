"""Per-volume evaluation metrics: MSE, MAE, R².

Matches the reference's sklearn-based get_metric_stats (fnet/metric.py:7-34)
on flattened volumes: MSE = mean((p-t)^2), MAE = mean|p-t|,
R² = 1 - SS_res/SS_tot with SS_tot centered on the *target* mean (sklearn
r2_score convention). Host path computes in float64 exactly like sklearn;
the device path is a jittable fp32 version for in-loop validation.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def metric_stats(pred, target) -> Dict[str, float]:
    """Host (numpy, float64) metrics on arbitrary-shaped arrays."""
    p = np.asarray(pred, np.float64).ravel()
    t = np.asarray(target, np.float64).ravel()
    err = p - t
    mse = float(np.mean(err**2))
    mae = float(np.mean(np.abs(err)))
    ss_res = float(np.sum(err**2))
    ss_tot = float(np.sum((t - t.mean()) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    return {"MSE": mse, "MAE": mae, "R2": r2}


@jax.jit
def metric_stats_device(pred: jax.Array, target: jax.Array) -> Dict[str, jax.Array]:
    """On-device fp32 metrics (single fused reduction pass)."""
    p = pred.astype(jnp.float32).ravel()
    t = target.astype(jnp.float32).ravel()
    err = p - t
    mse = jnp.mean(err**2)
    mae = jnp.mean(jnp.abs(err))
    ss_res = jnp.sum(err**2)
    ss_tot = jnp.sum((t - jnp.mean(t)) ** 2)
    r2 = jnp.where(ss_tot > 0, 1.0 - ss_res / ss_tot, 0.0)
    return {"MSE": mse, "MAE": mae, "R2": r2}
