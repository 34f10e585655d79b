"""Device mesh + data-parallel sharding.

The TPU-native replacement for the reference's single-process
torch.nn.DataParallel (fnet/fnet_model.py:40-44). Strategy (scaling-book
recipe): build a 1-D 'data' mesh over the slice, shard the batch on it,
replicate params, and let XLA/GSPMD insert the gradient allreduce over ICI
inside the jitted train step. BN batch statistics are computed with global
reductions (sync-BN) — documented deviation from the reference's per-GPU BN
stats (SURVEY.md §7 hard-part #3); it is deterministic w.r.t. device count.

Multi-host extension: jax.distributed.initialize + the same mesh over all
processes; nothing in the step function changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with the leading axis sharded across the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params / train state) on the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
