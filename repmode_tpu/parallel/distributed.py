"""Multi-host initialization.

The reference has no multi-node path (DataParallel only, fnet_model.py:40-44).
Here multi-host training is the same mesh + jitted step as single-host; only
process bootstrap differs. Call `initialize()` once at program start on every
host (before any jax array op); the data-parallel mesh then spans all hosts'
devices, gradient allreduce rides ICI within a slice and DCN across slices —
no changes to the step function.

Each host feeds its own shard of the global batch (PatchSampler seeded by
process_index keeps augmentation streams independent).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection when args omitted."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
