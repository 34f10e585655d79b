"""On-device patch sampling: jitted random crop + flip from a volume bank.

The host PatchSampler (data/sampler.py) mirrors the reference DataLoader.
This module is the TPU-native alternative (SURVEY.md §7.2): volumes live in
device HBM as one stacked (V, D, H, W) bank per split, and a jitted,
PRNG-keyed `sample_batch` draws task-tagged augmented batches entirely
on-device — zero host work and zero host->device transfer per step. Under
data parallelism the bank is replicated (or the batch sharded after
sampling); each step consumes one fresh PRNGKey.

Constraints: one bank holds same-shaped volumes (pad or group by shape at
build time — ingest resizes XY by a fixed factor so shapes cluster tightly).
Augmentation semantics match the host path: uniform crop start per axis,
independent per-axis flips with probability p (SSPdataset.py:137-155) — the
RNG streams differ (jax PRNG vs numpy), which only changes which random
numbers are drawn, not their law.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from repmode_tpu.data.store import VolumeStore


class DeviceVolumeBank:
    """Device-resident stacked volumes + tasks for one split."""

    def __init__(self, signals: jax.Array, targets: jax.Array, tasks: jax.Array):
        self.signals = signals  # (V, D, H, W) fp32
        self.targets = targets  # (V, D, H, W) fp32
        self.tasks = tasks      # (V,) int32

    @property
    def num_volumes(self) -> int:
        return self.signals.shape[0]

    @property
    def vol_shape(self) -> Tuple[int, int, int]:
        return tuple(self.signals.shape[1:])

    @classmethod
    def from_store(cls, store: VolumeStore, device=None) -> "DeviceVolumeBank":
        shapes = {r.signal.shape for r in store.records}
        if len(shapes) != 1:
            raise ValueError(
                f"bank requires uniform volume shapes, got {sorted(shapes)}; "
                "group by shape or pad before building a device bank"
            )
        sig = np.stack([r.signal for r in store.records]).astype(np.float32)
        tgt = np.stack([r.target for r in store.records]).astype(np.float32)
        tasks = np.asarray([r.task for r in store.records], np.int32)
        put = functools.partial(jax.device_put, device=device)
        return cls(put(sig), put(tgt), put(tasks))


def make_device_sampler(
    bank: DeviceVolumeBank,
    batch_size: int,
    patch_size: Tuple[int, int, int],
    flip_prob: float = 0.5,
):
    """Returns jitted sample(key) -> {'signal','target','task'} batch.

    signal/target: (B, pd, ph, pw, 1) fp32; task: (B,) int32.
    """
    pd, ph, pw = (int(p) for p in patch_size)
    vd, vh, vw = bank.vol_shape
    nvol = bank.num_volumes

    def _sample_one(signals, targets, tasks, key):
        k_vol, k_crop, k_flip = jax.random.split(key, 3)
        vidx = jax.random.randint(k_vol, (), 0, nvol)
        limits = jnp.asarray([vd - pd, vh - ph, vw - pw], jnp.int32)
        starts = jax.random.randint(k_crop, (3,), 0, limits + 1)

        def crop(bank_arr):
            vol = jax.lax.dynamic_index_in_dim(bank_arr, vidx, 0, keepdims=False)
            return jax.lax.dynamic_slice(
                vol, (starts[0], starts[1], starts[2]), (pd, ph, pw)
            )

        sig, tgt = crop(signals), crop(targets)
        flips = jax.random.uniform(k_flip, (3,)) <= flip_prob
        for ax in range(3):
            sig = jnp.where(flips[ax], jnp.flip(sig, axis=ax), sig)
            tgt = jnp.where(flips[ax], jnp.flip(tgt, axis=ax), tgt)
        return sig, tgt, tasks[vidx]

    @jax.jit
    def _sample(signals, targets, tasks, key) -> Dict[str, jax.Array]:
        keys = jax.random.split(key, batch_size)
        sig, tgt, task = jax.vmap(
            functools.partial(_sample_one, signals, targets, tasks)
        )(keys)
        return {
            "signal": sig[..., None],
            "target": tgt[..., None],
            "task": task,
        }

    def sample(key) -> Dict[str, jax.Array]:
        # bank arrays are jit ARGUMENTS: closing over them would bake the
        # whole bank into the program as constants (hundreds of MB of HLO)
        return _sample(bank.signals, bank.targets, bank.tasks, key)

    return sample
