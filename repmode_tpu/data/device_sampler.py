"""On-device patch sampling: jitted random crop + flip from a volume bank.

The host PatchSampler (data/sampler.py) mirrors the reference DataLoader.
This module is the TPU-native alternative (SURVEY.md §7.2): volumes live in
device HBM as one stacked (V, D, H, W) bank per split, and a jitted,
PRNG-keyed `sample` draws task-tagged augmented batches entirely on-device —
zero host work and zero host->device transfer per step.

Sampling law matches the reference exactly (SSPdataset.py:137-155 +
DataLoader shuffle, functions.py:47): every epoch visits each volume ONCE in
a fresh random permutation, drawing one random crop + independent per-axis
flips per visit; the ragged tail batch is padded with extra random volumes
(same semantics as PatchSampler.epoch(pad_tail_to_batch=True), which the DP
host path uses for static shapes).

Non-uniform volumes are supported by padding the bank to the max shape and
bounding each crop by the true per-volume extents — padding voxels are never
read. Under data parallelism pass `mesh`: sampled batches come out sharded
on the 'data' axis, so the sampler's output feeds the sharded train step
without a host round-trip.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from repmode_tpu.data.store import VolumeStore


class DeviceVolumeBank:
    """Device-resident stacked volumes + tasks + true extents for one split."""

    def __init__(self, signals: jax.Array, targets: jax.Array,
                 tasks: jax.Array, extents: jax.Array):
        self.signals = signals  # (V, Dm, Hm, Wm) fp32, zero-padded
        self.targets = targets  # (V, Dm, Hm, Wm) fp32, zero-padded
        self.tasks = tasks      # (V,) int32
        self.extents = extents  # (V, 3) int32: true (D, H, W) per volume

    @property
    def num_volumes(self) -> int:
        return self.signals.shape[0]

    @property
    def vol_shape(self) -> Tuple[int, int, int]:
        return tuple(self.signals.shape[1:])

    @staticmethod
    def padded_nbytes(store: VolumeStore) -> int:
        """HBM footprint of a bank built from this store (signal+target fp32)."""
        shapes = [r.signal.shape for r in store.records]
        if not shapes:
            return 0
        mx = tuple(max(s[i] for s in shapes) for i in range(3))
        return 2 * len(shapes) * int(np.prod(mx)) * 4

    @classmethod
    def from_store(cls, store: VolumeStore, device=None) -> "DeviceVolumeBank":
        shapes = [r.signal.shape for r in store.records]
        mx = tuple(max(s[i] for s in shapes) for i in range(3))
        v = len(store.records)
        sig = np.zeros((v, *mx), np.float32)
        tgt = np.zeros((v, *mx), np.float32)
        ext = np.zeros((v, 3), np.int32)
        for i, r in enumerate(store.records):
            d, h, w = r.signal.shape
            sig[i, :d, :h, :w] = r.signal
            tgt[i, :d, :h, :w] = r.target
            ext[i] = (d, h, w)
        tasks = np.asarray([r.task for r in store.records], np.int32)
        put = functools.partial(jax.device_put, device=device)
        return cls(put(sig), put(tgt), put(tasks), put(ext))


def make_device_sampler(
    bank: DeviceVolumeBank,
    batch_size: int,
    patch_size: Tuple[int, int, int],
    flip_prob: float = 0.5,
    mesh=None,
):
    """Returns (sample, steps_per_epoch); sample(key, epoch, step) ->
    {'signal','target','task'} with signal/target (B, pd, ph, pw, 1) fp32.

    One `key` serves the whole run: the epoch permutation derives from
    fold_in(key, epoch) and per-sample crops/flips from the (epoch, step)
    stream, so resuming at any (epoch, step) reproduces the schedule.
    """
    pd, ph, pw = (int(p) for p in patch_size)
    nvol = bank.num_volumes
    ext_min = np.asarray(jax.device_get(bank.extents)).min(axis=0)
    if (ext_min < np.asarray([pd, ph, pw])).any():
        raise ValueError(
            f"volumes smaller than the patch {patch_size}: min extents "
            f"{tuple(int(e) for e in ext_min)} (reference data_aug requires "
            "volume >= patch, SSPdataset.py:139-148)"
        )
    steps_per_epoch = -(-nvol // batch_size)
    padded_len = steps_per_epoch * batch_size

    def _sample_one(signals, targets, tasks, extents, vidx, key):
        k_crop, k_flip = jax.random.split(key, 2)
        limits = extents[vidx] - jnp.asarray([pd, ph, pw], jnp.int32)
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

    def _sample(signals, targets, tasks, extents, key, epoch, step):
        k_epoch = jax.random.fold_in(key, epoch)
        order = jax.random.permutation(k_epoch, nvol)
        if padded_len > nvol:  # tail pad: extra random volumes (host parity)
            pad = jax.random.randint(
                jax.random.fold_in(k_epoch, 0x9E3779B9),
                (padded_len - nvol,), 0, nvol,
            )
            order = jnp.concatenate([order, order[pad]])
        vidxs = jax.lax.dynamic_slice(
            order, (step * batch_size,), (batch_size,)
        )
        keys = jax.random.split(
            jax.random.fold_in(k_epoch, step + 1), batch_size
        )
        sig, tgt, task = jax.vmap(
            functools.partial(_sample_one, signals, targets, tasks, extents)
        )(vidxs, keys)
        return {"signal": sig[..., None], "target": tgt[..., None], "task": task}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("data"))
        out_sh = {"signal": sh, "target": sh, "task": sh}
        _sample_jit = jax.jit(_sample, out_shardings=out_sh)
    else:
        _sample_jit = jax.jit(_sample)

    def sample(key, epoch, step) -> Dict[str, jax.Array]:
        # bank arrays are jit ARGUMENTS: closing over them would bake the
        # whole bank into the program as constants (hundreds of MB of HLO)
        return _sample_jit(
            bank.signals, bank.targets, bank.tasks, bank.extents,
            key, jnp.asarray(epoch, jnp.int32), jnp.asarray(step, jnp.int32),
        )

    return sample, steps_per_epoch
