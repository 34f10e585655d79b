"""Host-side patch sampling with background prefetch.

Replaces the reference DataLoader pipeline (fnet/functions.py:45-58 + the
augmentation in SSPdataset.data_aug:137-155): per epoch, every volume is
visited once in a shuffled order, one random 32x128x128 crop + independent
per-axis random flips (p=0.5) per visit, batches of `batch_size` with the
ragged tail kept.

TPU-first differences:
  * no worker processes — crops are cheap strided copies; a single prefetch
    thread double-buffers batch assembly behind device compute;
  * batches come out as stacked channel-last arrays ready for device_put;
  * RNG is an explicit numpy Generator seeded from config (reproducible
    without global state).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from repmode_tpu.data.store import VolumeStore


def random_crop_flip(
    signal: np.ndarray,
    target: np.ndarray,
    patch_size: Tuple[int, int, int],
    rng: np.random.Generator,
    flip_prob: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """One random crop + random flips, applied identically to both volumes."""
    assert signal.shape == target.shape, (signal.shape, target.shape)
    starts = [
        rng.integers(0, s - p + 1) for s, p in zip(signal.shape, patch_size)
    ]
    sl = tuple(slice(st, st + p) for st, p in zip(starts, patch_size))
    sig, tgt = signal[sl], target[sl]
    axes = [ax for ax in range(3) if rng.uniform() <= flip_prob]
    if axes:
        sig = np.flip(sig, axis=axes)
        tgt = np.flip(tgt, axis=axes)
    return np.ascontiguousarray(sig), np.ascontiguousarray(tgt)


class PatchSampler:
    """Iterates epochs of augmented patch batches from a VolumeStore."""

    def __init__(
        self,
        store: VolumeStore,
        batch_size: int,
        patch_size: Tuple[int, int, int],
        seed: int = 0,
        flip_prob: float = 0.5,
        shuffle: bool = True,
        prefetch: int = 2,
    ):
        self.store = store
        self.batch_size = batch_size
        self.patch_size = tuple(patch_size)
        self.flip_prob = flip_prob
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def batches_per_epoch(self) -> int:
        return -(-len(self.store) // self.batch_size)

    def _make_batch(self, idxs) -> Dict[str, np.ndarray]:
        sigs, tgts, tasks = [], [], []
        for i in idxs:
            r = self.store[i]
            s, t = random_crop_flip(
                r.signal, r.target, self.patch_size, self.rng, self.flip_prob
            )
            sigs.append(s)
            tgts.append(t)
            tasks.append(r.task)
        return {
            "signal": np.stack(sigs)[..., None].astype(np.float32),
            "target": np.stack(tgts)[..., None].astype(np.float32),
            "task": np.asarray(tasks, np.int32),
        }

    def epoch(self, pad_tail_to_batch: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        """Yield one epoch of batches (each volume visited once).

        pad_tail_to_batch repeats tail samples so every batch has a static
        shape — avoids a second XLA compilation for the ragged last batch.
        """
        order = np.arange(len(self.store))
        if self.shuffle:
            self.rng.shuffle(order)
        b = self.batch_size
        chunks = [order[i : i + b] for i in range(0, len(order), b)]
        if pad_tail_to_batch and chunks and len(chunks[-1]) < b:
            tail = chunks[-1]
            pad = self.rng.choice(order, size=b - len(tail))
            chunks[-1] = np.concatenate([tail, pad])

        if self.prefetch <= 0:
            for c in chunks:
                yield self._make_batch(c)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for c in chunks:
                    q.put(self._make_batch(c))
            finally:
                q.put(sentinel)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        th.join()
