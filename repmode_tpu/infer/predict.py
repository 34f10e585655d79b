"""On-device tiled full-volume inference with Gaussian-blended stitching.

The TPU rebuild of Model.predict (fnet/fnet_model.py:149-223). The reference
builds a Python list of patch dicts, runs LIFO batches, and scatter-adds on
GPU with host-side loop control. Here the whole pipeline — patch gather,
re-parameterized forward, Gaussian-weighted scatter-add, final divide — is ONE
jitted program per volume shape:

  * patch extraction: vmapped lax.dynamic_slice over a static start grid;
  * forward: the re-parameterized plain conv net (models/reparam.py), so
    per-patch cost has zero gate/merge/BN overhead;
  * stitching: scan over patch batches; within a batch, a fori_loop of
    read-modify-write dynamic slices (overlapping patches must serialize);
  * ragged tail: the start grid is padded to a batch multiple with dummy
    patches whose blend weight is zeroed — no dynamic shapes.

Executables are cached per (volume shape, batch size); the start grid is a
device array argument, so re-tiling a same-shaped volume is free.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from repmode_tpu.config import Config
from repmode_tpu.ops.gaussian import gaussian_importance_map
from repmode_tpu.infer.tiling import compute_patch_starts


class TiledPredictor:
    """Sliding-window predictor over re-parameterized per-task params.

    Usage:
        pred = TiledPredictor(cfg)
        plain = reparameterize(variables, cfg.model, cfg.num_tasks, task_id)
        y = pred(plain, volume)   # volume: (D,H,W) float32
    """

    def __init__(self, cfg: Config, forward_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.patch_size = tuple(cfg.eval.patch_size)
        self.overlap = cfg.eval.overlap
        self.batch = cfg.train.batch_size_eval
        if forward_fn is None:
            from repmode_tpu.models.reparam import make_inference

            _, forward_fn = make_inference(cfg)  # honors cfg.eval.s2d
        self._forward = forward_fn
        self._gauss = jnp.asarray(
            gaussian_importance_map(self.patch_size, cfg.eval.gaussian_sigma_scale)
        )
        self._compiled: Dict[Tuple[int, ...], Callable] = {}

    # ------------------------------------------------------------------
    def _build(self, vol_shape: Tuple[int, int, int]):
        pd, ph, pw = self.patch_size
        gauss = self._gauss  # (pd,ph,pw)
        forward = self._forward
        batch = self.batch

        def run(plain, vol, starts, valid):
            """vol: (D,H,W); starts: (NB, B, 3); valid: (NB, B) -> (D,H,W)."""
            pred_sum = jnp.zeros(vol_shape, jnp.float32)
            weight_sum = jnp.zeros(vol_shape, jnp.float32)

            def gather(vol, st):
                return jax.lax.dynamic_slice(vol, (st[0], st[1], st[2]), (pd, ph, pw))

            def body(carry, inp):
                psum, wsum = carry
                st_b, valid_b = inp  # (B,3), (B,)
                patches = jax.vmap(gather, in_axes=(None, 0))(vol, st_b)
                x = patches[..., None]  # (B,pd,ph,pw,1)
                preds = forward(plain, x)[..., 0]  # (B,pd,ph,pw)
                w_b = gauss[None] * valid_b[:, None, None, None]
                contrib = preds * w_b

                def acc(i, c):
                    ps, ws = c
                    st = st_b[i]
                    idx = (st[0], st[1], st[2])
                    cur_p = jax.lax.dynamic_slice(ps, idx, (pd, ph, pw))
                    cur_w = jax.lax.dynamic_slice(ws, idx, (pd, ph, pw))
                    ps = jax.lax.dynamic_update_slice(ps, cur_p + contrib[i], idx)
                    ws = jax.lax.dynamic_update_slice(ws, cur_w + w_b[i], idx)
                    return ps, ws

                psum, wsum = jax.lax.fori_loop(0, batch, acc, (psum, wsum))
                return (psum, wsum), None

            (pred_sum, weight_sum), _ = jax.lax.scan(
                body, (pred_sum, weight_sum), (starts, valid)
            )
            return pred_sum / weight_sum

        return jax.jit(run)

    # ------------------------------------------------------------------
    def grid(self, vol_shape: Tuple[int, int, int]):
        """Padded start grid + validity mask for a volume shape."""
        starts = compute_patch_starts(vol_shape, self.patch_size, self.overlap)
        p = starts.shape[0]
        nb = -(-p // self.batch)
        pad = nb * self.batch - p
        if pad:
            starts = np.concatenate([starts, np.repeat(starts[-1:], pad, 0)], 0)
        valid = np.ones((nb * self.batch,), np.float32)
        if pad:
            valid[p:] = 0.0
        return (
            starts.reshape(nb, self.batch, 3),
            valid.reshape(nb, self.batch),
            p,
        )

    def num_patches(self, vol_shape: Tuple[int, int, int]) -> int:
        return self.grid(tuple(int(s) for s in vol_shape))[2]

    def __call__(self, plain_params, volume) -> jax.Array:
        """volume: (D,H,W) -> stitched prediction (D,H,W), fp32 on device."""
        vol_shape = tuple(int(s) for s in volume.shape)
        if vol_shape not in self._compiled:
            self._compiled[vol_shape] = self._build(vol_shape)
        starts, valid, _ = self.grid(vol_shape)
        vol = jnp.asarray(volume, jnp.float32)
        return self._compiled[vol_shape](
            plain_params, vol, jnp.asarray(starts), jnp.asarray(valid)
        )
