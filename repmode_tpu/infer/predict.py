"""On-device tiled full-volume inference with Gaussian-blended stitching.

The TPU rebuild of Model.predict (fnet/fnet_model.py:149-223). The reference
builds a Python list of patch dicts, runs LIFO batches, and scatter-adds on
GPU with host-side loop control. Here the pipeline — patch gather,
re-parameterized forward, Gaussian-weighted scatter-add, final divide — is
fully jitted, in one of two modes:

  fused      one program per volume: scan over patch batches, stitching
             interleaved with the forward.
  two_phase  program 1 computes all patch predictions (lax.map over gathered
             batches); program 2 scatter-adds them. Decoupling keeps XLA's
             layout/scheduling choices for the conv stack independent of the
             stitch loop, and lets the patch grid be sharded over a device
             mesh (each device predicts its slice of patches; partial
             pred/weight sums are combined by the stitcher).

Common structure:
  * patch extraction: vmapped lax.dynamic_slice over a static start grid;
  * forward: the re-parameterized plain conv net (models/reparam.py) — zero
    gate/merge/BN overhead per patch;
  * stitching: overlapping patches serialize through read-modify-write
    dynamic-slice updates inside a scan;
  * ragged tail: the grid is padded to a batch multiple with dummy patches
    whose blend weight is zeroed — no dynamic shapes.

Executables are cached per volume shape; start grids are device arrays, so
same-shaped volumes re-tile for free.
"""

from __future__ import annotations

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
        prepare, _ = make_inference(cfg)
        plain = prepare(variables, task_id)
        y = pred(plain, volume)   # volume: (D,H,W) float32
    """

    def __init__(
        self,
        cfg: Config,
        forward_fn: Optional[Callable] = None,
        mode: Optional[str] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.patch_size = tuple(cfg.eval.patch_size)
        self.overlap = cfg.eval.overlap
        self.batch = cfg.train.batch_size_eval
        self.mode = mode or cfg.eval.predictor
        self.mesh = mesh
        if forward_fn is None:
            from repmode_tpu.models.reparam import make_inference

            _, forward_fn = make_inference(cfg)  # honors cfg.eval.s2d
        self._forward = forward_fn
        self._gauss = jnp.asarray(
            gaussian_importance_map(self.patch_size, cfg.eval.gaussian_sigma_scale)
        )
        self._compiled: Dict = {}

    # ------------------------------------------------------------------
    def grid(self, vol_shape: Tuple[int, int, int]):
        """Padded start grid + validity mask for a volume shape."""
        starts = compute_patch_starts(vol_shape, self.patch_size, self.overlap)
        p = starts.shape[0]
        nb = -(-p // self.batch)
        if self.mesh is not None:  # pad batch count to a mesh multiple
            n = self.mesh.devices.size
            nb = -(-nb // n) * n
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

    def num_patches(self, vol_shape) -> int:
        return self.grid(tuple(int(s) for s in vol_shape))[2]

    # ------------------------------------------------------------------
    def _gather_fn(self):
        pd, ph, pw = self.patch_size

        def gather(vol, st):
            return jax.lax.dynamic_slice(vol, (st[0], st[1], st[2]), (pd, ph, pw))

        return gather

    def _accumulate(self, carry, preds_b, st_b, valid_b):
        """Scatter-add one batch of predictions into (pred_sum, weight_sum)."""
        pd, ph, pw = self.patch_size
        gauss = self._gauss
        psum, wsum = carry
        w_b = gauss[None] * valid_b[:, None, None, None]
        contrib = preds_b * w_b

        def acc(i, c):
            ps, ws = c
            idx = (st_b[i, 0], st_b[i, 1], st_b[i, 2])
            cur_p = jax.lax.dynamic_slice(ps, idx, (pd, ph, pw))
            cur_w = jax.lax.dynamic_slice(ws, idx, (pd, ph, pw))
            ps = jax.lax.dynamic_update_slice(ps, cur_p + contrib[i], idx)
            ws = jax.lax.dynamic_update_slice(ws, cur_w + w_b[i], idx)
            return ps, ws

        return jax.lax.fori_loop(0, self.batch, acc, (psum, wsum))

    def _build_fused(self, vol_shape):
        forward = self._forward

        def run(plain, vol, starts, valid):
            pred_sum = jnp.zeros(vol_shape, jnp.float32)
            weight_sum = jnp.zeros(vol_shape, jnp.float32)
            gather = self._gather_fn()

            def body(carry, inp):
                st_b, valid_b = inp
                patches = jax.vmap(gather, in_axes=(None, 0))(vol, st_b)
                preds = forward(plain, patches[..., None])[..., 0]
                return self._accumulate(carry, preds, st_b, valid_b), None

            (pred_sum, weight_sum), _ = jax.lax.scan(
                body, (pred_sum, weight_sum), (starts, valid)
            )
            return pred_sum / weight_sum

        return jax.jit(run)

    def _build_two_phase(self, vol_shape):
        forward = self._forward

        def forward_all(plain, vol, starts):
            gather = self._gather_fn()

            def one_batch(st_b):
                patches = jax.vmap(gather, in_axes=(None, 0))(vol, st_b)
                return forward(plain, patches[..., None])[..., 0]

            return jax.lax.map(one_batch, starts)  # (NB, B, pd, ph, pw)

        def stitch(preds, starts, valid):
            pred_sum = jnp.zeros(vol_shape, jnp.float32)
            weight_sum = jnp.zeros(vol_shape, jnp.float32)

            def body(carry, inp):
                preds_b, st_b, valid_b = inp
                return self._accumulate(carry, preds_b, st_b, valid_b), None

            (pred_sum, weight_sum), _ = jax.lax.scan(
                body, (pred_sum, weight_sum), (preds, starts, valid)
            )
            return pred_sum / weight_sum

        jf = jax.jit(forward_all)
        js = jax.jit(stitch)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())
            jf = jax.jit(
                forward_all,
                in_shardings=(repl, repl, batch_sh),
                out_shardings=batch_sh,
            )
            js = jax.jit(
                stitch, in_shardings=(batch_sh, repl, repl), out_shardings=repl
            )

        def run(plain, vol, starts, valid):
            preds = jf(plain, vol, starts)
            return js(preds, starts, valid)

        return run

    # ------------------------------------------------------------------
    def __call__(self, plain_params, volume) -> jax.Array:
        """volume: (D,H,W) -> stitched prediction (D,H,W), fp32 on device."""
        vol_shape = tuple(int(s) for s in volume.shape)
        key = (vol_shape, self.mode)
        if key not in self._compiled:
            build = (
                self._build_two_phase if self.mode == "two_phase" else self._build_fused
            )
            self._compiled[key] = build(vol_shape)
        starts, valid, _ = self.grid(vol_shape)
        vol = jnp.asarray(volume, jnp.float32)
        return self._compiled[key](
            plain_params, vol, jnp.asarray(starts), jnp.asarray(valid)
        )
