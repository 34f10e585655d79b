"""Plain (task-agnostic) 3D U-Net baseline.

The reference ships RepMode only, but its experimental baselines ("Multi-Net":
one network per task) are plain U-Nets of the same topology (paper setup;
single-task filtering hooks at SSPdataset.py:102-114). This model fills that
slot: identical encoder/decoder skeleton with ordinary convs — run it with a
single-task dataset filter for Multi-Net-style baselines, or multi-task for a
task-blind lower bound.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from repmode_tpu.config import ModelConfig
from repmode_tpu.models.repmode import BatchNorm3d, torch_uniform_init
from repmode_tpu.ops.conv3d import conv3d_same, downsample2x_conv, upsample2x_convt


class ConvBNReLU(nn.Module):
    in_chan: int
    out_chan: int
    kernel: int = 3
    cfg: Optional[ModelConfig] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        k = self.kernel
        w = self.param(
            "w", torch_uniform_init(self.in_chan * k**3),
            (k, k, k, self.in_chan, self.out_chan),
        )
        y = conv3d_same(x, w, compute_dtype=self.compute_dtype)
        y = BatchNorm3d(
            self.out_chan,
            momentum=self.cfg.bn_momentum if self.cfg else 0.1,
            eps=self.cfg.bn_eps if self.cfg else 1e-5,
        )(y, train=train)
        return nn.relu(y)


class UNet3D(nn.Module):
    """Depth-N U-Net matching RepModeNet's skeleton with plain convs."""

    cfg: ModelConfig
    num_tasks: int = 0  # unused; kept for a uniform model interface
    compute_dtype: str = "float32"

    def _cdt(self):
        return None if self.compute_dtype == "float32" else jnp.dtype(self.compute_dtype)

    @nn.compact
    def __call__(self, x, task_id=None, *, train: bool = True):
        cfg = self.cfg
        cdt = self._cdt()
        c = cfg.in_channels * cfg.mult_chan
        chans = [c * (2**i) for i in range(cfg.depth + 1)]
        k = cfg.kernel_size

        def subnet(h, cin, cout, name):
            h = ConvBNReLU(cin, cout, k, cfg, cdt, name=f"{name}_conv1")(h, train=train)
            h = ConvBNReLU(cout, cout, k, cfg, cdt, name=f"{name}_conv2")(h, train=train)
            return h

        skips = []
        h = x
        in_ch = cfg.in_channels
        for i in range(cfg.depth):
            skip = subnet(h, in_ch, chans[i], f"enc{i + 1}")
            skips.append(skip)
            w_down = self.param(
                f"down{i + 1}_w", torch_uniform_init(chans[i] * 8),
                (2, 2, 2, chans[i], chans[i]),
            )
            h = downsample2x_conv(skip, w_down, compute_dtype=cdt)
            h = BatchNorm3d(chans[i], name=f"down{i + 1}_bn")(h, train=train)
            h = nn.relu(h)
            in_ch = chans[i]

        h = subnet(h, chans[cfg.depth - 1], chans[cfg.depth], "bottle")

        for i in range(cfg.depth, 0, -1):
            w_up = self.param(
                f"up{i}_w", torch_uniform_init(chans[i - 1] * 8),
                (2, 2, 2, chans[i], chans[i - 1]),
            )
            h = upsample2x_convt(h, w_up, compute_dtype=cdt)
            h = BatchNorm3d(chans[i - 1], name=f"up{i}_bn")(h, train=train)
            h = nn.relu(h)
            h = jnp.concatenate([skips[i - 1], h], axis=-1)
            h = subnet(h, chans[i], chans[i - 1], f"dec{i}")

        w_out = self.param(
            "out_w", torch_uniform_init(c * cfg.kernel_size**3),
            (k, k, k, c, cfg.out_channels),
        )
        return conv3d_same(h, w_out, compute_dtype=cdt)
