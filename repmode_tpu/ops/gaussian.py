"""Gaussian importance map for sliding-window stitching.

Reproduces the reference's get_gaussian (fnet/fnet_model.py:242-252): a
centered delta filtered by scipy.ndimage.gaussian_filter(sigma = patch/8,
mode='constant', truncate=4.0), peak-normalized to 1, with zeros clamped to
the smallest positive value. scipy's gaussian_filter is separable, and
filtering a delta yields the outer product of the three 1D kernels — so we
build the exact same 1D kernels (radius = int(truncate*sigma + 0.5),
normalized Gaussian taps) and take their outer product. Pure numpy; computed
once per patch size on the host and closed over by the jitted stitcher.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _gauss_kernel_1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d(order=0) equivalent (normalized taps)."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return phi / phi.sum()


def _filtered_delta_1d(size: int, center: int, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """1D constant-mode Gaussian filter of a delta at `center`.

    Equals the kernel taps placed at |i - center| <= radius (zero-padded
    borders contribute nothing to a delta's response).
    """
    radius = int(truncate * sigma + 0.5)
    k = _gauss_kernel_1d(sigma, radius)
    out = np.zeros(size, dtype=np.float64)
    for i in range(size):
        d = i - center
        if -radius <= d <= radius:
            # correlation of the delta: out[i] = k[radius + (i - center)]
            out[i] = k[radius + d]
    return out


def gaussian_importance_map(
    patch_size: Sequence[int],
    sigma_scale: float = 1 / 8,
    dtype=np.float32,
) -> np.ndarray:
    """(D,H,W) Gaussian blending weights, peak 1, strictly positive."""
    patch_size = tuple(int(p) for p in patch_size)
    centers: Tuple[int, ...] = tuple(p // 2 for p in patch_size)
    sigmas = tuple(p * sigma_scale for p in patch_size)
    axes = [
        _filtered_delta_1d(p, c, s)
        for p, c, s in zip(patch_size, centers, sigmas)
    ]
    g = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    g = g / g.max()
    g = g.astype(dtype)
    # avoid zero weights -> NaN in pred_sum/weight_sum (fnet_model.py:250-251)
    positive = g[g > 0]
    g[g == 0] = positive.min()
    return g
