"""3D conv primitives, NDHWC layout (channels on the 128-lane axis).

TPU-first choices vs the reference (fnet/nn_modules/RepMode.py):
  * NDHWC / DHWIO dimension numbers: channels-last keeps C on the vector
    lanes, which is what XLA:TPU tiles onto the MXU for convolutions.
  * The k=2,s=2 down/upsample convs (RepMode.py:80-84, 97-101) have
    non-overlapping windows, so they are expressed as exact reshape+einsum
    (pure MXU matmuls) instead of general convolutions.
  * bf16 compute with fp32 accumulation (preferred_element_type) replaces
    CUDA AMP autocast (fnet/fnet_model.py:104-113).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NDHWC activations, DHWIO kernels.
DIMNUMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)


def _cast(x, dtype):
    return x if dtype is None else x.astype(dtype)


def conv3d_same(
    x: jax.Array,
    w: jax.Array,
    *,
    compute_dtype=None,
    accum_dtype=jnp.float32,
    feature_group_count: int = 1,
) -> jax.Array:
    """'same'-padded stride-1 3D conv. x: (N,D,H,W,Ci), w: (kD,kH,kW,Ci,Co).

    accum_dtype=jnp.float32 requests fp32 output (forward/eval paths).
    accum_dtype=None outputs compute_dtype — required on differentiated
    paths: conv_general_dilated's VJP rejects a fp32 cotangent against bf16
    operands, so AD-safe bf16 convs must round their output to bf16 (the MXU
    still accumulates fp32 internally; this matches torch-AMP semantics where
    autocast convs emit fp16).
    """
    x = _cast(x, compute_dtype)
    w = _cast(w, compute_dtype)
    if accum_dtype is not None:
        # never downcast accumulation (fp64 parity runs keep fp64)
        accum_dtype = jnp.promote_types(x.dtype, accum_dtype)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=DIMNUMS,
        feature_group_count=feature_group_count,
        preferred_element_type=accum_dtype,
    )


def conv3d_same_tapmajor(
    x: jax.Array, w: jax.Array, *, compute_dtype=None
) -> jax.Array:
    """'same' conv for SMALL output channel counts, tap-major factorization.

    A conv with Co << 128 wastes the MXU: XLA pads Co onto the 128-lane
    axis, so each of the taps costs a full 128-lane matmul (the s2d-domain
    conv_out, Co=4, measured 6.2 TFLOPS — tools/bench_edges.py 2026-08-17).
    Factorize instead:

        z[p, t*Co+o] = sum_i x[p, i] * w[t, i, o]      (ONE matmul, N=T*Co)
        y[p, o]      = sum_t z[p + offset_t, t*Co+o]   (T shifted adds, VPU)

    The matmul has T*Co output lanes (e.g. 45*4=180) — MXU-shaped — and the
    shifted adds are bandwidth work. Same contraction, reassociated: exact
    in fp32, bf16 rounds z once per 128-deep partial (the usual compute-
    dtype policy). Output fp32 (eval path; not used under AD).
    """
    kd, kh, kw, ci, co = w.shape
    n, d, h, wl, _ = x.shape
    t = kd * kh * kw
    x = _cast(x, compute_dtype)
    w2 = _cast(
        w.reshape(t, ci, co).transpose(1, 0, 2).reshape(ci, t * co),
        compute_dtype,
    )
    z = jnp.einsum(
        "ndhwc,ck->ndhwk", x, w2,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32)
        if compute_dtype is None else None,
    )
    pd_, ph_, pw_ = (kd - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    zp = jnp.pad(
        z, ((0, 0), (pd_, pd_), (ph_, ph_), (pw_, pw_), (0, 0))
    )
    y = jnp.zeros(x.shape[:4] + (co,), jnp.float32)
    ti = 0
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                y = y + zp[
                    :, dz : dz + d, dy : dy + h, dx : dx + wl,
                    ti * co : (ti + 1) * co,
                ].astype(jnp.float32)
                ti += 1
    return y


def downsample2x_conv(x: jax.Array, w: jax.Array, *, compute_dtype=None) -> jax.Array:
    """Stride-2 kernel-2 conv (reference Conv3d(k=2,s=2,bias=False), RepMode.py:81).

    Non-overlapping 2x2x2 windows -> reshape into blocks and contract on the
    MXU: out[n,d,h,w,o] = sum_{abci} x[n,2d+a,2h+b,2w+c,i] * w[a,b,c,i,o].
    x: (N,2D,2H,2W,Ci), w: (2,2,2,Ci,Co) -> (N,D,H,W,Co), fp32.
    """
    n, d2, h2, w2, ci = x.shape
    d, h, wi = d2 // 2, h2 // 2, w2 // 2
    co = w.shape[-1]
    x = _cast(x, compute_dtype)
    w = _cast(w, compute_dtype)
    xb = x.reshape(n, d, 2, h, 2, wi, 2, ci)
    # (N,D,H,W, 2,2,2,Ci) @ (2,2,2,Ci,Co)
    xb = xb.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(n, d, h, wi, 8 * ci)
    wm = w.reshape(8 * ci, co)
    return jnp.einsum(
        "ndhwk,ko->ndhwo", xb, wm,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )


def upsample2x_convt(x: jax.Array, w: jax.Array, *, compute_dtype=None) -> jax.Array:
    """Stride-2 kernel-2 transposed conv (reference ConvTranspose3d, RepMode.py:98).

    With k=s=2 each output voxel receives exactly one kernel tap:
      out[n,2d+a,2h+b,2w+c,o] = sum_i x[n,d,h,w,i] * w[a,b,c,i,o]
    so the op is a matmul followed by a block interleave (no overlap-add).
    x: (N,D,H,W,Ci), w: (2,2,2,Ci,Co) -> (N,2D,2H,2W,Co), fp32.
    """
    n, d, h, wi, ci = x.shape
    co = w.shape[-1]
    x = _cast(x, compute_dtype)
    w = _cast(w, compute_dtype)
    wm = w.reshape(8, ci, co).transpose(1, 0, 2).reshape(ci, 8 * co)
    y = jnp.einsum(
        "ndhwi,ik->ndhwk", x, wm,
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )
    y = y.reshape(n, d, h, wi, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * d, 2 * h, 2 * wi, co)


def _box1d(x: jax.Array, k: int, axis: int) -> jax.Array:
    """Sum over a length-k window along `axis`, zero 'same' padding.

    Expressed as k shifted-slice adds (k is 3 or 5): pure elementwise adds
    that XLA fuses, fully differentiable (unlike a generic lax.reduce_window
    reducer, which has no reverse-mode rule).
    """
    lo = (k - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, k - 1 - lo)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    out = lax.slice_in_dim(xp, 0, n, axis=axis)
    for i in range(1, k):
        out = out + lax.slice_in_dim(xp, i, i + n, axis=axis)
    return out


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def avg_pool_same(x: jax.Array, k: int) -> jax.Array:
    """k^3 average pool, stride 1, zero ('same') padding, count_include_pad.

    Matches the reference's fixed avg-pool expert kernel of value 1/k^3
    convolved with 'same' zero padding (RepMode.py:139-142,161-163): border
    windows divide by k^3 including the zero padding. Separable box filter
    over D, H, W.

    Custom VJP: a symmetric zero-padded box filter is self-adjoint, so the
    backward pass is the same pooling applied to the cotangent — one op
    instead of the transpose of the whole shifted-add chain (which otherwise
    dominates backward-pass memory).
    """
    return _avg_pool_impl(x, k)


def _avg_pool_impl(x: jax.Array, k: int) -> jax.Array:
    s = _box1d(_box1d(_box1d(x, k, 1), k, 2), k, 3)
    return s * jnp.asarray(1.0 / k**3, s.dtype)


def _avg_pool_fwd(x, k):
    return _avg_pool_impl(x, k), None


def _avg_pool_bwd(k, _, g):
    return (_avg_pool_impl(g, k),)


avg_pool_same.defvjp(_avg_pool_fwd, _avg_pool_bwd)
