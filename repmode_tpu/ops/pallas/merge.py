"""Pallas TPU kernel: fused MoDE gate -> softmax -> expert-kernel merge.

The re-parameterization step (reference routing(), RepMode.py:171-192;
vectorized in ops/mode.py merge_kernels): given per-task gate logits and the
padded expert bank, produce merged conv kernels

    out[t, r, o] = sum_e softmax_e(logits[t, e, o]) * bank[e, r, o]

with r = flattened (kD,kH,kW,Ci) taps. One kernel fuses the softmax with the
weighted reduction over experts, tiled over the tap axis so arbitrarily large
banks stream through VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_kernel(logits_ref, bank_ref, out_ref, *, num_experts):
    # logits: (E, Co); bank block: (E, TR, Co); out block: (TR, Co)
    g = jax.nn.softmax(logits_ref[:].astype(jnp.float32), axis=0)  # (E, Co)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for e in range(num_experts):
        acc = acc + bank_ref[e] * g[e][None, :]
    out_ref[:] = acc


def pallas_merge_kernels(
    logits: jax.Array,
    bank: jax.Array,
    *,
    tap_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """logits: (E, Co); bank: (E, R, Co) -> merged (R, Co) fp32.

    R = kD*kH*kW*Ci flattened taps. Softmax over the expert axis is computed
    once in-kernel; the bank streams through VMEM in tap tiles.
    """
    e, r, co = bank.shape
    assert logits.shape == (e, co), (logits.shape, bank.shape)
    if r % tap_tile != 0:
        tap_tile = r  # small banks: single tile
    grid = (r // tap_tile,)
    kernel = functools.partial(_merge_kernel, num_experts=e)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((e, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, tap_tile, co), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tap_tile, co), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, co), jnp.float32),
        interpret=interpret,
    )(logits, bank)
