"""Space-to-depth conv execution for narrow-channel levels.

Motivation (measured on v5e): XLA's conv puts output channels on the MXU's
128-wide lane axis, so the U-Net's 32/64-channel levels — which carry ~78% of
the FLOPs — run at a fraction of peak (C=32 5^3 conv: 27.5 TFLOPS). Packing a
2x2 H,W neighborhood into channels (C -> 4C) fills the lanes: the transformed
(5,3,3, 4Ci, 4Co) conv reaches ~108 TFLOPS. The transform is exact — weights
are rearranged with structured zeros, so the s2d conv computes bit-the-same
contractions (modulo fp reassociation).

Math. s2d: x2[n,d,h',w',(py,px,c)] = x[n,d,2h'+py,2w'+px,c] (phase-major
channel order). A K-tap 'same' conv along H becomes a 3-tap 'same' conv along
h' with phase-block weights:

    out[2h'+q] = sum_dy x[2h'+q+dy-ctr] W[dy]
    with dy = 2*(t-1) + ctr + p - q   (t in {0,1,2}; valid dy in [0,K))

so W2[t, (p,i), (q,o)] = W[2(t-1)+ctr+p-q, i, o] where in-range, else 0.
Both K=5 (ctr 2) and K=3 (ctr 1) map onto 3 s2d taps. Requires even H and W
(true for all patch sizes here). Depth is left untransformed — D=32 levels
keep full z-resolution and 4x channel packing already fills the lanes.

The kernel/bias transforms run once at re-parameterization time; the runtime
ops are pure conv + reshape/transpose.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from repmode_tpu.ops.conv3d import conv3d_same


def space_to_depth_hw(x: jax.Array) -> jax.Array:
    """(N,D,H,W,C) -> (N,D,H/2,W/2,4C), phase-major: c' = (py*2+px)*C + c."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (n,d,h',w',py,px,c)
    return x.reshape(n, d, h // 2, w // 2, 4 * c)


def depth_to_space_hw(x: jax.Array) -> jax.Array:
    """Inverse of space_to_depth_hw."""
    n, d, hh, ww, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, d, hh, ww, 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (n,d,h',py,w',px,c)
    return x.reshape(n, d, hh * 2, ww * 2, c)


def _phase_gather(k: int) -> np.ndarray:
    """G[t,p,q,dy] = 1 iff dy == 2*(t-1) + (k-1)//2 + p - q, dy in [0,k)."""
    ctr = (k - 1) // 2
    g = np.zeros((3, 2, 2, k), np.float32)
    for t in range(3):
        for p in range(2):
            for q in range(2):
                dy = 2 * (t - 1) + ctr + p - q
                if 0 <= dy < k:
                    g[t, p, q, dy] = 1.0
    return g


def s2d_conv_kernel(w: jax.Array) -> jax.Array:
    """(K,K,K,Ci,Co) 'same' kernel -> s2d form (K,3,3,4Ci,4Co), K in {3,5}.

    Depth taps are untouched; H and W taps are folded into phase blocks.
    Channel order matches space_to_depth_hw (phase-major).
    """
    kd, kh, kw, ci, co = w.shape
    gh = jnp.asarray(_phase_gather(kh))
    gw = jnp.asarray(_phase_gather(kw))
    # (t,s) s2d taps; (p,x) input H/W phases; (q,y) output H/W phases.
    # Output memory order must be z,t,s,(p,x,ci),(q,y,co) — phase-major blocks.
    w2 = jnp.einsum("tpqd,sxye,zdeio->ztspxiqyo", gh, gw, w)
    return w2.reshape(kd, 3, 3, 4 * ci, 4 * co)


def s2d_down_kernel(w: jax.Array) -> jax.Array:
    """k=2,s=2 downsample kernel (2,2,2,Ci,Co) -> s2d-domain (2,1,1,4Ci,Co).

    The stride-2 2x2 H,W window of the native op is exactly one s2d position's
    phase block, so downsampling in the s2d domain is a (2,1,1) conv with
    stride (2,1,1): out[d2,h',w',o] = sum_{a,b,c,i} x2[2d2+a,h',w',(b,c,i)] W[a,b,c,i,o].
    """
    ci, co = w.shape[3], w.shape[4]
    # (a,b,c,i,o): flattening (b,c,i) row-major == phase-major (b*2+c)*ci + i
    return w.reshape(2, 4 * ci, co)[:, None, None]


def s2d_bias(b: jax.Array) -> jax.Array:
    """(Co,) -> (4Co,) replicated across the 4 output phases (phase-major)."""
    return jnp.concatenate([b, b, b, b])


def _box1d_pair(x0: jax.Array, x1: jax.Array, k: int, axis: int):
    """Separable k-tap box sum along a NATIVE axis split into 2 phases.

    x0/x1 hold the even/odd native positions (nat[2m] = x0[m],
    nat[2m+1] = x1[m]). Returns (y0, y1) with y_q[m] = sum_{d=-r..r}
    nat[2m+q+d], zero-padded — 3 shifted adds per phase instead of a k-tap
    dense conv. k in {3, 5}.
    """

    def sh(t, d):  # t shifted by d native PAIR positions with zero pad
        if d == 0:
            return t
        pad = [(0, 0)] * t.ndim
        n = t.shape[axis]
        if d > 0:  # t[m-d]
            pad[axis] = (d, 0)
            sl = [slice(None)] * t.ndim
            sl[axis] = slice(0, n)
        else:  # t[m+|d|]
            pad[axis] = (0, -d)
            sl = [slice(None)] * t.ndim
            sl[axis] = slice(-d, n - d)
        return jnp.pad(t, pad)[tuple(sl)]

    a = x0 + x1  # A[m] = nat[2m] + nat[2m+1]
    if k == 5:
        y0 = sh(a, 1) + a + sh(x0, -1)          # nat[2m-2 .. 2m+2]
        y1 = sh(x1, 1) + a + sh(a, -1)          # nat[2m-1 .. 2m+3]
    elif k == 3:
        y0 = sh(x1, 1) + x0 + x1                # nat[2m-1 .. 2m+1]
        y1 = x0 + x1 + sh(x0, -1)               # nat[2m .. 2m+2]
    else:
        raise ValueError(f"box pair supports k in {{3,5}}, got {k}")
    return y0, y1


def box_pool_s2d(x2: jax.Array, k: int) -> jax.Array:
    """k^3 box SUM (multiply by 1/k^3 for the avg pool) on an s2d-domain
    tensor, 'same' zero padding, count_include_pad semantics.

    x2: (N,D,h',w',4C) phase-major -> same shape. Depth is untransformed
    (k shifted adds); the H and W passes mix the 2 phases via _box1d_pair —
    the phase blocks are contiguous lane slices, so every op is a
    pad/slice/add, no gather and no d2s/s2d rearrangement.

    MEASURED NEGATIVE RESULT (tools/bench_avgbranch.py, 2026-08-17): as the
    avg-expert-branch forward (box + pointwise conv) this loses ~2x fwd /
    ~3x bwd to the composed-dense conv at the L1 train shape — the
    half/quarter-lane slice adds of the phase passes are VPU-hostile, while
    the MXU eats the 45-tap dense kernel at ~80% MFU. Kept (exact, tested)
    as the measurement record and for host-side uses; production keeps the
    composed-dense branches (ARCHITECTURE.md §11).
    """
    n, d, hh, ww, c4 = x2.shape
    c = c4 // 4
    r = (k - 1) // 2

    # D: untransformed axis
    xp = jnp.pad(x2, ((0, 0), (r, r), (0, 0), (0, 0), (0, 0)))
    y = xp[:, 0:d]
    for i in range(1, k):
        y = y + xp[:, i : i + d]

    # H: native phase py = lane blocks [0:2C], [2C:4C]
    h0, h1 = _box1d_pair(y[..., : 2 * c], y[..., 2 * c :], k, axis=2)
    y = jnp.concatenate([h0, h1], axis=-1)

    # W: native phase px = lane blocks [0:C],[C:2C] within each py block
    parts = []
    for py in range(2):
        b = y[..., py * 2 * c : (py + 1) * 2 * c]
        w0, w1 = _box1d_pair(b[..., :c], b[..., c:], k, axis=3)
        parts.extend([w0, w1])
    return jnp.concatenate(parts, axis=-1)


def conv3d_same_s2d_domain(x2: jax.Array, w2: jax.Array, *, compute_dtype=None) -> jax.Array:
    """'same' conv on s2d-domain tensors (the kernel already transformed)."""
    return conv3d_same(x2, w2, compute_dtype=compute_dtype)


def s2d_conv1_kernel(w: jax.Array) -> jax.Array:
    """1^3 conv kernel (1,1,1,Ci,Co) -> s2d block-diagonal (1,1,1,4Ci,4Co).

    A pointwise conv acts per phase: W2[(p,i),(q,o)] = delta_pq * W[i,o].
    Built directly (the generic transform would emit a mostly-zero 3x3 tap)."""
    ci, co = w.shape[3], w.shape[4]
    w1 = w.reshape(ci, co)
    eye = jnp.eye(4, dtype=w.dtype)
    w2 = jnp.einsum("pq,io->piqo", eye, w1).reshape(4 * ci, 4 * co)
    return w2[None, None, None]


def upsample_to_s2d(x: jax.Array, w: jax.Array, *, compute_dtype=None) -> jax.Array:
    """k=2,s=2 transposed conv producing an s2d-domain output directly.

    Native: out[n,2d+a,2h'+b,2w'+c,o] = sum_i x[n,d,h',w',i] W[a,b,c,i,o].
    The (b,c) phases ARE the s2d phase block, so the op is a matmul into
    (2, 4Co) channels followed by a depth interleave — the full-resolution
    native (C small) tensor is never materialized.
    x: (N,D,h',w',Ci), w: (2,2,2,Ci,Co) -> (N,2D,h',w',4Co).
    """
    n, d, hh, ww, ci = x.shape
    co = w.shape[-1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # (a,b,c,i,o) -> (a, i, (b,c,o))
    wm = w.transpose(0, 3, 1, 2, 4).reshape(2, ci, 4 * co)
    y = jnp.einsum("ndhwi,aik->nadhwk", x, wm)
    if compute_dtype is not None:
        # Pin the convert BEFORE the interleave transpose: XLA otherwise
        # defers the dot's fp32 accumulator past the layout copy, doubling
        # the relayout traffic (profiled in-situ: copy.134 f32 at the L2->L1
        # shape, tools/profile_forward.py 2026-08-18).
        y = y.astype(compute_dtype)
    y = y.transpose(0, 2, 1, 3, 4, 5)  # (n, d, a, h, w, k)
    return y.reshape(n, 2 * d, hh, ww, 4 * co)


def downsample_s2d_domain(
    x2: jax.Array, w2: jax.Array, *, compute_dtype=None, trim_d_halo: int = 0
) -> jax.Array:
    """s2d-domain downsample: (N,D,h',w',4C) -> native next level (N,D/2,h',w',Co).

    Lowered as ONE matmul contracting the (depth-phase, channel) pair over a
    free reshape view — out[n,d,h,w,o] = sum_{a,c} x2[n,2d+a,h,w,c] W[a,c,o].
    Two earlier lowerings measured worse at the L1 shape (tools/
    bench_edges.py): XLA's stride-(2,1,1) conv (4.5 TFLOPS / 71 GB/s,
    2026-08-17) and two strided-depth-slice matmuls accumulated
    (x2[:, ::2] @ w2[0] + x2[:, 1::2] @ w2[1] — 3.4 TFLOPS / 53 GB/s =
    7% of HBM peak, re-measured 2026-08-20: the strided slices force
    relayout copies in both the forward and its scatter-add VJP). The
    (D) -> (D/2, 2) split is a contiguous view, so this form reads x2
    exactly once with no strided access; the contraction K doubles to
    2*4C, which the MXU prefers anyway. AD-safe: the VJP is one dot plus
    the inverse free reshape.

    trim_d_halo > 0 consumes a depth-padded tensor (the Pallas chain keeps
    activations D-padded, models/reparam.plain_forward_s2d_pallas) by
    slicing off the halo rows first (a view-level slice, no copy pass).

    Dtype policy as conv3d_same: bf16 compute emits bf16 (the conv VJP
    rejects mixed-dtype operands); fp32 output only in exact mode.
    """
    from repmode_tpu.ops.conv3d import _cast

    x2 = _cast(x2, compute_dtype)
    w2 = _cast(w2, compute_dtype)
    if trim_d_halo:
        x2 = x2[:, trim_d_halo:-trim_d_halo]
    pet = (
        jnp.promote_types(x2.dtype, jnp.float32)
        if compute_dtype is None else None
    )
    n, d, hh, ww, c4 = x2.shape
    wm = w2.reshape(2, c4, w2.shape[-1])  # (2, 4C, Co)
    xv = x2.reshape(n, d // 2, 2, hh, ww, c4)
    return jnp.einsum(
        "ndahwc,aco->ndhwo", xv, wm, preferred_element_type=pet
    )


def downsample_s2d_to_s2d(
    x2: jax.Array, w2: jax.Array, *, compute_dtype=None, trim_d_halo: int = 0
) -> jax.Array:
    """s2d-domain downsample emitting the NEXT level's s2d domain directly.

    When level i+1 also executes in the s2d domain, the native
    (N,D/2,h',w',Co) downsample output is immediately re-space_to_depth'd
    (half-lane write + a relayout pass). Since the downsample contraction is
    pointwise over (h',w'), regrouping its OUTPUT phases is a free re-view
    of its INPUT: split h'=(h'',py), w'=(w'',px) (contiguous views) and emit
    lanes (py,px,Co) phase-major — the exact s2d layout level i+1 consumes.
    One matmul, full 4Co output lanes, zero rearrange passes.

    x2: (N,D,h',w',4C) phase-major -> (N,D/2,h'/2,w'/2,4Co) phase-major.
    Bias: use s2d_bias(down_b). Exact (same contractions, reassociation
    aside); AD-safe (einsum over free reshapes).
    """
    from repmode_tpu.ops.conv3d import _cast

    x2 = _cast(x2, compute_dtype)
    w2 = _cast(w2, compute_dtype)
    if trim_d_halo:
        x2 = x2[:, trim_d_halo:-trim_d_halo]
    pet = (
        jnp.promote_types(x2.dtype, jnp.float32)
        if compute_dtype is None else None
    )
    n, d, hh, ww, c4 = x2.shape
    co = w2.shape[-1]
    wm = w2.reshape(2, c4, co)
    xv = x2.reshape(n, d // 2, 2, hh // 2, 2, ww // 2, 2, c4)
    y = jnp.einsum(
        "ndahpwxc,aco->ndhwpxo", xv, wm, preferred_element_type=pet
    )
    return y.reshape(n, d // 2, hh // 2, ww // 2, 4 * co)


def upsample_s2d_to_s2d(
    x2: jax.Array, w: jax.Array, *, compute_dtype=None
) -> jax.Array:
    """k=2,s=2 transposed conv, s2d-domain input AND output.

    Native: out[n,2d+a,2h+b,2w+c,o] = sum_i x[n,d,h,w,i] W[a,b,c,i,o], which
    with both sides in s2d coordinates (h = 2h'+p, w = 2w'+x; out spatial
    (2h'+p, 2w'+x), out phase (b,c)) is a PER-INPUT-PHASE matmul followed by
    d/h'/w' interleaves — the full-resolution native tensor (channel width
    Co, MXU-hostile) is never materialized. Measured vs
    upsample2x_convt + space_to_depth_hw at the L2->L1 shape: that route ran
    at 13 GB/s (tools/bench_edges.py, 2026-08-17).

    x2: (N,D,h',w',4Ci) phase-major, w: (2,2,2,Ci,Co) native
    -> (N,2D,2h',2w',4Co) phase-major.
    """
    n, d, hh, ww, c4 = x2.shape
    ci = c4 // 4
    co = w.shape[-1]
    if compute_dtype is not None:
        x2 = x2.astype(compute_dtype)
        w = w.astype(compute_dtype)
    xv = x2.reshape(n, d, hh, ww, 2, 2, ci)
    # (a,b,c,i,o) -> (i, a, (b,c,o)); same contraction for every input phase
    wm = w.transpose(3, 0, 1, 2, 4).reshape(ci, 2, 4 * co)
    y = jnp.einsum("ndhwpxi,iak->ndhwpxak", xv, wm)
    if compute_dtype is not None:
        # See upsample_to_s2d: convert before the interleave transpose so
        # the unavoidable relayout copy moves compute_dtype, not fp32.
        y = y.astype(compute_dtype)
    # (n,d,h',w',p,x,a,k) -> (n, d,a, h',p, w',x, k) and collapse interleaves
    y = y.transpose(0, 1, 6, 2, 4, 3, 5, 7)
    return y.reshape(n, 2 * d, 2 * hh, 2 * ww, 4 * co)
