"""Pallas conv kernels (interpret mode on CPU): parity vs lax convs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.ops.conv3d import conv3d_same
from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_dpad, pallas_conv3d_same


def arr(rng, shape, scale=0.2):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


class TestPallasConv:
    @pytest.mark.parametrize("kd", [3, 5])
    def test_matches_lax_conv(self, rng, kd):
        n, d, h, w, ci, co = 2, 4, 8, 8, 8, 16
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (kd, 3, 3, ci, co))
        ref = conv3d_same(x, wk)
        out = pallas_conv3d_same(x, wk, compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_h_tiling(self, rng):
        n, d, h, w, ci, co = 1, 3, 8, 8, 4, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (3, 3, 3, ci, co))
        ref = conv3d_same(x, wk)
        out = pallas_conv3d_same(
            x, wk, h_tile=4, compute_dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


class TestFusedEpilogue:
    def test_bias_relu_fusion_matches(self, rng):
        n, d, h, w, ci, co = 1, 3, 8, 8, 4, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (3, 3, 3, ci, co))
        b = arr(rng, (co,), 1.0)
        ref = jax.nn.relu(conv3d_same(x, wk) + b)
        out = pallas_conv3d_same(
            x, wk, b, relu=True, compute_dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_bias_only(self, rng):
        n, d, h, w, ci, co = 1, 3, 8, 8, 4, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (5, 3, 3, ci, co))
        b = arr(rng, (co,), 1.0)
        ref = conv3d_same(x, wk) + b
        out = pallas_conv3d_same(x, wk, b, compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


class TestDpadChain:
    """pallas_conv3d_dpad: the chainable D-padded conv (interpret mode).

    The padded-domain contract: input carries (kd-1)//2 zero halo rows at
    each depth edge; output is same-shaped with its halo rows rewritten to
    zero, so a second dpad call consumes it directly (no pad pass between).
    """

    @pytest.mark.parametrize("kd", [3, 5])
    def test_single_conv_matches_xla(self, rng, kd):
        n, d, h, w, ci, co = 2, 4, 8, 8, 8, 16
        pd = (kd - 1) // 2
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (kd, 3, 3, ci, co))
        b = arr(rng, (co,), 1.0)
        ref = jax.nn.relu(conv3d_same(x, wk) + b)
        xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
        out = pallas_conv3d_dpad(
            xp, wk, b, relu=True, compute_dtype=jnp.float32,
            out_dtype=jnp.float32, interpret=True,
        )
        assert out.shape == xp.shape[:-1] + (co,)
        np.testing.assert_allclose(
            np.asarray(out[:, pd:-pd]), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
        assert np.all(np.asarray(out[:, :pd]) == 0.0)
        assert np.all(np.asarray(out[:, -pd:]) == 0.0)

    def test_chained_convs_match_xla_chain(self, rng):
        n, d, h, w, ci, cm, co = 1, 4, 8, 8, 8, 16, 8
        x = arr(rng, (n, d, h, w, ci))
        w1 = arr(rng, (5, 3, 3, ci, cm))
        b1 = arr(rng, (cm,), 1.0)
        w2 = arr(rng, (5, 3, 3, cm, co))
        b2 = arr(rng, (co,), 1.0)
        ref = jax.nn.relu(
            conv3d_same(jax.nn.relu(conv3d_same(x, w1) + b1), w2) + b2
        )
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
        y1 = pallas_conv3d_dpad(
            xp, w1, b1, relu=True, compute_dtype=jnp.float32,
            out_dtype=jnp.float32, interpret=True,
        )
        y2 = pallas_conv3d_dpad(
            y1, w2, b2, relu=True, compute_dtype=jnp.float32,
            out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(y2[:, 2:-2]), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_h_tiling(self, rng):
        n, d, h, w, ci, co = 1, 3, 8, 8, 4, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (5, 3, 3, ci, co))
        ref = conv3d_same(x, wk)
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
        out = pallas_conv3d_dpad(
            xp, wk, None, h_tile=4, compute_dtype=jnp.float32,
            out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 2:-2]), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


class TestGeneralKernelSizes:
    @pytest.mark.parametrize("kd,kh,kw", [(5, 5, 5), (3, 5, 3), (1, 3, 5)])
    def test_odd_tap_counts(self, rng, kd, kh, kw):
        n, d, h, w, ci, co = 1, 4, 8, 8, 4, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (kd, kh, kw, ci, co))
        ref = conv3d_same(x, wk)
        out = pallas_conv3d_same(x, wk, compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


class TestPerSampleKernels:
    """Per-sample-weight kernels (the merged-MoDE execution) vs lax."""

    def test_persample_conv_matches_vmapped_lax(self, rng):
        from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_same_persample

        n, d, h, w, ci, co = 2, 3, 8, 8, 8, 16
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (n, 5, 3, 3, ci, co))
        ref = jax.vmap(lambda xi, wi: conv3d_same(xi[None], wi)[0])(x, wk)
        out = pallas_conv3d_same_persample(
            x, wk, compute_dtype=jnp.float32, out_dtype=jnp.float32,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize("kd", [3, 5])
    def test_persample_transposed_conv_matches_flipped(self, rng, kd):
        """transpose_taps=True (the dx backward stage) must equal the conv
        of dy with the spatially flipped, io-transposed kernels — computed
        here explicitly, while the kernel reads the FORWARD weights with
        reversed taps and contracts the output axis in-place."""
        from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_same_persample

        n, d, h, w, ci, co = 2, 3, 8, 8, 8, 16
        wk = arr(rng, (n, kd, 3, 3, ci, co))
        dy = arr(rng, (n, d, h, w, co))
        wt = jnp.flip(wk, axis=(1, 2, 3)).swapaxes(-1, -2)
        ref = jax.vmap(lambda yi, wi: conv3d_same(yi[None], wi)[0])(dy, wt)
        out = pallas_conv3d_same_persample(
            dy, wk, transpose_taps=True, compute_dtype=jnp.float32,
            out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_persample_dw_matches_explicit(self, rng):
        from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_dw_persample

        n, d, h, w, ci, co = 2, 3, 8, 8, 4, 8
        kd, kh, kw = 5, 3, 3
        x = arr(rng, (n, d, h, w, ci))
        dy = arr(rng, (n, d, h, w, co))
        # explicit: dW[n,t,i,o] = sum_p xpad[n, p+t, i] * dy[n, p, o]
        xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1), (1, 1), (0, 0)))
        ref = np.zeros((n, kd, kh, kw, ci, co), np.float32)
        for dz in range(kd):
            for dyy in range(kh):
                for dx in range(kw):
                    a = xp[:, dz : dz + d, dyy : dyy + h, dx : dx + w, :]
                    ref[:, dz, dyy, dx] = np.einsum(
                        "ndhwi,ndhwo->nio", np.asarray(a), np.asarray(dy)
                    )
        out = pallas_conv3d_dw_persample(
            x, dy, kd, kh, kw, compute_dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=1e-4, atol=1e-5
        )

    def test_merged_pallas_op_matches_expert_sum_with_grads(self, rng):
        from repmode_tpu.ops.mode import (
            ExpertKernels,
            gate_logits_to_weights,
            mode_conv_expert_sum_s2d_domain,
            mode_conv_merged_s2d_pallas,
        )

        n, ci, co = 2, 2, 4
        x2 = arr(rng, (n, 4, 8, 8, 4 * ci), 1.0)
        ek = ExpertKernels(
            arr(rng, (5, 5, 5, ci, co)), arr(rng, (3, 3, 3, ci, co)),
            arr(rng, (1, 1, 1, ci, co)), arr(rng, (1, 1, 1, ci, co)),
            arr(rng, (1, 1, 1, ci, co)),
        )
        g = gate_logits_to_weights(arr(rng, (n, 5 * co), 1.0), 5, co)
        y0 = mode_conv_expert_sum_s2d_domain(x2, ek, g)
        y1 = mode_conv_merged_s2d_pallas(x2, ek, g, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5
        )

        def grads(f, **kw):
            def loss(xx, eek, gg):
                return jnp.sum(f(xx, eek, gg, **kw) ** 2)

            return jax.grad(loss, argnums=(0, 1, 2))(x2, ek, g)

        g0 = grads(mode_conv_expert_sum_s2d_domain)
        g1 = grads(mode_conv_merged_s2d_pallas, interpret=True)
        for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            p = np.asarray(p)
            np.testing.assert_allclose(
                np.asarray(q), p, rtol=1e-3,
                atol=1e-5 * (1.0 + np.abs(p).max()),
            )

    def test_merged_op_grads_with_forced_dw_chunking(self, rng, monkeypatch):
        """The dW ci-chunking (scoped-VMEM escape at wide layers) must not
        change gradients — force it at a small shape and compare against
        the unchunked path."""
        from repmode_tpu.ops import mode as mode_mod
        from repmode_tpu.ops.mode import merged_conv_persample

        n, d, h, w, ci, co = 2, 3, 8, 8, 8, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (n, 5, 3, 3, ci, co))

        def loss(xx, ww):
            return jnp.sum(merged_conv_persample(xx, ww, True) ** 2)

        g_ref = jax.grad(loss, argnums=(0, 1))(x, wk)
        monkeypatch.setattr(mode_mod, "_DW_ACC_BUDGET", 1)
        monkeypatch.setattr(mode_mod, "_DW_MIN_CHUNK", 2)
        g_chunk = jax.grad(loss, argnums=(0, 1))(x, wk)
        for p, q in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_chunk)):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(p), rtol=1e-5, atol=1e-6
            )

    def test_fp32_slab_budget_tracks_itemsize(self, monkeypatch):
        """The auto h_tile sizing must use the COMPUTE dtype's itemsize:
        with the old hardcoded bf16 (*2) math, fp32 parity runs at 256-ch
        s2d levels picked slabs 2x too big and OOM'd the 16 MB scoped-VMEM
        window at TPU compile (mult_chan-16 parity run, 2026-08-20). Spy on
        pallas_call's scratch shapes and check the double-buffered slab +
        weight block + out tile fit the budget model at fp32."""
        from repmode_tpu.ops.pallas import conv3d as pc

        captured = {}
        orig = pc.pl.pallas_call

        def spy(kernel, **kw):
            captured["scratch"] = kw.get("scratch_shapes")
            captured["in_specs"] = kw.get("in_specs")
            return orig(kernel, **kw)

        monkeypatch.setattr(pc.pl, "pallas_call", spy)
        from repmode_tpu.ops.mode import merged_conv_persample

        n, d, h, wl, c = 2, 4, 4, 8, 256
        x = jnp.zeros((n, d, h, wl, c), jnp.float32)
        wk = jnp.zeros((n, 5, 3, 3, c, c), jnp.float32)
        y = merged_conv_persample(x, wk, True)  # production chunked entry
        assert y.shape == (n, d, h, wl, c)
        slab = captured["scratch"][0]
        slab_bytes = int(np.prod(slab.shape)) * jnp.dtype(slab.dtype).itemsize
        wblock = captured["in_specs"][1].block_shape
        wblock_bytes = 2 * int(np.prod(wblock)) * 4  # double-buffered fp32
        h_tile = slab.shape[2] - 2
        out_bytes = 2 * h_tile * wl * int(wblock[-1]) * 4
        assert slab_bytes + wblock_bytes + out_bytes <= 16 * 1024 * 1024, (
            slab.shape, wblock, slab_bytes, wblock_bytes, out_bytes
        )

    @pytest.mark.parametrize("dx_transpose", ["1", "0"])
    def test_merged_op_dx_escape_legs_match(self, rng, monkeypatch, dx_transpose):
        """Both backward legs of merged_conv_persample must match plain-AD
        gradients: the default in-kernel transposed-tap dx AND the
        REPMODE_DX_TRANSPOSE=0 escape (the r3 flipped/io-transposed-kernel
        materialization, ops/mode.py _merged_conv_ps_bwd). The escape is a
        live A/B dispatch branch; without this parametrization a regression
        in the default-off leg would go unnoticed."""
        from repmode_tpu.ops.mode import merged_conv_persample

        monkeypatch.setenv("REPMODE_DX_TRANSPOSE", dx_transpose)
        n, d, h, w, ci, co = 2, 3, 8, 8, 8, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (n, 5, 3, 3, ci, co))

        def loss_ref(xx, ww):
            y = jax.vmap(lambda xi, wi: conv3d_same(xi[None], wi)[0])(xx, ww)
            return jnp.sum(y ** 2)

        def loss(xx, ww):
            return jnp.sum(merged_conv_persample(xx, ww, True) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
        g = jax.grad(loss, argnums=(0, 1))(x, wk)
        for p, q in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(p), rtol=1e-4, atol=1e-5
            )

    def test_chunk_sizes_stay_lane_multiples_at_non_pow2_widths(
        self, rng, monkeypatch
    ):
        """_lane_chunk must never emit a chunk that is not a multiple of the
        lane width: the old halving loop turned Co=384 into a 96-lane chunk
        (384 -> 192 -> 96), which breaks Mosaic's 128-aligned channel-dim
        DMA slicing. Check the selector directly at non-power-of-two widths
        and run the forced-chunk conv at a non-power-of-two Co through the
        interpret-mode kernel."""
        from repmode_tpu.ops import mode as mode_mod

        # selector: every produced chunk divides the width and is a
        # multiple of 128, even when the fit forces chunking
        for full in (384, 640, 1152):
            got = mode_mod._lane_chunk(full, lambda c: c <= 128)
            assert got % 128 == 0 and full % got == 0, (full, got)
            got = mode_mod._lane_chunk(full, lambda c: False)
            assert got % 128 == 0 and full % got == 0, (full, got)
        assert mode_mod._lane_chunk(384, lambda c: c <= 256) == 128

        # end-to-end: non-power-of-two Co=12 with a forced tiny budget and
        # lane=4 still matches the unchunked conv (grads included)
        from repmode_tpu.ops.mode import merged_conv_persample

        n, d, h, w, ci, co = 2, 3, 8, 8, 8, 12
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (n, 5, 3, 3, ci, co))

        def loss(xx, ww):
            return jnp.sum(merged_conv_persample(xx, ww, True) ** 2)

        y_ref = jax.vmap(lambda xi, wi: conv3d_same(xi[None], wi)[0])(x, wk)
        g_ref = jax.grad(loss, argnums=(0, 1))(x, wk)

        seen = []
        orig = mode_mod._lane_chunk

        def spy(full, fits, lane=128):
            got = orig(full, fits, lane)
            seen.append((full, got, lane))
            # unchunked (got == full) is always legal; an actual chunk must
            # be a lane multiple that divides the full width
            assert got == full or (
                got % lane == 0 and full % got == 0
            ), (full, got, lane)
            return got

        monkeypatch.setattr(mode_mod, "_lane_chunk", spy)
        monkeypatch.setattr(mode_mod, "_DW_ACC_BUDGET", 1)
        monkeypatch.setattr(mode_mod, "_DW_MIN_CHUNK", 4)
        y = merged_conv_persample(x, wk, True)
        g = jax.grad(loss, argnums=(0, 1))(x, wk)
        assert seen, "chunk selector was never consulted"
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )
        for p, q in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(p), rtol=1e-4, atol=1e-5
            )

    def test_merged_op_under_shard_map_data_parallel(self, rng):
        """Capability: the per-sample merged conv (custom VJP and all) runs
        under jax.shard_map on a data-sharded mesh — each shard executes
        the kernel on its local batch; per-sample weights shard with it, so
        no collectives are needed inside the conv. (The production mesh
        path is the GSPMD rule tested below; shard_map remains supported
        for users hand-scheduling their own parallelism.)"""
        import jax
        from jax.sharding import Mesh, PartitionSpec as P
        from repmode_tpu.ops.mode import merged_conv_persample

        n, d, h, w, ci, co = 8, 3, 8, 8, 4, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (n, 5, 3, 3, ci, co))
        mesh = Mesh(np.array(jax.devices()), ("data",))
        f = jax.shard_map(
            lambda xx, ww: merged_conv_persample(xx, ww, True),
            mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_vma=False,
        )
        ref = jax.vmap(lambda xi, wi: conv3d_same(xi[None], wi)[0])(x, wk)
        y = jax.jit(f)(x, wk)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

        def loss(xx, ww):
            return jnp.sum(f(xx, ww) ** 2)

        def loss_ref(xx, ww):
            return jnp.sum(
                jax.vmap(lambda xi, wi: conv3d_same(xi[None], wi)[0])(xx, ww)
                ** 2
            )

        g1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, wk)
        g0 = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
        for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(p), rtol=1e-4, atol=1e-5
            )

    def test_merged_op_under_pjit_mesh_gspmd(self, rng):
        """The production multi-chip path: under plain jit with
        batch-sharded inputs, the _wrap_batch_parallel GSPMD/Shardy rule
        keeps every stage of the per-sample merged conv (forward, dx, dW)
        shard-local — the lowered HLO contains no all-gather of the
        activations — and values/grads match the single-device reference.
        This is what lets train_impl='auto' keep the merged Pallas kernels
        under multi-device data-parallel meshes (ops/mode.py
        _ps_conv_partitioned / _ps_dw_partitioned)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from repmode_tpu.ops.mode import merged_conv_persample

        n, d, h, w, ci, co = 8, 3, 8, 8, 4, 8
        x = arr(rng, (n, d, h, w, ci))
        wk = arr(rng, (n, 5, 3, 3, ci, co))
        mesh = Mesh(np.array(jax.devices()), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(wk, NamedSharding(mesh, P("data")))

        f = jax.jit(lambda xx, ww: merged_conv_persample(xx, ww, True))
        ref = jax.vmap(lambda xi, wi: conv3d_same(xi[None], wi)[0])(x, wk)
        y = f(xs, ws)
        assert y.sharding.spec == P("data")
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
        hlo = f.lower(xs, ws).compile().as_text()
        # no collective of any kind: grads need no cross-shard reduction
        # either (dW here is per-sample), so all-reduce/collective-permute
        # would equally signal a broken sharding rule
        for coll in ("all-gather", "all-reduce", "collective-permute"):
            assert coll not in hlo, coll

        def loss(xx, ww):
            return jnp.sum(merged_conv_persample(xx, ww, True) ** 2)

        def loss_ref(xx, ww):
            return jnp.sum(
                jax.vmap(lambda xi, wi: conv3d_same(xi[None], wi)[0])(xx, ww)
                ** 2
            )

        gf = jax.jit(jax.grad(loss, argnums=(0, 1)))
        g1 = gf(xs, ws)
        g0 = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
        assert g1[1].sharding.spec[0] == "data"
        for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(p), rtol=1e-4, atol=1e-5
            )
        ghlo = gf.lower(xs, ws).compile().as_text()
        for coll in ("all-gather", "all-reduce", "collective-permute"):
            assert coll not in ghlo, coll
