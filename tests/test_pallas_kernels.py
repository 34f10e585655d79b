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
