"""MoDE conv math: the re-parameterization identity and execution-path parity.

The central correctness property (SURVEY.md §4): the gated sum of expert
convolutions equals convolution with the merged kernel. The reference trains
with per-sample merged kernels (RepMode.py:204-208) and evals with a single
merged kernel (RepMode.py:210); we train with the expert-sum decomposition —
all three must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.ops.conv3d import (
    avg_pool_same,
    conv3d_same,
    downsample2x_conv,
    upsample2x_convt,
)
from repmode_tpu.ops.mode import (
    ExpertKernels,
    expert_bank,
    gate_logits_to_weights,
    im2col_patches,
    merge_kernels,
    mode_conv_expert_sum,
    mode_conv_im2col_bank,
    mode_conv_im2col_merged,
    mode_conv_merged,
    mode_conv_single,
)


def make_experts(rng, ci, co, dtype=np.float32):
    def k(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(dtype) * 0.1)

    return ExpertKernels(
        w5=k((5, 5, 5, ci, co)),
        w3=k((3, 3, 3, ci, co)),
        w1=k((1, 1, 1, ci, co)),
        wa3=k((1, 1, 1, ci, co)),
        wa5=k((1, 1, 1, ci, co)),
    )


def make_gate(rng, n, e, co):
    logits = jnp.asarray(rng.standard_normal((n, e * co)).astype(np.float32))
    return gate_logits_to_weights(logits, e, co)


class TestMergeIdentity:
    def test_expert_sum_equals_merged(self, rng):
        n, ci, co = 3, 4, 6
        x = jnp.asarray(rng.standard_normal((n, 6, 10, 10, ci)).astype(np.float32))
        ek = make_experts(rng, ci, co)
        g = make_gate(rng, n, 5, co)

        y_sum = mode_conv_expert_sum(x, ek, g)
        y_merged = mode_conv_merged(x, ek, g)
        np.testing.assert_allclose(y_sum, y_merged, rtol=2e-4, atol=2e-5)

    def test_im2col_patches_reproduce_conv(self, rng):
        """conv3d_same(x, w) == im2col_patches(x, k) @ w.reshape(-1, Co) —
        the tap/channel flattening orders agree by construction."""
        n, ci, co, k = 2, 3, 4, 5
        x = jnp.asarray(rng.standard_normal((n, 4, 6, 6, ci)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, k, k, ci, co)).astype(np.float32) * 0.1
        )
        ref = conv3d_same(x, w)
        got = (im2col_patches(x, k) @ w.reshape(-1, co)).reshape(ref.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize(
        "impl", [mode_conv_im2col_bank, mode_conv_im2col_merged]
    )
    def test_im2col_paths_equal_expert_sum(self, rng, impl):
        """The deep-level im2col GEMM lowerings (bank and per-sample merged)
        equal the expert sum — forward and gradients w.r.t. input, every
        expert kernel, and the gate."""
        n, ci, co = 2, 4, 6
        x = jnp.asarray(rng.standard_normal((n, 4, 6, 6, ci)).astype(np.float32))
        ek = make_experts(rng, ci, co)
        g = make_gate(rng, n, 5, co)

        y0 = mode_conv_expert_sum(x, ek, g)
        y1 = impl(x, ek, g)
        np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-6)

        def grads(f):
            def loss(xx, eek, gg):
                return jnp.sum(f(xx, eek, gg) ** 2)

            return jax.grad(loss, argnums=(0, 1, 2))(x, ek, g)

        for p, q in zip(
            jax.tree.leaves(grads(mode_conv_expert_sum)),
            jax.tree.leaves(grads(impl)),
        ):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(p), rtol=1e-4, atol=1e-5
            )

    def test_merged_equals_single_when_uniform(self, rng):
        """Task-uniform batch: per-sample merged == one shared kernel."""
        n, ci, co = 4, 3, 5
        x = jnp.asarray(rng.standard_normal((n, 4, 8, 8, ci)).astype(np.float32))
        ek = make_experts(rng, ci, co)
        g_row = make_gate(rng, 1, 5, co)
        g = jnp.tile(g_row, (n, 1, 1))

        w = merge_kernels(ek, g_row)[0]
        y_single = mode_conv_single(x, w)
        y_merged = mode_conv_merged(x, ek, g)
        np.testing.assert_allclose(y_single, y_merged, rtol=1e-5, atol=1e-6)

    def test_avg_branch_composition(self, rng):
        """conv1(avg_k(x)) == conv(x, merged avg-pool kernel) — the einsum
        composition at RepMode.py:176-180."""
        n, ci, co = 2, 3, 4
        x = jnp.asarray(rng.standard_normal((n, 5, 7, 7, ci)).astype(np.float32))
        ek = make_experts(rng, ci, co)

        # direct: pool then 1^3 conv
        y_direct3 = conv3d_same(avg_pool_same(x, 3), ek.wa3)
        y_direct5 = conv3d_same(avg_pool_same(x, 5), ek.wa5)

        # composed kernels from the bank (indices 3, 4)
        bank = expert_bank(ek, 5)
        y_bank3 = conv3d_same(x, bank[3])
        y_bank5 = conv3d_same(x, bank[4])
        np.testing.assert_allclose(y_direct3, y_bank3, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(y_direct5, y_bank5, rtol=1e-5, atol=1e-6)

    def test_gate_softmax_normalization(self, rng):
        g = make_gate(rng, 3, 5, 7)
        np.testing.assert_allclose(np.sum(np.asarray(g), axis=1), 1.0, rtol=1e-6)

    def test_grad_flows_through_expert_sum(self, rng):
        """Gradients w.r.t. expert kernels and gates exist and are finite."""
        n, ci, co = 2, 2, 3
        x = jnp.asarray(rng.standard_normal((n, 4, 6, 6, ci)).astype(np.float32))
        ek = make_experts(rng, ci, co)
        g = make_gate(rng, n, 5, co)

        def loss(ek, g):
            return jnp.mean(mode_conv_expert_sum(x, ek, g) ** 2)

        grads = jax.grad(loss, argnums=(0, 1))(ek, g)
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(leaf))
            assert np.any(np.asarray(leaf) != 0)


class TestTapMajorConv:
    @pytest.mark.parametrize("kshape", [(5, 3, 3), (5, 5, 5), (3, 3, 3)])
    def test_matches_conv3d_same(self, rng, kshape):
        from repmode_tpu.ops.conv3d import conv3d_same, conv3d_same_tapmajor

        kd, kh, kw = kshape
        n, d, h, w_, ci, co = 2, 6, 8, 8, 8, 4
        x = jnp.asarray(rng.standard_normal((n, d, h, w_, ci)).astype(np.float32))
        wk = jnp.asarray(
            rng.standard_normal((kd, kh, kw, ci, co)).astype(np.float32) * 0.1
        )
        ref = conv3d_same(x, wk)
        out = conv3d_same_tapmajor(x, wk)
        # reassociated fp32 sums (per-tap partials vs one conv reduction)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


class TestResampleOps:
    def test_downsample_matches_lax_conv(self, rng):
        n, ci, co = 2, 3, 4
        x = jnp.asarray(rng.standard_normal((n, 4, 8, 8, ci)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((2, 2, 2, ci, co)).astype(np.float32))
        y = downsample2x_conv(x, w)
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2, 2), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        assert y.shape == (n, 2, 4, 4, co)
        np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)

    def test_upsample_is_transpose_of_downsample(self, rng):
        """convT(k=2,s=2) must be the adjoint of conv(k=2,s=2):
        <down(x), y> == <x, up(y)> for all x, y."""
        n, ci, co = 1, 2, 3
        x = jnp.asarray(rng.standard_normal((n, 4, 4, 4, ci)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((2, 2, 2, ci, co)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((n, 2, 2, 2, co)).astype(np.float32))
        lhs = jnp.sum(downsample2x_conv(x, w) * y)
        # adjoint uses the same taps with in/out channels swapped
        w_t = jnp.transpose(w, (0, 1, 2, 4, 3))  # (2,2,2,co,ci)
        rhs = jnp.sum(x * upsample2x_convt(y, w_t))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_upsample_shape_and_placement(self, rng):
        """Each output 2x2x2 block is input voxel (x) kernel."""
        x = jnp.zeros((1, 2, 2, 2, 1)).at[0, 1, 0, 1, 0].set(2.0)
        w = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2, 1, 1)
        y = upsample2x_convt(x, w)
        assert y.shape == (1, 4, 4, 4, 1)
        block = np.asarray(y)[0, 2:4, 0:2, 2:4, 0]
        np.testing.assert_allclose(block, 2.0 * np.arange(8).reshape(2, 2, 2))
        # everything else zero
        total = np.asarray(y).sum()
        np.testing.assert_allclose(total, block.sum())


class TestAvgPool:
    def test_matches_explicit_conv(self, rng):
        """avg_pool_same == conv with constant 1/k^3 kernel, zero 'same' pad."""
        x = jnp.asarray(rng.standard_normal((2, 4, 6, 6, 3)).astype(np.float32))
        for k in (3, 5):
            kernel = jnp.zeros((k, k, k, 3, 3))
            for c in range(3):
                kernel = kernel.at[:, :, :, c, c].set(1.0 / k**3)
            ref = conv3d_same(x, kernel)
            np.testing.assert_allclose(avg_pool_same(x, k), ref, rtol=1e-4, atol=1e-6)


class TestBF16Path:
    def test_expert_sum_bf16_close_to_fp32(self, rng):
        n, ci, co = 2, 4, 8
        x = jnp.asarray(rng.standard_normal((n, 4, 8, 8, ci)).astype(np.float32))
        ek = make_experts(rng, ci, co)
        g = make_gate(rng, n, 5, co)
        y32 = mode_conv_expert_sum(x, ek, g)
        y16 = mode_conv_expert_sum(x, ek, g, compute_dtype=jnp.bfloat16)
        # AMP emits compute_dtype end-to-end (incl. the gated combine) —
        # the fp32 floor returns at the BN stats, like torch autocast
        assert y16.dtype == jnp.bfloat16
        rel = np.max(np.abs(np.asarray(y16) - np.asarray(y32))) / (
            np.max(np.abs(np.asarray(y32))) + 1e-8
        )
        assert rel < 0.03
