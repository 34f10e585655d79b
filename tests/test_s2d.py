"""Space-to-depth conv domain: exactness vs native convs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.ops.conv3d import conv3d_same, downsample2x_conv
from repmode_tpu.ops.s2d import (
    conv3d_same_s2d_domain,
    depth_to_space_hw,
    downsample_s2d_domain,
    s2d_bias,
    s2d_conv_kernel,
    s2d_down_kernel,
    space_to_depth_hw,
    upsample_s2d_to_s2d,
    upsample_to_s2d,
)


def arr(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


class TestTransforms:
    def test_s2d_roundtrip(self, rng):
        x = arr(rng, (2, 4, 8, 12, 3))
        np.testing.assert_array_equal(depth_to_space_hw(space_to_depth_hw(x)), x)

    def test_s2d_layout(self, rng):
        x = arr(rng, (1, 1, 4, 4, 2))
        x2 = space_to_depth_hw(x)
        # phase-major: channel block (py*2+px)*C + c holds x[2h'+py, 2w'+px, c]
        for py in range(2):
            for px in range(2):
                for c in range(2):
                    np.testing.assert_array_equal(
                        np.asarray(x2)[0, 0, :, :, (py * 2 + px) * 2 + c],
                        np.asarray(x)[0, 0, py::2, px::2, c],
                    )


class TestS2dConv:
    @pytest.mark.parametrize("k", [3, 5])
    @pytest.mark.parametrize("ci,co", [(3, 4), (1, 5)])
    def test_matches_native_conv(self, rng, k, ci, co):
        x = arr(rng, (2, 6, 8, 12, ci))
        w = arr(rng, (k, k, k, ci, co)) * 0.2
        native = conv3d_same(x, w)
        s2d_out = conv3d_same_s2d_domain(space_to_depth_hw(x), s2d_conv_kernel(w))
        back = depth_to_space_hw(s2d_out)
        np.testing.assert_allclose(np.asarray(back), np.asarray(native), rtol=1e-5, atol=1e-5)

    def test_bias_replication(self, rng):
        b = arr(rng, (4,))
        b2 = s2d_bias(b)
        assert b2.shape == (16,)
        np.testing.assert_array_equal(np.asarray(b2)[4:8], np.asarray(b))


class TestS2dDownsample:
    def test_matches_native_downsample(self, rng):
        ci, co = 3, 5
        x = arr(rng, (2, 4, 8, 12, ci))
        w = arr(rng, (2, 2, 2, ci, co)) * 0.3
        native = downsample2x_conv(x, w)  # (2, 2, 4, 6, co)
        out = downsample_s2d_domain(space_to_depth_hw(x), s2d_down_kernel(w))
        np.testing.assert_allclose(np.asarray(out), np.asarray(native), rtol=1e-5, atol=1e-5)


class TestTrainS2d:
    def test_matches_native_upsample_to_s2d(self, rng):
        from repmode_tpu.ops.conv3d import upsample2x_convt

        x = arr(rng, (2, 3, 4, 6, 5))
        w = arr(rng, (2, 2, 2, 5, 7))
        native = space_to_depth_hw(upsample2x_convt(x, w))
        out = upsample_to_s2d(x, w)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(native), rtol=1e-5, atol=1e-6
        )

    def test_matches_native_upsample_s2d_to_s2d(self, rng):
        """s2d-in/s2d-out upsample == d2s -> native transposed conv -> s2d."""
        from repmode_tpu.ops.conv3d import upsample2x_convt

        x = arr(rng, (2, 3, 4, 6, 5))  # native input
        w = arr(rng, (2, 2, 2, 5, 7))
        native = space_to_depth_hw(upsample2x_convt(x, w))
        out = upsample_s2d_to_s2d(space_to_depth_hw(x), w)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(native), rtol=1e-5, atol=1e-6
        )

    def test_downsample_trim_d_halo(self, rng):
        x = arr(rng, (1, 4, 2, 2, 8))  # (N, D, h', w', 4C)
        w2 = arr(rng, (2, 1, 1, 8, 3))
        ref = downsample_s2d_domain(x, w2)
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
        out = downsample_s2d_domain(xp, w2, trim_d_halo=2)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7
        )

    def test_expert_sum_s2d_domain_matches(self, rng):
        """The production s2d-domain expert sum (ops/mode.py
        mode_conv_expert_sum_s2d_domain — the only s2d execution path) equals
        the native expert sum after the domain round-trip."""
        from repmode_tpu.ops.mode import (
            ExpertKernels,
            gate_logits_to_weights,
            mode_conv_expert_sum,
            mode_conv_expert_sum_s2d_domain,
        )
        from repmode_tpu.ops.s2d import depth_to_space_hw, space_to_depth_hw

        n, ci, co = 2, 3, 4
        x = arr(rng, (n, 4, 8, 12, ci))
        ek = ExpertKernels(
            arr(rng, (5, 5, 5, ci, co)) * 0.1,
            arr(rng, (3, 3, 3, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
        )
        g = gate_logits_to_weights(arr(rng, (n, 5 * co)), 5, co)
        y0 = mode_conv_expert_sum(x, ek, g)
        y1 = depth_to_space_hw(
            mode_conv_expert_sum_s2d_domain(space_to_depth_hw(x), ek, g)
        )
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("channel_sizes", [None, (64, 64)])
    def test_expert_sum_s2d_box_branch_matches_native(self, rng, channel_sizes):
        """Wide inputs (4*Ci >= 256) route the avg branches through the
        explicit box pool (ops/mode.py geometry dispatch); verify that form
        against the native expert sum after the domain round-trip, with
        gradients to every expert kernel."""
        from repmode_tpu.ops.mode import (
            ExpertKernels,
            gate_logits_to_weights,
            mode_conv_expert_sum,
            mode_conv_expert_sum_s2d_domain,
        )
        from repmode_tpu.ops.s2d import depth_to_space_hw, space_to_depth_hw

        n, co = 1, 4
        ci = sum(channel_sizes) if channel_sizes else 64  # every segment
        #           must be >= 64 native channels to engage the box branch
        x = arr(rng, (n, 2, 6, 6, ci)) * 0.2
        ek = ExpertKernels(
            arr(rng, (5, 5, 5, ci, co)) * 0.05,
            arr(rng, (3, 3, 3, ci, co)) * 0.05,
            arr(rng, (1, 1, 1, ci, co)) * 0.05,
            arr(rng, (1, 1, 1, ci, co)) * 0.05,
            arr(rng, (1, 1, 1, ci, co)) * 0.05,
        )
        g = gate_logits_to_weights(arr(rng, (n, 5 * co)), 5, co)
        if channel_sizes:
            # decoder-style input: a CONCAT of per-segment s2d tensors
            parts, off = [], 0
            for c in channel_sizes:
                parts.append(space_to_depth_hw(x[..., off : off + c]))
                off += c
            x2 = jnp.concatenate(parts, axis=-1)
        else:
            x2 = space_to_depth_hw(x)
        assert x2.shape[-1] >= 256  # the box branch must engage
        y0 = mode_conv_expert_sum(x, ek, g)
        y1 = depth_to_space_hw(
            mode_conv_expert_sum_s2d_domain(x2, ek, g, channel_sizes=channel_sizes)
        )
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5
        )

        def loss(eek):
            return jnp.sum(
                mode_conv_expert_sum_s2d_domain(
                    x2, eek, g, channel_sizes=channel_sizes
                )
                ** 2
            )

        def loss_nat(eek):
            return jnp.sum(mode_conv_expert_sum(x, eek, g) ** 2)

        g0 = jax.grad(loss_nat)(ek)
        g1 = jax.grad(loss)(ek)
        for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            p = np.asarray(p)
            np.testing.assert_allclose(
                np.asarray(q), p, rtol=1e-3,
                atol=1e-5 * (1.0 + np.abs(p).max()),
            )

    @pytest.mark.parametrize("depthfold", ["1", "0"])
    @pytest.mark.parametrize("channel_sizes", [None, (2, 3)])
    def test_tapmajor_merged_s2d_matches_expert_sum(
        self, rng, channel_sizes, depthfold, monkeypatch
    ):
        """The small-co tap-major merged path (production conv_out lowering,
        models/repmode.py MoDEConv out_chan<=4) equals the expert sum —
        forward and gradients. Parametrized over REPMODE_TAPMAJOR_DEPTHFOLD
        so the default depth-folded GEMM AND the =0 A/B escape leg (the r3
        single-GEMM 45-tap form) both stay correct."""
        monkeypatch.setenv("REPMODE_TAPMAJOR_DEPTHFOLD", depthfold)
        from repmode_tpu.ops.mode import (
            ExpertKernels,
            gate_logits_to_weights,
            mode_conv_expert_sum_s2d_domain,
            mode_conv_tapmajor_merged_s2d,
        )

        n, co = 2, 1
        ci = sum(channel_sizes) if channel_sizes else 3
        x2 = arr(rng, (n, 4, 6, 6, 4 * ci))
        ek = ExpertKernels(
            arr(rng, (5, 5, 5, ci, co)) * 0.1,
            arr(rng, (3, 3, 3, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
        )
        g = gate_logits_to_weights(arr(rng, (n, 5 * co)), 5, co)
        y0 = mode_conv_expert_sum_s2d_domain(x2, ek, g, channel_sizes=channel_sizes)
        y1 = mode_conv_tapmajor_merged_s2d(x2, ek, g, channel_sizes=channel_sizes)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-6
        )

        def grads(f):
            def loss(xx, eek, gg):
                return jnp.sum(f(xx, eek, gg, channel_sizes=channel_sizes) ** 2)

            return jax.grad(loss, argnums=(0, 1, 2))(x2, ek, g)

        g0 = grads(mode_conv_expert_sum_s2d_domain)
        g1 = grads(mode_conv_tapmajor_merged_s2d)
        for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            p = np.asarray(p)
            # atol scaled to the leaf's magnitude (the gate grad reduces
            # over all voxels, so its absolute scale is ~100x the others')
            np.testing.assert_allclose(
                np.asarray(q), p, rtol=1e-4,
                atol=1e-5 * (1.0 + np.abs(p).max()),
            )

    @pytest.mark.parametrize("channel_sizes", [None, (2, 3)])
    def test_im2col_merged_s2d_matches_expert_sum(self, rng, channel_sizes):
        """The narrow-input per-sample im2col path (production enc1 conv1
        lowering: 4*Ci < 128, dispatched from mode_conv_merged_s2d_pallas)
        equals the expert sum — forward and gradients."""
        from repmode_tpu.ops.mode import (
            ExpertKernels,
            gate_logits_to_weights,
            mode_conv_expert_sum_s2d_domain,
            mode_conv_im2col_merged_s2d,
        )

        n, co = 2, 8
        ci = sum(channel_sizes) if channel_sizes else 1
        x2 = arr(rng, (n, 4, 6, 6, 4 * ci))
        ek = ExpertKernels(
            arr(rng, (5, 5, 5, ci, co)) * 0.1,
            arr(rng, (3, 3, 3, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
        )
        g = gate_logits_to_weights(arr(rng, (n, 5 * co)), 5, co)
        y0 = mode_conv_expert_sum_s2d_domain(
            x2, ek, g, channel_sizes=channel_sizes
        )
        y1 = mode_conv_im2col_merged_s2d(
            x2, ek, g, channel_sizes=channel_sizes
        )
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-6
        )

        def grads(f):
            def loss(xx, eek, gg):
                return jnp.sum(
                    f(xx, eek, gg, channel_sizes=channel_sizes) ** 2
                )

            return jax.grad(loss, argnums=(0, 1, 2))(x2, ek, g)

        g0 = grads(mode_conv_expert_sum_s2d_domain)
        g1 = grads(mode_conv_im2col_merged_s2d)
        for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            p = np.asarray(p)
            np.testing.assert_allclose(
                np.asarray(q), p, rtol=1e-4,
                atol=1e-5 * (1.0 + np.abs(p).max()),
            )

    @pytest.mark.parametrize("channel_sizes", [None, (2, 3)])
    def test_merged_s2d_domain_matches_expert_sum(self, rng, channel_sizes):
        """Per-sample merged-kernel s2d conv (mode_conv_merged_s2d_domain)
        equals the expert sum — the reference's routing() merge identity
        (RepMode.py:171-192) executed in the s2d domain — for forward AND
        gradients w.r.t. input, every expert kernel, and the gate."""
        from repmode_tpu.ops.mode import (
            ExpertKernels,
            gate_logits_to_weights,
            mode_conv_expert_sum_s2d_domain,
            mode_conv_merged_s2d_domain,
        )

        n, co = 2, 4
        ci = sum(channel_sizes) if channel_sizes else 3
        x2 = arr(rng, (n, 4, 6, 6, 4 * ci))
        ek = ExpertKernels(
            arr(rng, (5, 5, 5, ci, co)) * 0.1,
            arr(rng, (3, 3, 3, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
            arr(rng, (1, 1, 1, ci, co)) * 0.1,
        )
        g = gate_logits_to_weights(arr(rng, (n, 5 * co)), 5, co)
        y0 = mode_conv_expert_sum_s2d_domain(x2, ek, g, channel_sizes=channel_sizes)
        y1 = mode_conv_merged_s2d_domain(x2, ek, g, channel_sizes=channel_sizes)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-6
        )

        def grads(f):
            def loss(xx, eek, gg):
                return jnp.sum(f(xx, eek, gg, channel_sizes=channel_sizes) ** 2)

            return jax.grad(loss, argnums=(0, 1, 2))(x2, ek, g)

        g0 = grads(mode_conv_expert_sum_s2d_domain)
        g1 = grads(mode_conv_merged_s2d_domain)
        for p, q in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(q), np.asarray(p), rtol=1e-4, atol=1e-5
            )

    def test_s2d_kernel_transform_is_differentiable(self, rng):
        from repmode_tpu.ops.s2d import s2d_conv_kernel, space_to_depth_hw
        from repmode_tpu.ops.conv3d import conv3d_same

        w = arr(rng, (5, 5, 5, 2, 3))
        x2 = space_to_depth_hw(arr(rng, (1, 4, 8, 8, 2)))

        def loss(w):
            return jnp.sum(conv3d_same(x2, s2d_conv_kernel(w)) ** 2)

        gr = jax.grad(loss)(w)
        assert gr.shape == w.shape
        assert np.all(np.isfinite(gr)) and np.any(np.asarray(gr) != 0)

    def test_full_model_train_s2d_parity(self, rng):
        """RepModeNet with train_s2d on/off computes the same function."""
        import functools
        from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
        from repmode_tpu.models import build_model

        datasets = ("a", "b")
        base = Config(
            model=ModelConfig(mult_chan=2, depth=2),
            train=TrainConfig(compute_dtype="float32"),
            data=DataConfig(adopted_datasets=datasets),
        )
        cfg_on = base.replace(model=ModelConfig(mult_chan=2, depth=2, train_s2d=True))

        x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)).astype(np.float32))
        t = jnp.asarray([0, 1], jnp.int32)

        net0 = build_model(base)
        vs = jax.jit(functools.partial(net0.init, train=True))(
            {"params": jax.random.PRNGKey(0)}, x, t
        )
        y0, _ = jax.jit(functools.partial(net0.apply, train=True, mutable=["batch_stats"]))(vs, x, t)

        net1 = build_model(cfg_on)
        y1, _ = jax.jit(functools.partial(net1.apply, train=True, mutable=["batch_stats"]))(vs, x, t)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5)
