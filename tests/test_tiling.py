"""Sliding-window tiling + Gaussian stitching.

Grid parity vs the reference algorithm (fnet_model.py:155-193) and the
stitching invariant: blending any function through an identity network
reconstructs it exactly (weights cancel).
"""

from math import ceil

import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.config import Config, EvalConfig, TrainConfig
from repmode_tpu.infer.predict import TiledPredictor
from repmode_tpu.infer.tiling import compute_patch_starts
from repmode_tpu.ops.gaussian import gaussian_importance_map


def reference_grid(img_size, patch_size, over_lap_ratio=0.5):
    """Literal re-expression of the reference loop for cross-checking."""
    strides = [int(ceil(p * (1 - over_lap_ratio))) for p in patch_size]
    steps = [
        int(ceil((i - p) / s + 1)) for i, p, s in zip(img_size, patch_size, strides)
    ]
    out = []
    for i in range(steps[0]):
        for j in range(steps[1]):
            for k in range(steps[2]):
                starts = [idx * s for idx, s in zip((i, j, k), strides)]
                ends = [min(st + p, im) for st, p, im in zip(starts, patch_size, img_size)]
                starts = [max(e - p, 0) for e, p in zip(ends, patch_size)]
                out.append(starts)
    return np.asarray(out, np.int32)


class TestPatchGrid:
    @pytest.mark.parametrize(
        "img",
        [(32, 128, 128), (32, 624, 924), (40, 200, 300), (33, 129, 130)],
    )
    def test_matches_reference_algorithm(self, img):
        patch = (32, 128, 128)
        np.testing.assert_array_equal(
            compute_patch_starts(img, patch, 0.5), reference_grid(img, patch)
        )

    def test_covers_volume(self):
        img, patch = (40, 150, 170), (16, 64, 64)
        starts = compute_patch_starts(img, patch, 0.5)
        cov = np.zeros(img, bool)
        for s in starts:
            cov[s[0]:s[0]+patch[0], s[1]:s[1]+patch[1], s[2]:s[2]+patch[2]] = True
        assert cov.all()

    def test_rejects_small_volume(self):
        with pytest.raises(ValueError):
            compute_patch_starts((8, 64, 64), (16, 64, 64))


class TestGaussianMap:
    def test_matches_scipy(self):
        scipy = pytest.importorskip("scipy")
        from scipy.ndimage import gaussian_filter

        patch = (8, 24, 24)
        tmp = np.zeros(patch)
        tmp[tuple(i // 2 for i in patch)] = 1
        ref = gaussian_filter(tmp, [i / 8 for i in patch], 0, mode="constant", cval=0)
        ref = ref / ref.max()
        ref = ref.astype(np.float32)
        ref[ref == 0] = ref[ref != 0].min()

        ours = gaussian_importance_map(patch)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)

    def test_positive_and_peak_one(self):
        g = gaussian_importance_map((16, 32, 32))
        assert g.max() == 1.0
        assert (g > 0).all()


def small_cfg(patch=(8, 16, 16), batch=4):
    return Config(
        train=TrainConfig(batch_size_eval=batch, compute_dtype="float32"),
        eval=EvalConfig(patch_size=patch),
    )


class TestStitching:
    def test_identity_network_reconstructs_exactly(self, rng):
        """If the 'network' is identity, stitching must return the input:
        sum(x*g)/sum(g) == x wherever weights overlap."""
        cfg = small_cfg()
        pred = TiledPredictor(cfg, forward_fn=lambda plain, x: x)
        vol = rng.standard_normal((12, 40, 56)).astype(np.float32)
        out = np.asarray(pred({}, vol))
        np.testing.assert_allclose(out, vol, rtol=1e-5, atol=1e-5)

    def test_constant_shift_network(self, rng):
        cfg = small_cfg(batch=3)  # ragged batching exercises the mask
        pred = TiledPredictor(cfg, forward_fn=lambda plain, x: x + 2.5)
        vol = rng.standard_normal((8, 30, 33)).astype(np.float32)
        out = np.asarray(pred({}, vol))
        np.testing.assert_allclose(out, vol + 2.5, rtol=1e-5, atol=1e-5)

    def test_uses_params(self, rng):
        cfg = small_cfg()
        pred = TiledPredictor(cfg, forward_fn=lambda plain, x: x * plain["scale"])
        vol = rng.standard_normal((8, 16, 16)).astype(np.float32)
        out = np.asarray(pred({"scale": jnp.asarray(3.0)}, vol))
        np.testing.assert_allclose(out, vol * 3.0, rtol=1e-5, atol=1e-5)


class TestTwoPhasePredictor:
    def test_matches_fused(self, rng):
        cfg = small_cfg(batch=3)
        vol = rng.standard_normal((8, 30, 33)).astype(np.float32)
        fwd = lambda plain, x: x * 0.5 + 1.0
        fused = TiledPredictor(cfg, forward_fn=fwd, mode="fused")
        two = TiledPredictor(cfg, forward_fn=fwd, mode="two_phase")
        np.testing.assert_allclose(
            np.asarray(fused({}, vol)), np.asarray(two({}, vol)), rtol=1e-5, atol=1e-6
        )

    def test_mesh_sharded_two_phase(self, rng):
        """Patch grid sharded over an 8-device mesh == single device."""
        from repmode_tpu.parallel import make_mesh

        cfg = small_cfg(batch=2)
        vol = rng.standard_normal((8, 32, 48)).astype(np.float32)
        fwd = lambda plain, x: x + 0.25
        single = TiledPredictor(cfg, forward_fn=fwd, mode="two_phase")
        sharded = TiledPredictor(
            cfg, forward_fn=fwd, mode="two_phase", mesh=make_mesh(8)
        )
        np.testing.assert_allclose(
            np.asarray(single({}, vol)), np.asarray(sharded({}, vol)),
            rtol=1e-5, atol=1e-6,
        )


class TestPredictorComposition:
    def test_single_patch_volume_equals_direct_forward(self, rng):
        """A volume exactly one patch big: predictor == plain forward
        (Gaussian weights cancel in sum/weight division). Composes tiling,
        gather, forward, and stitch against the network applied directly."""
        import functools
        import jax
        from repmode_tpu.config import Config, DataConfig, EvalConfig, ModelConfig
        from repmode_tpu.models import build_model
        from repmode_tpu.models.reparam import make_inference

        cfg = Config(
            model=ModelConfig(mult_chan=2, depth=2),
            train=TrainConfig(batch_size_eval=4, compute_dtype="float32"),
            eval=EvalConfig(patch_size=(8, 16, 16)),
            data=DataConfig(adopted_datasets=("a", "b")),
        )
        net = build_model(cfg)
        x = jnp.zeros((1, 8, 16, 16, 1))
        variables = jax.jit(functools.partial(net.init, train=True))(
            {"params": jax.random.PRNGKey(0)}, x, jnp.zeros((1,), jnp.int32)
        )
        prepare, forward = make_inference(cfg)
        plain = prepare(variables, 1)

        vol = rng.standard_normal((8, 16, 16)).astype(np.float32)
        pred = TiledPredictor(cfg)
        stitched = np.asarray(pred(plain, vol))
        direct = np.asarray(forward(plain, jnp.asarray(vol)[None, ..., None]))[0, ..., 0]
        np.testing.assert_allclose(stitched, direct, rtol=1e-4, atol=1e-5)

        # and the eval-mode MoDE net agrees too (reparam correctness composed)
        y_net = np.asarray(
            net.apply(variables, jnp.asarray(vol)[None, ..., None],
                      jnp.ones((1,), jnp.int32), train=False)
        )[0, ..., 0]
        np.testing.assert_allclose(stitched, y_net, rtol=1e-3, atol=1e-4)
