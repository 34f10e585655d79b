"""Model registry + UNet baseline + CLI arg parsing + monitoring."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.cli.args import build_parser, to_config
from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from repmode_tpu.models import available_models, build_model
from repmode_tpu.models.reparam import make_inference


def test_registry_lists_models():
    assert set(available_models()) >= {"RepMode", "UNet"}


def test_unknown_model_raises():
    cfg = Config(model=ModelConfig(name="NoSuchNet"))
    with pytest.raises(KeyError):
        build_model(cfg)


def test_unet_forward_and_train_step(rng):
    cfg = Config(
        model=ModelConfig(name="UNet", mult_chan=2, depth=2),
        train=TrainConfig(batch_size=2, patch_size=(8, 16, 16), compute_dtype="float32"),
        data=DataConfig(adopted_datasets=("a", "b")),
    )
    from repmode_tpu.train import create_train_state, make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    batch = {
        "signal": jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)).astype(np.float32)),
        "target": jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)).astype(np.float32)),
        "task": jnp.asarray([0, 1], jnp.int32),
    }
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

    # inference path for non-MoDE models: plain eval forward
    prepare, forward = make_inference(cfg)
    plain = prepare(state.variables, 0)
    y = jax.jit(forward)(plain, batch["signal"])
    assert y.shape == (2, 8, 16, 16, 1)


def test_monitor_model_metrics(rng):
    cfg = Config(
        model=ModelConfig(mult_chan=2, depth=2),
        train=TrainConfig(batch_size=2, patch_size=(8, 16, 16), compute_dtype="float32"),
        data=DataConfig(adopted_datasets=("a", "b")),
        monitor_model=True,
    )
    from repmode_tpu.train import create_train_state, make_train_step

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    batch = {
        "signal": jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)).astype(np.float32)),
        "target": jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)).astype(np.float32)),
        "task": jnp.asarray([0, 1], jnp.int32),
    }
    _, m = step(state, batch)
    assert float(m["grad_norm"]) > 0
    assert float(m["param_norm"]) > 0


class TestCliArgs:
    def test_defaults_match_reference(self):
        ns = build_parser().parse_args([])
        cfg = to_config(ns)
        assert cfg.train.num_epochs == 1000          # config.py:32
        assert cfg.train.batch_size == 8             # config.py:33
        assert cfg.train.lr == 1e-4                  # config.py:35
        assert cfg.train.interval_val == 20          # config.py:61
        assert cfg.num_tasks == 12                   # config.py:10-27
        assert cfg.data.adopted_datasets == tuple(sorted(cfg.data.adopted_datasets))

    def test_custom_flags(self):
        ns = build_parser().parse_args([
            "--adopted_datasets", "zz", "aa",
            "--num_epochs", "5", "--path_exp_dir", "exps/foo",
            "--interval_checkpoint", "2", "--compute_dtype", "float32",
        ])
        cfg = to_config(ns)
        assert cfg.data.adopted_datasets == ("aa", "zz")  # sorted (main.py:117)
        assert cfg.exp_name == "foo"
        assert cfg.train.interval_checkpoint == 2
        from repmode_tpu.config import expanded_checkpoint_epochs

        assert expanded_checkpoint_epochs(cfg) == (2, 4)  # main.py:75-77

    def test_run_name_default(self):
        ns = build_parser().parse_args(["--path_exp_dir", "exps/bar"])
        cfg = to_config(ns)
        assert cfg.run_name == "[bar] [RepMode]"  # config.py:64-69 semantics


def test_train_impl_auto_resolves_to_expert_sum_off_tpu(rng):
    """train_impl='auto' must pick the exact expert-sum path on CPU (the
    Pallas per-sample kernels need a real single TPU chip): outputs are
    BITWISE equal to train_impl='expert_sum'."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from repmode_tpu.models.repmode import MoDEConv

    assert jax.default_backend() == "cpu"
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 12)).astype(np.float32))
    emb = jax.nn.one_hot(jnp.asarray([0, 2]), 3, dtype=jnp.float32)
    outs = {}
    for impl in ("auto", "expert_sum"):
        m = MoDEConv(
            num_experts=5, num_tasks=3, in_chan=3, out_chan=6,
            domain="s2d", train_impl=impl,
        )
        v = m.init(jax.random.PRNGKey(0), x, emb, train=True)
        y, _ = m.apply(v, x, emb, train=True, mutable=["batch_stats"])
        outs[impl] = np.asarray(y)
    np.testing.assert_array_equal(outs["auto"], outs["expert_sum"])


def test_indomain_resample_legs_equal(rng):
    """REPMODE_TRAIN_INDOMAIN_RESAMPLE=1 (fused level-seam resamples,
    measured eval-win / train-negative, ARCHITECTURE §13) must compute the
    same function as the default native-seam graph — forward AND gradients.
    Keeps the opt-in leg correct even though training ships with it off."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from repmode_tpu.models import build_model

    cfg = Config(
        model=ModelConfig(mult_chan=2, depth=3),  # levels 1..3 all s2d
        train=TrainConfig(patch_size=(8, 16, 16), compute_dtype="float32"),
        data=DataConfig(adopted_datasets=("a", "b")),
    )
    net = build_model(cfg)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)), jnp.float32)
    task = jnp.asarray([0, 1], jnp.int32)

    outs, grads = {}, {}
    for leg in ("0", "1"):
        os.environ["REPMODE_TRAIN_INDOMAIN_RESAMPLE"] = leg
        try:
            variables = net.init({"params": jax.random.PRNGKey(0)}, x, task)

            def loss(params):
                y, _ = net.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, task, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(y ** 2)

            outs[leg] = net.apply(variables, x, task, train=False)
            grads[leg] = jax.grad(loss)(variables["params"])
        finally:
            os.environ.pop("REPMODE_TRAIN_INDOMAIN_RESAMPLE", None)

    np.testing.assert_allclose(
        np.asarray(outs["1"]), np.asarray(outs["0"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(grads["1"]), jax.tree.leaves(grads["0"])):
        p = np.asarray(b)
        # same math, different reduction trees (the fused-seam einsums
        # reassociate the contraction): fp32 roundoff-level agreement
        np.testing.assert_allclose(
            np.asarray(a), p, rtol=1e-3, atol=5e-5 * (1.0 + np.abs(p).max())
        )
