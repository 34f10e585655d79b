"""Whole-network s2d execution parity: plain_forward_s2d == plain_forward."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from repmode_tpu.models import build_model
from repmode_tpu.models.reparam import (
    default_s2d_levels,
    make_inference,
    plain_forward,
    plain_forward_s2d,
    reparameterize,
    to_s2d_plain,
)

NUM_TASKS = 2


@pytest.fixture(scope="module")
def net_vars():
    cfg = Config(
        model=ModelConfig(mult_chan=2, depth=3),
        train=TrainConfig(compute_dtype="float32"),
        data=DataConfig(adopted_datasets=("t0", "t1")),
    )
    net = build_model(cfg)
    x = jnp.zeros((1, 8, 16, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(functools.partial(net.init, train=True))(
        {"params": jax.random.PRNGKey(3)}, x, t
    )
    return cfg, variables


def test_default_levels():
    assert default_s2d_levels(ModelConfig(mult_chan=32, depth=4)) == (1, 2)
    assert default_s2d_levels(ModelConfig(mult_chan=2, depth=4)) == (1, 2, 3, 4)


@pytest.mark.parametrize("knobs", ["1", "0"])
@pytest.mark.parametrize("levels", [(1,), (1, 2), (1, 2, 3)])
def test_s2d_forward_parity(net_vars, rng, levels, knobs, monkeypatch):
    """Both legs of the eval-graph knobs: the default forms (decoder
    concat split into two convs; encoder downsample emitting the next
    s2d level directly) and the =0 escapes (materialized concat;
    native-layout downsample + explicit space_to_depth)."""
    monkeypatch.setenv("REPMODE_EVAL_SPLITCAT", knobs)
    monkeypatch.setenv("REPMODE_EVAL_DOWNS2D", knobs)
    cfg, variables = net_vars
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)).astype(np.float32))
    plain = reparameterize(variables, cfg.model, NUM_TASKS, 0)
    y_ref = jax.jit(functools.partial(plain_forward, cfg=cfg.model))(plain, x)

    plain2 = to_s2d_plain(plain, cfg.model, levels)
    y_s2d = jax.jit(
        functools.partial(plain_forward_s2d, cfg=cfg.model, s2d_levels=levels)
    )(plain2, x)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_ref), rtol=1e-4, atol=1e-5
    )


def test_make_inference_consistency(net_vars, rng):
    """prepare/forward pair from make_inference agrees with the non-s2d path."""
    cfg, variables = net_vars
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 1)).astype(np.float32))

    prepare, forward = make_inference(cfg)  # s2d on by default
    y = jax.jit(forward)(prepare(variables, 1), x)

    cfg_off = cfg.replace(eval=cfg.eval.__class__(s2d=False))
    prep2, fwd2 = make_inference(cfg_off)
    y2 = jax.jit(fwd2)(prep2(variables, 1), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-4, atol=1e-5)


def test_pallas_geometry_fallback(net_vars, caplog):
    """pallas_conv=True with unsupported geometry (kernel_size!=5 or narrow
    mult_chan) must fall back to the XLA s2d path with a logged warning, not
    hit bare asserts deep in the dpad kernel (round-2 advisor finding)."""
    import logging

    from repmode_tpu.models.reparam import pallas_geometry_ok

    cfg, _ = net_vars
    assert not pallas_geometry_ok(cfg.model)  # tiny test net: mult_chan % 32 != 0
    cfg_p = cfg.replace(eval=cfg.eval.__class__(pallas_conv=True))
    with caplog.at_level(logging.WARNING, logger="repmode_tpu"):
        _, forward = make_inference(cfg_p)
    assert forward.func is plain_forward_s2d
    assert any("falling back to the XLA s2d path" in r.message
               for r in caplog.records)
