"""flat_adam equivalence: the flat-buffer Adam lowering must be elementwise
identical to per-tensor optax.adam and to torch.optim.Adam (the reference
optimizer, fnet/fnet_model.py:55). flat_adam underlies every shipped training
number (train/state.py make_optimizer default), so these tests are the
guarantee that the lowering is a pure XLA-program change, not a math change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from repmode_tpu.train.state import create_train_state, flat_adam, make_optimizer
from repmode_tpu.train.step import make_train_step

from test_train_step import make_batch, tiny_cfg


def mixed_tree(rng):
    """Param tree with mixed shapes/nesting like a real model."""
    return {
        "conv": {"kernel": jnp.asarray(rng.standard_normal((3, 3, 4, 8)), jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal((8,)), jnp.float32)},
        "gate": {"w": jnp.asarray(rng.standard_normal((12, 20)), jnp.float32)},
        "scale": jnp.asarray(rng.standard_normal(()), jnp.float32),
    }


class TestFlatAdamVsOptax:
    def test_transform_level_elementwise_equal(self, rng):
        """10 update steps on a mixed-shape tree: flat_adam's updates equal
        optax.adam's to float32 roundoff, leaf by leaf."""
        lr = 1e-3
        params_a = mixed_tree(rng)
        params_b = jax.tree.map(jnp.copy, params_a)
        tx_a = flat_adam(lr)
        tx_b = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
        st_a = tx_a.init(params_a)
        st_b = tx_b.init(params_b)
        for i in range(10):
            g_rng = np.random.default_rng(100 + i)
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    g_rng.standard_normal(p.shape), jnp.float32
                ),
                params_a,
            )
            up_a, st_a = tx_a.update(grads, st_a, params_a)
            up_b, st_b = tx_b.update(grads, st_b, params_b)
            params_a = optax.apply_updates(params_a, up_a)
            params_b = optax.apply_updates(params_b, up_b)
            for a, b in zip(jax.tree.leaves(up_a), jax.tree.leaves(up_b)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9
                )
        for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
            )

    def test_real_model_training_trajectory_equal(self, rng):
        """12 full train steps on the real MoDE model: the flat and
        per-tensor optimizers produce the same parameter trajectory."""
        cfg = tiny_cfg()
        batch = make_batch(rng, cfg)
        final = {}
        for name, tx in [
            ("flat", flat_adam(cfg.train.lr)),
            ("ref", optax.adam(cfg.train.lr, b1=0.9, b2=0.999, eps=1e-8)),
        ]:
            state = create_train_state(cfg, jax.random.PRNGKey(0), tx=tx)
            step = make_train_step(cfg, donate=False, tx=tx)
            for _ in range(12):
                state, _ = step(state, batch)
            final[name] = state
        for a, b in zip(
            jax.tree.leaves(final["flat"].params),
            jax.tree.leaves(final["ref"].params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
            )

    def test_make_optimizer_env_knob(self, monkeypatch):
        """REPMODE_FLAT_ADAM=0 must select per-tensor optax.adam (the A/B
        escape leg); the default must select the flat lowering."""
        from repmode_tpu.train.state import FlatAdamState

        cfg = tiny_cfg()
        params = {"w": jnp.zeros((4,), jnp.float32)}
        monkeypatch.delenv("REPMODE_FLAT_ADAM", raising=False)
        assert isinstance(make_optimizer(cfg).init(params), FlatAdamState)
        monkeypatch.setenv("REPMODE_FLAT_ADAM", "0")
        st = make_optimizer(cfg).init(params)
        assert not isinstance(st, FlatAdamState)
        assert isinstance(st, tuple)  # optax chain state


class TestFlatAdamVsTorch:
    def test_matches_torch_adam_golden(self, rng):
        """15 steps against torch.optim.Adam (the reference's optimizer,
        fnet_model.py:55) with identical gradient sequences."""
        torch = pytest.importorskip("torch")

        lr, n = 1e-3, 257
        p0 = rng.standard_normal(n).astype(np.float32)
        grads = [rng.standard_normal(n).astype(np.float32) for _ in range(15)]

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.Adam([tp], lr=lr, betas=(0.9, 0.999), eps=1e-8)
        for g in grads:
            opt.zero_grad()
            tp.grad = torch.from_numpy(g.copy())
            opt.step()
        torch_final = tp.detach().numpy()

        params = {"p": jnp.asarray(p0)}
        tx = flat_adam(lr)
        st = tx.init(params)
        for g in grads:
            up, st = tx.update({"p": jnp.asarray(g)}, st, params)
            params = optax.apply_updates(params, up)
        np.testing.assert_allclose(
            np.asarray(params["p"]), torch_final, rtol=1e-5, atol=1e-7
        )
