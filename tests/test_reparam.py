"""Whole-network re-parameterization parity.

The folded plain net (merge experts per task + fold eval BN) must reproduce
the full MoDE net in eval mode bit-closely, for every task.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repmode_tpu.config import Config, ModelConfig
from repmode_tpu.models import build_model
from repmode_tpu.models.reparam import (
    plain_forward,
    reparameterize,
    reparameterize_all_tasks,
)

NUM_TASKS = 3


@pytest.fixture(scope="module")
def small_net():
    cfg = Config(model=ModelConfig(mult_chan=2, depth=2))
    cfg = cfg.replace(
        data=cfg.data.__class__(adopted_datasets=tuple(f"task{i}" for i in range(NUM_TASKS)))
    )
    net = build_model(cfg)
    x = jnp.zeros((2, 8, 16, 16, 1))
    t = jnp.array([0, 1])
    init = jax.jit(functools.partial(net.init, train=True))
    variables = init({"params": jax.random.PRNGKey(42)}, x, t)
    # perturb batch_stats away from init so BN folding is non-trivial
    key = jax.random.PRNGKey(7)
    leaves, treedef = jax.tree.flatten(variables["batch_stats"])
    new_leaves = []
    for i, leaf in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        new_leaves.append(leaf + jax.random.uniform(k, leaf.shape, minval=0.05, maxval=0.5))
    variables = dict(variables, batch_stats=jax.tree.unflatten(treedef, new_leaves))
    return cfg, net, variables


def test_reparam_matches_eval_forward(small_net, rng):
    cfg, net, variables = small_net
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 1)).astype(np.float32))

    eval_apply = jax.jit(functools.partial(net.apply, train=False))
    fwd = jax.jit(functools.partial(plain_forward, cfg=cfg.model))

    for task in range(NUM_TASKS):
        t = jnp.full((2,), task, jnp.int32)
        y_ref = eval_apply(variables, x, t)
        plain = reparameterize(variables, cfg.model, NUM_TASKS, task)
        y_plain = fwd(plain, x)
        np.testing.assert_allclose(
            np.asarray(y_plain), np.asarray(y_ref), rtol=1e-4, atol=1e-4,
            err_msg=f"task {task}",
        )


def test_reparam_all_tasks_stacks(small_net):
    cfg, net, variables = small_net
    stacked = reparameterize_all_tasks(variables, cfg.model, NUM_TASKS)
    single = reparameterize(variables, cfg.model, NUM_TASKS, 1)
    for leaf in jax.tree.leaves(stacked):
        assert leaf.shape[0] == NUM_TASKS
    # slice 1 of stacked == reparam(task=1)
    sliced = jax.tree.map(lambda s: s[1], stacked)
    for a, b in zip(jax.tree.leaves(sliced), jax.tree.leaves(single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
