"""Single-device float64 parity checks against the PyTorch-reference goldens.

Run in a FRESH process (tests/test_parity_fullscale.py spawns it): the script
pins the CPU platform with exactly one device and enables x64 before any JAX
device query, so the comparison carries neither bf16/fp32 rounding nor the
test suite's 8-virtual-device reduction partitioning — tolerances here are
orders of magnitude tighter than the in-process tests (test_torch_parity.py).

Modes:
  --golden tests/goldens/repmode_full_fp64.npz   (default)
      full topology (mult_chan=32, 12 tasks): weights synthesized from the
      spec (tools/golden_common.py); gradients checked via per-leaf norms +
      probe projections, full tensors for small leaves.
  --golden tests/goldens/repmode_small.npz --small
      tiny topology: full state_dict + full per-leaf gradient parity.

Checks (reference semantics cited from /root/reference/fnet/nn_modules/RepMode.py):
  train-mode forward, native + s2d execution domains  (RepMode.py:204-208)
  BatchNorm running-stat update                       (torch BN momentum 0.1)
  eval-mode forward with post-train stats             (RepMode.py:210)
  re-parameterized (merged + BN-folded) forward       (routing(), :171-192)
  MSE loss + full gradient                            (fnet_model.py:108-113)

Exit code 0 and "ALL CHECKS PASSED" on success; every check prints its
measured error so tolerance headroom is visible in the test log.
"""

import argparse
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_by_path(tree, path):
    node = tree
    for k in path:
        node = node[k.key]
    return node


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--golden",
        default=os.path.join(REPO, "tests", "goldens", "repmode_full_fp64.npz"),
    )
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--tol-out", type=float, default=1e-7,
                    help="rel tolerance on forward outputs / BN stats")
    ap.add_argument("--tol-grad", type=float, default=1e-6,
                    help="rel tolerance on gradient norms/probes/leaves")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    assert len(jax.devices()) == 1, jax.devices()

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import golden_common as gc
    import jax.numpy as jnp
    import numpy as np

    from repmode_tpu.compat.torch_import import convert_state_dict
    from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from repmode_tpu.models import build_model
    from repmode_tpu.models.reparam import plain_forward, reparameterize

    z = np.load(args.golden)
    failures = []

    def check(name, err, tol):
        ok = bool(err <= tol)
        print(f"{'PASS' if ok else 'FAIL'}  {name}: err={err:.3e} tol={tol:.1e}")
        if not ok:
            failures.append(name)

    def rel_l2(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-300))

    # ---- reconstruct variables ----
    if args.small:
        state = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
        num_tasks, mult_chan = 3, 2
    else:
        spec = json.loads(str(z["pspec_json"]))
        state = gc.synth_state_dict(spec)
        num_tasks, mult_chan = 12, 32
    variables = jax.tree.map(jnp.asarray, convert_state_dict(state))
    assert all(a.dtype == jnp.float64 for a in jax.tree.leaves(variables))

    datasets = tuple(f"t{i}" for i in range(num_tasks))
    cfg = Config(
        model=ModelConfig(mult_chan=mult_chan, depth=4, train_s2d=False),
        data=DataConfig(adopted_datasets=datasets),
        train=TrainConfig(compute_dtype="float32"),  # None-cast: stays fp64
    )
    net = build_model(cfg)

    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 4, 1)))  # NCDHW -> NDHWC
    t_mixed = jnp.asarray(z["tasks_mixed"].astype(np.int32))
    t_uni = jnp.asarray(z["tasks_uniform"].astype(np.int32))

    def to_nchw(y):
        return np.transpose(np.asarray(y), (0, 4, 1, 2, 3))

    # In the small golden the stored state is post-train (running stats
    # already updated); in full mode the synthesized stats are the fresh
    # init, so the train forward reproduces the reference's stat update.
    if args.small:
        post_vars = variables
    else:
        # ---- train-mode forward (native domain) + BN stat update ----
        apply_train = jax.jit(
            functools.partial(net.apply, train=True, mutable=["batch_stats"])
        )
        y_train, mut = apply_train(variables, x, t_mixed)
        check("train_fwd_native", rel_l2(to_nchw(y_train), z["y_train"]),
              args.tol_out)

        for k in z.files:
            if not k.startswith("bs."):
                continue
            name = k[3:]
            routed = convert_state_dict({name: z[k]})["batch_stats"]
            (path, ref), = jax.tree_util.tree_flatten_with_path(routed)[0]
            ours = get_by_path(mut["batch_stats"], path)
            check(f"bn_stats:{name}", rel_l2(ours, ref), args.tol_out)

        # ---- train-mode forward, s2d execution domain ----
        cfg_s2d = cfg.replace(
            model=ModelConfig(mult_chan=mult_chan, depth=4, train_s2d=True)
        )
        net_s2d = build_model(cfg_s2d)
        y_s2d, _ = jax.jit(
            functools.partial(net_s2d.apply, train=True, mutable=["batch_stats"])
        )(variables, x, t_mixed)
        check("train_fwd_s2d", rel_l2(to_nchw(y_s2d), z["y_train"]),
              args.tol_out)

        post_vars = dict(variables, batch_stats=mut["batch_stats"])

    # ---- eval-mode forward with post-train running stats ----
    y_eval = jax.jit(functools.partial(net.apply, train=False))(
        post_vars, x, t_uni
    )
    check("eval_fwd", rel_l2(to_nchw(y_eval), z["y_eval"]), args.tol_out)

    # ---- re-parameterized (merged + BN-folded) forward ----
    task = int(z["tasks_uniform"][0])
    plain = reparameterize(post_vars, cfg.model, cfg.num_tasks, task)
    y_rep = jax.jit(functools.partial(plain_forward, cfg=cfg.model))(plain, x)
    check("reparam_fwd", rel_l2(to_nchw(y_rep), z["y_eval"]), args.tol_out)

    # ---- loss + gradients ----
    target = jnp.asarray(np.transpose(z["grad_target"], (0, 2, 3, 4, 1)))

    def loss_fn(params):
        out, _ = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, t_mixed, train=True, mutable=["batch_stats"],
        )
        return jnp.mean((out - target) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    check("loss", abs(float(loss) - float(z["grad_loss"]))
          / abs(float(z["grad_loss"])), args.tol_grad)

    grad_names = sorted(
        {k[len("gnorm."):] for k in z.files if k.startswith("gnorm.")}
        | {k[3:] for k in z.files if k.startswith("gr.")}
    )
    assert len(grad_names) > 50, grad_names
    worst = {"full": 0.0, "norm": 0.0, "probe": 0.0}
    for name in grad_names:
        shape = state[name].shape
        routed = convert_state_dict({name: np.zeros(shape)})["params"]
        (path, _), = jax.tree_util.tree_flatten_with_path(routed)[0]
        ours = np.asarray(get_by_path(grads, path), np.float64)

        if ("gr." + name) in z.files:  # full-tensor comparison
            ref = convert_state_dict({name: z["gr." + name]})["params"]
            ref = jax.tree.leaves(ref)[0]
            err = rel_l2(ours, ref)
            worst["full"] = max(worst["full"], err)
            if err > args.tol_grad:
                check(f"grad_full:{name}", err, args.tol_grad)
        if ("gnorm." + name) in z.files:  # norm + probe projections
            gn_ref = float(z["gnorm." + name])
            err = abs(float(np.linalg.norm(ours.ravel())) - gn_ref) / gn_ref
            worst["norm"] = max(worst["norm"], err)
            if err > args.tol_grad:
                check(f"grad_norm:{name}", err, args.tol_grad)
            dots_ref = np.asarray(z["gdot." + name])
            for j in range(int(z["n_probes"])):
                # probes are generated in the TORCH layout; route them
                # through the same layout conversion as the weights so the
                # projection is taken in our layout — identical inner product
                p_t = gc.probe(name, shape, j)
                p = np.asarray(
                    jax.tree.leaves(convert_state_dict({name: p_t})["params"])[0],
                    np.float64,
                )
                bound = float(np.linalg.norm(p)) * gn_ref
                err = abs(float(ours.ravel() @ p.ravel()) - float(dots_ref[j])) / bound
                worst["probe"] = max(worst["probe"], err)
                if err > args.tol_grad:
                    check(f"grad_probe{j}:{name}", err, args.tol_grad)
    for kind, err in worst.items():
        if err:
            check(f"grad_worst_{kind} ({len(grad_names)} leaves)", err,
                  args.tol_grad)

    if failures:
        print(f"FAILED: {len(failures)} checks: {failures[:20]}")
        sys.exit(1)
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
