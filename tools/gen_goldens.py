"""Generate golden parity tensors from the PyTorch reference (run once, offline).

Runs the reference RepMode net (/root/reference, imported read-only at tool
time — never vendored) and dumps inputs/outputs (+ state for the small config)
to tests/goldens/. Tests then assert our TPU-native net reproduces these
numbers without needing the reference present.

Two configurations:

  default  tiny net (mult_chan=2, 3 tasks, 16^3 input): full state_dict +
           full gradients stored -> tests/goldens/repmode_small.npz
  --full   the real topology (mult_chan=32, 12 tasks, 16x32x32 input):
           ~125M params, so weights are SYNTHESIZED deterministically
           (tools/golden_common.py) and gradients are stored as norms +
           probe projections (full tensors only for small leaves)
           -> tests/goldens/repmode_full_fp64.npz

Both run the reference in float64 so the goldens carry no fp32 rounding
noise of their own; the checker (tools/parity_check.py) then runs our net in
float64 on a single device and asserts tight (~1e-6) tolerances.

Usage: python tools/gen_goldens.py [reference_path] [--full] [--dtype float64]
"""

import argparse
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import golden_common as gc  # noqa: E402

REF_TASKS_FULL = [  # reference config.py:10-27, sorted (main.py:117)
    "alpha_tubulin", "beta_actin", "desmoplakin", "dna", "fibrillarin",
    "lamin_b1", "membrane_caax_63x", "myosin_iib", "sec61_beta", "st6gal1",
    "tom20", "zo1",
]


def run_reference(net, torch, x, tasks_mixed, tasks_uniform, rng):
    """Shared capture protocol: train fwd -> stats -> eval fwd -> grads."""
    xt = torch.from_numpy(x)

    # train-mode forward (batch-stats BN, per-sample merged kernels)
    net.train()
    with torch.no_grad():
        y_train = net(xt, torch.from_numpy(tasks_mixed)).numpy()
    # capture running stats AFTER the train forward (they were updated)
    state_after_train = {
        k: v.detach().cpu().numpy().copy() for k, v in net.state_dict().items()
    }  # .copy(): .numpy() views share storage with buffers the grad pass mutates

    # eval-mode forward (running-stats BN, single merged kernel, uniform task)
    net.eval()
    with torch.no_grad():
        y_eval = net(xt, torch.from_numpy(tasks_uniform)).numpy()

    # gradient golden LAST: the train-mode grad forward updates running
    # stats, which must not leak into the eval golden above
    net.train()
    target = rng.standard_normal(y_train.shape).astype(x.dtype)
    net.zero_grad()
    out = net(xt, torch.from_numpy(tasks_mixed))
    loss = torch.mean((out - torch.from_numpy(target)) ** 2)
    loss.backward()
    grads = {
        name: p.grad.detach().cpu().numpy()
        for name, p in net.named_parameters()
        if p.grad is not None
    }
    return y_train, state_after_train, y_eval, target, float(loss.detach()), grads


def build_net(reference, tasks, mult_chan, torch):
    sys.path.insert(0, reference)
    from fnet.nn_modules.RepMode import Net  # reference model (read-only import)

    opts = types.SimpleNamespace(adopted_datasets=list(tasks), gpu_ids=-1)
    return Net(opts, mult_chan=mult_chan, in_channels=1, out_channels=1)


def gen_small(args, torch, np_dtype):
    torch.manual_seed(0)
    net = build_net(args.reference, ["task0", "task1", "task2"], 2, torch)

    rng = np.random.default_rng(123)
    x = rng.standard_normal((2, 1, 16, 16, 16)).astype(np_dtype)
    tasks_mixed = np.array([0, 2], dtype=np.int64)
    tasks_uniform = np.array([1, 1], dtype=np.int64)

    y_train, sd, y_eval, target, loss, grads = run_reference(
        net, torch, x, tasks_mixed, tasks_uniform, rng
    )

    out = {
        "x": x,
        "tasks_mixed": tasks_mixed,
        "tasks_uniform": tasks_uniform,
        "y_train": y_train,
        "y_eval": y_eval,
        "grad_target": target,
        "grad_loss": np.asarray(loss, np_dtype),
    }
    for k, v in sd.items():
        out["sd." + k] = v
    for k, v in grads.items():
        out["gr." + k] = v

    path = os.path.join(args.out, "repmode_small.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1024:.0f} KiB); "
          f"y_train mean {y_train.mean():.6f}, y_eval mean {y_eval.mean():.6f}")


def gen_full(args, torch, np_dtype):
    """Full topology: synthesized weights, summary gradients (module doc)."""
    assert np_dtype == np.float64, "--full goldens are float64 by design"
    net = build_net(args.reference, REF_TASKS_FULL, 32, torch)

    # deterministic portable weights; spec records every state_dict entry
    params = dict(net.named_parameters())
    spec = []
    for name, t in net.state_dict().items():
        if name in params:
            kind = "param"
        elif name.endswith("running_mean"):
            kind = "zeros"
        elif name.endswith("running_var"):
            kind = "ones"
        else:
            kind = "skip"  # num_batches_tracked, fixed avg-pool buffers
        spec.append([name, list(t.shape), kind])
    with torch.no_grad():
        for name, p in params.items():
            p.copy_(torch.from_numpy(gc.synth_value(name, p.shape, "param")))

    rng = np.random.default_rng(123)
    x = rng.standard_normal((2, 1, 16, 32, 32)).astype(np_dtype)
    tasks_mixed = np.array([3, 10], dtype=np.int64)
    tasks_uniform = np.array([5, 5], dtype=np.int64)

    y_train, sd, y_eval, target, loss, grads = run_reference(
        net, torch, x, tasks_mixed, tasks_uniform, rng
    )

    out = {
        "x": x,
        "tasks_mixed": tasks_mixed,
        "tasks_uniform": tasks_uniform,
        "y_train": y_train,
        "y_eval": y_eval,
        "grad_target": target,
        "grad_loss": np.asarray(loss, np_dtype),
        "pspec_json": np.array(json.dumps(spec)),
        "n_probes": np.asarray(gc.N_PROBES),
    }
    # BN running stats after the train forward (small): the BN-update golden
    for k, v in sd.items():
        if k.endswith("running_mean") or k.endswith("running_var"):
            out["bs." + k] = v
    # gradients: norms + probe projections for every leaf; full tensors for
    # small leaves (gates, BN affine, biases)
    for name, g in grads.items():
        out["gnorm." + name] = np.asarray(np.linalg.norm(g.ravel()), np.float64)
        out["gdot." + name] = np.asarray(
            [float(g.ravel() @ gc.probe(name, g.shape, j).ravel())
             for j in range(gc.N_PROBES)], np.float64)
        if g.size <= gc.SMALL_LEAF_MAX:
            out["gr." + name] = g

    path = os.path.join(args.out, "repmode_full_fp64.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1024:.0f} KiB); "
          f"loss {loss:.8f}, y_train mean {y_train.mean():.6f}, "
          f"y_eval mean {y_eval.mean():.6f}, {len(grads)} grad leaves")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reference", nargs="?", default="/root/reference")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--dtype", default="float64", choices=["float32", "float64"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    args = ap.parse_args()

    import torch

    torch.manual_seed(0)
    os.makedirs(args.out, exist_ok=True)
    np_dtype = np.float64 if args.dtype == "float64" else np.float32
    # set BEFORE constructing the net: the reference creates its one-hot
    # task embedding and avg-pool buffers in the default dtype
    # (RepMode.py:44-49,161-163); in fp64 the buffers hold exact fp64 1/K^3,
    # matching our jnp constants bit-for-bit.
    torch.set_default_dtype(torch.float64 if np_dtype == np.float64
                            else torch.float32)
    if args.full:
        gen_full(args, torch, np_dtype)
    else:
        gen_small(args, torch, np_dtype)


if __name__ == "__main__":
    main()
