"""Generate golden parity tensors from the PyTorch reference (run once, offline).

Runs the reference RepMode net (/root/reference, imported read-only at tool
time — never vendored) on a tiny config and dumps its state_dict, inputs, and
outputs to tests/goldens/repmode_small.npz. Tests then assert our TPU-native
net reproduces these numbers without needing the reference present.

Usage: python tools/gen_goldens.py [reference_path]
"""

import argparse
import os
import sys
import types

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reference", nargs="?", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "tests", "goldens"))
    args = ap.parse_args()

    import torch

    torch.manual_seed(0)
    sys.path.insert(0, args.reference)
    from fnet.nn_modules.RepMode import Net  # reference model (read-only import)

    opts = types.SimpleNamespace(
        adopted_datasets=["task0", "task1", "task2"],
        gpu_ids=-1,
    )
    net = Net(opts, mult_chan=2, in_channels=1, out_channels=1)
    net = net.float()

    rng = np.random.default_rng(123)
    x = rng.standard_normal((2, 1, 16, 16, 16)).astype(np.float32)
    tasks_mixed = np.array([0, 2], dtype=np.int64)
    tasks_uniform = np.array([1, 1], dtype=np.int64)

    xt = torch.from_numpy(x)

    # train-mode forward (batch-stats BN, per-sample merged kernels)
    net.train()
    with torch.no_grad():
        y_train = net(xt, torch.from_numpy(tasks_mixed)).numpy()
    # capture running stats AFTER the train forward (they were updated)
    state_after_train = {
        k: v.detach().cpu().numpy().copy() for k, v in net.state_dict().items()
    }  # .copy(): .numpy() views share storage with buffers the later grad pass mutates

    # eval-mode forward (running-stats BN, single merged kernel, uniform task)
    net.eval()
    with torch.no_grad():
        y_eval = net(xt, torch.from_numpy(tasks_uniform)).numpy()

    # gradient golden LAST: the train-mode grad forward updates running
    # stats, which must not leak into the eval golden above
    net.train()
    target = rng.standard_normal(y_train.shape).astype(np.float32)
    net.zero_grad()
    out = net(xt, torch.from_numpy(tasks_mixed))
    loss = torch.mean((out - torch.from_numpy(target)) ** 2)
    loss.backward()
    grads = {
        name: p.grad.detach().cpu().numpy()
        for name, p in net.named_parameters()
        if p.grad is not None
    }
    loss_value = float(loss.detach())

    out = {
        "x": x,
        "tasks_mixed": tasks_mixed,
        "tasks_uniform": tasks_uniform,
        "y_train": y_train,
        "y_eval": y_eval,
        "grad_target": target,
        "grad_loss": np.float32(loss_value),
    }
    for k, v in state_after_train.items():
        out["sd." + k] = v
    for k, v in grads.items():
        out["gr." + k] = v

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "repmode_small.npz")
    np.savez_compressed(path, **out)
    size = os.path.getsize(path) / 1024
    print(f"wrote {path} ({size:.0f} KiB); y_train mean {y_train.mean():.6f}, "
          f"y_eval mean {y_eval.mean():.6f}")


if __name__ == "__main__":
    main()
