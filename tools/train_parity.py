"""Trained-accuracy parity: reference vs repmode_tpu, same data, same recipe.

The north star (BASELINE.json) demands per-task MSE parity within 1%. This
tool demonstrates it end-to-end (VERDICT r1 item #3): train the ACTUAL
PyTorch reference net (/root/reference, read-only import) and repmode_tpu
from IDENTICAL initial weights on an IDENTICAL synthetic corpus with the
identical recipe — Adam(lr=1e-4), MSE, BN momentum 0.1 (fnet_model.py:55,
:108-113) — fp32 on CPU (the reference's AMP is CUDA-only; fp32 is the
controlled comparison), and compare training curves + final per-task val MSE.

The synthetic task is learnable and task-conditioned (target_t = a_t *
boxblur3(signal) + b_t * signal), so gating, experts, and BN all have to
train for the loss to drop.

Writes PARITY_TRAINING.json; tools/../PARITY_TRAINING.md narrates the result.

Usage: python tools/train_parity.py [--steps 300] [--mult-chan 2]
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
# Per-task target coefficients (target_t = a_t*boxblur3(signal) + b_t*signal),
# distinct per task so the gate/expert structure must specialize. The first 3
# rows reproduce the round-2 run exactly; --num-tasks extends up to 12
# (the reference recipe's task count, main.py:117).
TASK_A_ALL = [1.0, -0.7, 0.4, 0.9, -0.5, 0.6, -0.8, 0.3, 0.7, -0.4, 0.5, -0.9]
TASK_B_ALL = [0.0, 0.5, -0.6, -0.3, 0.7, -0.2, 0.4, -0.8, 0.2, 0.6, -0.5, 0.3]
TASKS = ["t0", "t1", "t2"]
TASK_A = TASK_A_ALL[:3]
TASK_B = TASK_B_ALL[:3]
PATCH = (16, 16, 16)


def set_num_tasks(n):
    global TASKS, TASK_A, TASK_B
    assert 1 <= n <= len(TASK_A_ALL)
    TASKS = [f"t{i}" for i in range(n)]
    TASK_A = TASK_A_ALL[:n]
    TASK_B = TASK_B_ALL[:n]


def boxblur3(x):
    """3^3 mean filter, zero 'same' padding (separable shifted adds)."""
    out = np.zeros_like(x)
    for axis in range(x.ndim - 3, x.ndim):
        out[...] = 0.0
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 1)
        xp = np.pad(x, pad)
        n = x.shape[axis]
        sl = [slice(None)] * x.ndim
        for i in range(3):
            sl[axis] = slice(i, i + n)
            out += xp[tuple(sl)]
        x = out / 3.0
    return x


def make_batches(steps, batch, seed=0):
    """Pre-generated batches, fed IDENTICALLY to both frameworks (NCDHW)."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        sig = rng.standard_normal((batch, 1) + PATCH).astype(np.float32)
        sig = boxblur3(sig)  # smooth-ish input, like real microscopy
        task = rng.integers(0, len(TASKS), batch).astype(np.int64)
        a = np.asarray(TASK_A, np.float32)[task][:, None, None, None, None]
        b = np.asarray(TASK_B, np.float32)[task][:, None, None, None, None]
        tgt = (a * boxblur3(sig) + b * sig).astype(np.float32)
        batches.append((sig, tgt, task))
    return batches


def train_reference(batches, val, mult_chan, lr, perturb_ulp=False,
                    perturb_index=0):
    sys.modules.setdefault("wandb", types.SimpleNamespace(
        log=lambda *a, **k: None))
    sys.path.insert(0, REFERENCE)
    import torch

    from fnet.nn_modules.RepMode import Net

    torch.manual_seed(0)
    opts = types.SimpleNamespace(adopted_datasets=TASKS, gpu_ids=-1)
    net = Net(opts, mult_chan=mult_chan, in_channels=1, out_channels=1)
    if perturb_ulp:
        # flip ONE weight by one ulp: a perturbation ~1e-7 relative, far
        # below any legitimate framework difference. The divergence this
        # seeds over the chaotic SGD trajectory is the reference's own
        # parity floor (see --noise-floor). perturb_index selects WHICH
        # weight flips, giving independent floor samples per seed.
        with torch.no_grad():
            p = next(net.parameters())
            flat = p.view(-1)
            i = perturb_index % flat.numel()
            flat[i] = float(np.nextafter(float(flat[i]), np.inf,
                                         dtype=np.float32))
    init_sd = {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}
    optim = torch.optim.Adam(net.parameters(), lr=lr)  # fnet_model.py:55

    losses = []
    net.train()
    for sig, tgt, task in batches:
        optim.zero_grad()
        out = net(torch.from_numpy(sig), torch.from_numpy(task))
        loss = torch.mean((out - torch.from_numpy(tgt)) ** 2)
        loss.backward()
        optim.step()
        losses.append(float(loss.detach()))

    net.eval()
    per_task = {}
    with torch.no_grad():
        for sig, tgt, task in val:
            out = net(torch.from_numpy(sig), torch.from_numpy(task))
            mse = float(torch.mean((out - torch.from_numpy(tgt)) ** 2))
            per_task[TASKS[int(task[0])]] = mse
    return init_sd, losses, per_task


def train_ours(batches, val, init_sd, mult_chan, lr, device="cpu"):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # device == "tpu": leave the default backend (the real chip). fp32
    # matmuls/convs on TPU default to one-pass bf16 MXU execution, which
    # would inject ~1e-3 per-op noise into the controlled comparison —
    # force the 'highest' (fp32-accurate multi-pass) lowering for parity.
    jax.config.update("jax_default_matmul_precision", "highest")
    sys.path.insert(0, REPO)
    import jax.numpy as jnp

    from repmode_tpu.compat.torch_import import convert_state_dict
    from repmode_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from repmode_tpu.train.state import create_train_state, make_optimizer
    from repmode_tpu.train.step import make_eval_loss_step, make_train_step

    cfg = Config(
        # train_impl pinned to the exact expert sum: the controlled fp32
        # comparison wants XLA's fp32 conv semantics under 'highest'
        # precision on every backend (the merged-Pallas path is the bf16
        # production lowering; its equality to expert_sum is separately
        # property-tested in tests/test_pallas_kernels.py)
        model=ModelConfig(mult_chan=mult_chan, depth=4,
                          train_impl="expert_sum"),
        data=DataConfig(adopted_datasets=tuple(TASKS)),
        train=TrainConfig(lr=lr, compute_dtype="float32",
                          patch_size=PATCH, batch_size=batches[0][0].shape[0]),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    variables = jax.tree.map(jnp.asarray, convert_state_dict(init_sd))
    state = state.replace(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=make_optimizer(cfg).init(variables["params"]),
    )
    step = make_train_step(cfg, donate=False)
    eval_step = make_eval_loss_step(cfg)

    def to_batch(sig, tgt, task):
        return {
            "signal": jnp.asarray(np.transpose(sig, (0, 2, 3, 4, 1))),
            "target": jnp.asarray(np.transpose(tgt, (0, 2, 3, 4, 1))),
            "task": jnp.asarray(task.astype(np.int32)),
        }

    losses = []
    for sig, tgt, task in batches:
        state, metrics = step(state, to_batch(sig, tgt, task))
        losses.append(float(metrics["loss"]))

    per_task = {}
    for sig, tgt, task in val:
        mse = float(eval_step(state, to_batch(sig, tgt, task)))
        per_task[TASKS[int(task[0])]] = mse
    return losses, per_task


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mult-chan", type=int, default=2)
    ap.add_argument("--num-tasks", type=int, default=3,
                    help="tasks in the synthetic corpus (<=12; 3 reproduces "
                         "the round-2 run)")
    ap.add_argument("--floor-seeds", type=int, default=1,
                    help="independent one-ulp perturbation arms for the "
                         "chaos-floor estimate (each flips a different "
                         "weight); >=3 gives a spread, not a point")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--device", choices=("cpu", "tpu"), default="cpu",
                    help="where OUR side trains (the torch reference always "
                         "runs CPU here — no CUDA in this environment). "
                         "'tpu' exercises the real shipping hardware path "
                         "with 'highest' matmul precision; the chaos-floor "
                         "yardstick absorbs the cross-ISA fp differences.")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_TRAINING.json"))
    ap.add_argument("--noise-floor", action="store_true",
                    help="also train the reference a second time from an "
                         "init with ONE weight flipped by one ulp (~1e-7 "
                         "relative) — identical data and recipe. The "
                         "resulting ref-vs-ref val-MSE spread is the "
                         "reference's own chaos floor, the fair yardstick "
                         "for ours-vs-ref. (A torch rerun with different "
                         "thread counts on this 1-core box is bit-identical "
                         "— verified 0.0 — so the ulp flip is the minimal "
                         "real perturbation.)")
    ap.add_argument("--floor-only", action="store_true",
                    help="only run the ulp-perturbed reference arm and merge "
                         "the floor into an existing --out JSON (the base "
                         "reference run is deterministic; its stored MSEs "
                         "are exact).")
    ap.add_argument("--floor-start", type=int, default=0,
                    help="with --floor-only: first perturb_index to run; "
                         "new samples are APPENDED to the samples already "
                         "in --out (each index is a distinct weight flip, "
                         "so arms from previous runs stay valid — they are "
                         "bit-deterministic on this box).")
    args = ap.parse_args()
    set_num_tasks(args.num_tasks)

    batches = make_batches(args.steps, args.batch, seed=0)
    # task-uniform val batches (one per task), never trained on
    rngv = np.random.default_rng(999)
    val = []
    for t in range(len(TASKS)):
        sig = boxblur3(rngv.standard_normal((8, 1) + PATCH).astype(np.float32))
        task = np.full((8,), t, np.int64)
        tgt = (TASK_A[t] * boxblur3(sig) + TASK_B[t] * sig).astype(np.float32)
        val.append((sig, tgt, task))

    def run_floor_arms(ref_val, start=0):
        """>=1 independently perturbed reference retrains; per-seed floors."""
        samples = []
        per_task_all = []
        for s in range(start, start + args.floor_seeds):
            _, _, ref_val2 = train_reference(
                batches, val, args.mult_chan, args.lr,
                perturb_ulp=True, perturb_index=s)
            ft = {t: abs(ref_val2[t] - ref_val[t]) / ref_val[t]
                  for t in ref_val}
            per_task_all.append(ft)
            samples.append(max(ft.values()))
            print(json.dumps({"floor_seed": s, "floor_max_rel": samples[-1]}),
                  flush=True)
        return samples, per_task_all

    def merge_floor(rec, samples, per_task_all):
        rec["reference_noise_floor_rel_diff_per_task"] = per_task_all[0]
        rec["noise_floor_samples_max_rel"] = samples
        rec["reference_noise_floor_max"] = max(samples)
        rec["reference_noise_floor_min"] = min(samples)
        rec["reference_noise_floor_mean"] = float(np.mean(samples))
        rec["noise_floor_method"] = (
            f"{len(samples)} independent reference retrains, each from an "
            "init with a DIFFERENT single weight flipped by one ulp "
            "(~1e-7 relative); identical data/recipe. The spread of per-seed "
            "max rel val-MSE diffs is the chaos-floor distribution."
        )
        rec["parity_within_noise_floor"] = bool(
            rec["max_val_mse_rel_diff"] <= max(samples)
        )

    if args.floor_only:
        with open(args.out) as f:
            rec = json.load(f)
        assert rec["steps"] == args.steps and rec["mult_chan"] == args.mult_chan
        ref_val = rec["reference_val_mse_per_task"]
        samples, per_task_all = run_floor_arms(ref_val, args.floor_start)
        if args.floor_start:
            prior = rec.get("noise_floor_samples_max_rel", [])
            assert len(prior) == args.floor_start, (
                "floor-start must equal the number of samples already "
                "recorded", len(prior), args.floor_start)
            samples = prior + samples
            pt0 = rec.get("reference_noise_floor_rel_diff_per_task")
            per_task_all = ([pt0] if pt0 else []) + per_task_all
        merge_floor(rec, samples, per_task_all)
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
        print(json.dumps({k: rec[k] for k in (
            "max_val_mse_rel_diff", "noise_floor_samples_max_rel",
            "reference_noise_floor_max", "parity_within_noise_floor")},
            indent=2))
        return

    t0 = time.time()
    init_sd, ref_losses, ref_val = train_reference(
        batches, val, args.mult_chan, args.lr)
    t_ref = time.time() - t0

    floor_samples = None
    floor_per_task = None
    if args.noise_floor:
        floor_samples, floor_per_task = run_floor_arms(ref_val)

    t0 = time.time()
    our_losses, our_val = train_ours(batches, val, init_sd,
                                     args.mult_chan, args.lr,
                                     device=args.device)
    t_ours = time.time() - t0

    rel = {
        t: abs(our_val[t] - ref_val[t]) / ref_val[t] for t in ref_val
    }
    rec = {
        "steps": args.steps,
        "batch": args.batch,
        "mult_chan": args.mult_chan,
        "num_tasks": len(TASKS),
        "lr": args.lr,
        "recipe": "Adam(lr), MSE, BN momentum 0.1, fp32, identical init + "
                  "batches (reference fnet_model.py:55,104-113 minus "
                  "CUDA-only AMP)",
        "ours_device": args.device,
        "reference_final_train_loss": ref_losses[-1],
        "ours_final_train_loss": our_losses[-1],
        "reference_val_mse_per_task": ref_val,
        "ours_val_mse_per_task": our_val,
        "val_mse_rel_diff_per_task": rel,
        "max_val_mse_rel_diff": max(rel.values()),
        "within_1pct": bool(max(rel.values()) < 0.01),
        "loss_first10_reference": ref_losses[:10],
        "loss_first10_ours": our_losses[:10],
        "loss_curve_reference": ref_losses[:: max(1, args.steps // 100)],
        "loss_curve_ours": our_losses[:: max(1, args.steps // 100)],
        "train_seconds": {"reference": round(t_ref, 1),
                          "ours_incl_compile": round(t_ours, 1)},
    }
    if floor_samples is not None:
        merge_floor(rec, floor_samples, floor_per_task)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({k: rec[k] for k in (
        "reference_final_train_loss", "ours_final_train_loss",
        "reference_val_mse_per_task", "ours_val_mse_per_task",
        "max_val_mse_rel_diff", "within_1pct")}, indent=2))


if __name__ == "__main__":
    main()
