"""Immutable experiment configuration.

Replaces the reference's argparse namespace threaded through every layer
(/root/reference/config.py:4-82, consumed at main.py:25 and downward). Unlike
the reference — where `opts` is a mutable Namespace that is pickled wholesale
into checkpoints (fnet/fnet_model.py:60) — the config here is a frozen,
hashable dataclass with a JSON round-trip, so it can be closed over by jitted
functions and embedded in checkpoints as plain data.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

# Default 12-task list (reference config.py:10-27). Kept sorted, matching the
# reference's `opts.adopted_datasets.sort()` at main.py:117 — task id == index
# into this sorted tuple.
DEFAULT_DATASETS: Tuple[str, ...] = (
    "alpha_tubulin",
    "beta_actin",
    "desmoplakin",
    "dna",
    "fibrillarin",
    "lamin_b1",
    "membrane_caax_63x",
    "myosin_iib",
    "sec61_beta",
    "st6gal1",
    "tom20",
    "zo1",
)


@dataclass(frozen=True)
class ModelConfig:
    """MoDE U-Net hyperparameters (reference fnet/nn_modules/RepMode.py:8-42)."""

    name: str = "RepMode"
    mult_chan: int = 32          # RepMode.py:12
    in_channels: int = 1
    out_channels: int = 1
    num_experts: int = 5         # RepMode.py:22
    depth: int = 4               # 4 encoder + 4 decoder blocks (RepMode.py:27-39)
    kernel_size: int = 5         # MoDE merged kernel size (RepMode.py:42,114-115)
    # 'auto'         : 'merged_pallas' on TPU, 'expert_sum' elsewhere
    # 'expert_sum'   : 5 full-batch convs + gated combine (exact by linearity
    #                  of conv, MXU-friendly, no grouped conv; CPU/test path)
    # 'merged_pallas': per-sample gate-merged kernel via the Pallas
    #                  per-sample-weight kernels (ops/pallas/conv3d.py) —
    #                  the reference's routing() merge (RepMode.py:171-208)
    #                  at 45 s2d taps vs the expert sum's 145 in forward AND
    #                  both backward contractions; measured train step
    #                  642 -> 366 ms at full scale (ARCHITECTURE.md §11)
    # 'merged'       : per-sample merged 5^3 kernel via vmapped conv
    #                  (the literal translation of RepMode.py:204-208; XLA
    #                  grouped-conv lowering, measured 2x slower — kept as
    #                  the record)
    # auto-selected 'single' path when the batch is task-uniform (eval,
    # RepMode.py:210 semantics).
    train_impl: str = "auto"
    # run narrow-channel levels in the space-to-depth domain during training
    # (ops/s2d.py; exact, differentiable). Required to fit full-scale
    # training in 16GB HBM (native C=32 layouts pad 4x) and ~3x faster convs.
    train_s2d: bool = True
    # rematerialize MoDE conv internals in the backward pass (jax.checkpoint).
    # With s2d + custom-VJP pools + bf16 residuals the full-scale batch-8
    # step fits without remat (1136 ms vs 1496 ms with); enable for larger
    # batches/patches.
    remat: bool = False
    bn_momentum: float = 0.1     # torch BatchNorm3d default
    bn_eps: float = 1e-5


@dataclass(frozen=True)
class TrainConfig:
    """Training recipe (reference config.py:31-35, scripts/run/train_and_eval.sh:10-13)."""

    num_epochs: int = 1000
    batch_size: int = 8
    batch_size_eval: int = 8
    lr: float = 1e-4
    seed: int = 0
    # bf16 compute / fp32 params+accum replaces CUDA AMP (fnet_model.py:104-113);
    # TPUs need no loss scaling.
    compute_dtype: str = "bfloat16"
    patch_size: Tuple[int, int, int] = (32, 128, 128)  # fnet_model.py:34
    random_flip_prob: float = 0.5                       # SSPdataset.py:27
    interval_val: int = 20                              # config.py:61
    epoch_checkpoint: Tuple[int, ...] = ()              # config.py:57
    interval_checkpoint: Optional[int] = None           # config.py:58
    # Per-host data parallelism; 1 = single chip.
    num_devices: int = 1
    # sample training patches on-device from an HBM-resident volume bank
    # (data/device_sampler.py): zero host work per step, same sampling law
    # as the host path (once-per-volume permutation epochs, padded tail).
    # None = auto: on when the padded bank fits the HBM budget below.
    on_device_pipeline: Optional[bool] = None
    # max bank bytes for the auto decision (v5e has 16 GB; leave room for
    # params, optimizer state, and activations)
    device_bank_budget_bytes: int = 4 * 1024**3


@dataclass(frozen=True)
class EvalConfig:
    """Sliding-window inference protocol (reference fnet_model.py:149-223)."""

    patch_size: Tuple[int, int, int] = (32, 128, 128)
    overlap: float = 0.5            # fnet_model.py:157
    gaussian_sigma_scale: float = 1 / 8  # fnet_model.py:242
    save_test_preds: bool = False
    save_test_signals_and_targets: bool = False
    # space-to-depth execution of narrow-channel levels (exact; ~2x on v5e)
    s2d: bool = True
    # 'fused' = one program per volume; 'two_phase' = forward-all then stitch
    # (decoupled layouts; shardable patch grid)
    predictor: str = "fused"
    # hand-written double-buffered Pallas kernel for the s2d-domain convs
    # (ops/pallas/conv3d.py; measured ~12% over XLA on v5e, bit-exact).
    pallas_conv: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Dataset construction (reference fnet/data/SSPdataset.py:15-100)."""

    adopted_datasets: Tuple[str, ...] = DEFAULT_DATASETS
    path_dataset_csv: str = "data/csvs"
    path_dataset_czi: str = "data"
    path_load_dataset: Optional[str] = None
    path_save_dataset: Optional[str] = None
    # XY rescale factor 0.108 -> 0.29 um/px (SSPdataset.py:22-25)
    resize_factors: Tuple[float, float, float] = (1.0, 0.37241, 0.37241)
    num_workers: int = 4


@dataclass(frozen=True)
class Config:
    """Top-level experiment config."""

    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    data: DataConfig = field(default_factory=DataConfig)
    path_exp_dir: Optional[str] = None
    path_load_model: Optional[str] = None
    exp_name: str = "exp"
    run_name: Optional[str] = None
    tags: Tuple[str, ...] = ()
    debugging: bool = False
    monitor_model: bool = False

    # ---- derived ----
    @property
    def num_tasks(self) -> int:
        return len(self.data.adopted_datasets)

    def task_index(self, dataset_name: str) -> int:
        return self.data.adopted_datasets.index(dataset_name)

    # ---- JSON round-trip (replaces main.py:107-108 json.dump(vars(opts))) ----
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def _build(klass, sub):
            kwargs = {}
            for f in dataclasses.fields(klass):
                if f.name not in sub:
                    continue
                v = sub[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "model", "train", "eval", "data",
                ):
                    kwargs[f.name] = _build(_SUBTYPES[f.name], v)
                elif isinstance(v, list):
                    kwargs[f.name] = tuple(v)
                else:
                    kwargs[f.name] = v
            return klass(**kwargs)

        return _build(cls, d)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


_SUBTYPES = {
    "model": ModelConfig,
    "train": TrainConfig,
    "eval": EvalConfig,
    "data": DataConfig,
}


def expanded_checkpoint_epochs(cfg: Config) -> Tuple[int, ...]:
    """Expand interval_checkpoint into explicit epochs (reference main.py:75-77)."""
    epochs = list(cfg.train.epoch_checkpoint)
    if cfg.train.interval_checkpoint is not None:
        times = int(cfg.train.num_epochs / cfg.train.interval_checkpoint)
        epochs.extend((i + 1) * cfg.train.interval_checkpoint for i in range(times))
    return tuple(epochs)
