"""repmode_tpu — TPU-native framework for subcellular structure prediction (SSP).

A ground-up JAX/XLA/Pallas rebuild of the capabilities of RepMode
(Correr-Zhou/RepMode, CVPR 2023): 3D transmitted-light -> fluorescence
prediction across 12 partially-labeled tasks with a Mixture-of-Diverse-Experts
(MoDE) U-Net that is structurally re-parameterized into plain per-task convs
for inference.

Layering (see SURVEY.md section 7):
  config   -- immutable dataclass config (replaces reference config.py argparse opts)
  ops      -- conv/MoDE/norm/gaussian primitives (NDHWC, MXU-friendly)
  models   -- the MoDE U-Net (flax.linen) + reparameterized inference net
  data     -- volume store, patch sampling, offline CZI ingest, synthetic data
  train    -- jitted train/eval steps, epoch loop, bf16 policy
  infer    -- on-device sliding-window tiled inference with Gaussian stitching
  metrics  -- MSE/MAE/R2 + per-task aggregation
  parallel -- device mesh + data-parallel sharding (ICI allreduce via XLA)
  ckpt     -- orbax checkpointing (params/opt_state/step/epoch/config)
  compat   -- torch reference checkpoint import
  cli      -- train / eval / make-dataset entry points
"""

from repmode_tpu.version import __version__

# Convenience top-level API (lazy-import-free essentials)
from repmode_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig

__all__ = [
    "__version__",
    "Config",
    "ModelConfig",
    "TrainConfig",
    "EvalConfig",
    "DataConfig",
]
