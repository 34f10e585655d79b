from repmode_tpu.ops.conv3d import (
    conv3d_same,
    downsample2x_conv,
    upsample2x_convt,
    avg_pool_same,
)
from repmode_tpu.ops.mode import (
    ExpertKernels,
    gate_logits_to_weights,
    merge_kernels,
    mode_conv_expert_sum,
    mode_conv_merged,
    mode_conv_single,
)
from repmode_tpu.ops.norm import batch_norm_apply, batch_norm_train
from repmode_tpu.ops.gaussian import gaussian_importance_map

__all__ = [
    "conv3d_same",
    "downsample2x_conv",
    "upsample2x_convt",
    "avg_pool_same",
    "ExpertKernels",
    "gate_logits_to_weights",
    "merge_kernels",
    "mode_conv_expert_sum",
    "mode_conv_merged",
    "mode_conv_single",
    "batch_norm_apply",
    "batch_norm_train",
    "gaussian_importance_map",
]
