from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_same
from repmode_tpu.ops.pallas.merge import pallas_merge_kernels

__all__ = ["pallas_conv3d_same", "pallas_merge_kernels"]
