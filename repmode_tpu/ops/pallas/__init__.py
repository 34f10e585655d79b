from repmode_tpu.ops.pallas.conv3d import pallas_conv3d_dpad, pallas_conv3d_same

__all__ = ["pallas_conv3d_dpad", "pallas_conv3d_same"]
