from repmode_tpu.data.store import VolumeRecord, VolumeStore
from repmode_tpu.data.sampler import PatchSampler
from repmode_tpu.data.synthetic import synthetic_store

__all__ = ["VolumeRecord", "VolumeStore", "PatchSampler", "synthetic_store"]
