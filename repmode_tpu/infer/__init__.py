from repmode_tpu.infer.tiling import compute_patch_starts
from repmode_tpu.infer.predict import TiledPredictor

__all__ = ["compute_patch_starts", "TiledPredictor"]
