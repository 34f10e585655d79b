"""Model zoo registry.

Replaces the reference's importlib-by-name loading
(fnet/fnet_model.py:52: importlib.import_module('fnet.nn_modules.' + name).Net).
Models register under a string name; `build_model(cfg)` instantiates by
cfg.model.name so checkpoints can carry the architecture identity.
"""

from __future__ import annotations

from typing import Callable, Dict

from repmode_tpu.config import Config

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def build_model(cfg: Config):
    name = cfg.model.name
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg)


def available_models():
    return sorted(_REGISTRY)


from repmode_tpu.models.repmode import RepModeNet  # noqa: E402
from repmode_tpu.models.unet import UNet3D  # noqa: E402


@register_model("RepMode")
def _build_repmode(cfg: Config) -> RepModeNet:
    return RepModeNet(
        cfg=cfg.model,
        num_tasks=cfg.num_tasks,
        compute_dtype=cfg.train.compute_dtype,
    )


@register_model("UNet")
def _build_unet(cfg: Config) -> UNet3D:
    return UNet3D(
        cfg=cfg.model,
        num_tasks=cfg.num_tasks,
        compute_dtype=cfg.train.compute_dtype,
    )


__all__ = [
    "register_model",
    "build_model",
    "available_models",
    "RepModeNet",
    "UNet3D",
]
