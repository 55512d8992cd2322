"""Model registry: name -> (config factory, model class).

Functional replacement for the reference's mmcv registries
(det2trt/models/utils/register.py TRT_FUNCTIONS / registry side-effects):
configs are typed factories, models are flax classes, and this table is the
single string-keyed entry point the CLI tools share.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

from .configs import bevformer as _bevformer
from .configs.bevdet import bevdet_micro, bevdet_r50
from .configs.centernet import centernet_micro, centernet_r18
from .configs.yolox import yolox_micro, yolox_s, yolox_x


def _lazy(module_path: str, cls: str) -> Callable[[], Any]:
    def get():
        import importlib

        return getattr(importlib.import_module(module_path, __package__), cls)

    return get


MODELS: Dict[str, Tuple[Callable, Callable[[], Any]]] = {
    "bevformer_tiny": (_bevformer.bevformer_tiny, _lazy(".models.detectors.bevformer", "BEVFormer")),
    "bevformer_small": (_bevformer.bevformer_small, _lazy(".models.detectors.bevformer", "BEVFormer")),
    "bevformer_base": (_bevformer.bevformer_base, _lazy(".models.detectors.bevformer", "BEVFormer")),
    "bevformer_micro": (_bevformer.bevformer_micro, _lazy(".models.detectors.bevformer", "BEVFormer")),
    "bevdet_r50": (bevdet_r50, _lazy(".models.detectors.bevdet", "BEVDet")),
    "bevdet_micro": (bevdet_micro, _lazy(".models.detectors.bevdet", "BEVDet")),
    "yolox_x": (yolox_x, _lazy(".models.detectors.yolox", "YOLOX")),
    "yolox_s": (yolox_s, _lazy(".models.detectors.yolox", "YOLOX")),
    "yolox_micro": (yolox_micro, _lazy(".models.detectors.yolox", "YOLOX")),
    "centernet_r18": (centernet_r18, _lazy(".models.detectors.centernet", "CenterNet")),
    "centernet_micro": (centernet_micro, _lazy(".models.detectors.centernet", "CenterNet")),
}


def build_model(name: str, **overrides):
    """Returns (model, cfg) for a registered name."""
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(MODELS)}")
    cfg_fn, cls_fn = MODELS[name]
    cfg = cfg_fn(**overrides)
    return cls_fn()(cfg), cfg
