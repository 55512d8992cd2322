"""Checkpoint artifacts: params + frozen stats + quantization scale-dicts.

The reference's deployment artifact cascade is
`checkpoints/pytorch/*.pth -> onnx/*.onnx -> tensorrt/*.trt`
(configs/_base_/det2trt.py:1-3).  The TPU-native equivalent collapses to ONE
artifact: a msgpack checkpoint holding {params, batch_stats, quant_scales}
plus the JAX persistent compilation cache standing in for the serialized
engine plan (SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def save_checkpoint(path: str | pathlib.Path, variables: Dict[str, Any]) -> None:
    """variables: flax collections dict ({'params': ..., 'batch_stats': ...,
    'quant': ...})."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x), variables)
    path.write_bytes(flax.serialization.msgpack_serialize(host))


def load_checkpoint(path: str | pathlib.Path, template: Optional[Dict[str, Any]] = None):
    """Returns the collections dict; if `template` is given, restores into its
    exact pytree structure (validating shapes)."""
    raw = pathlib.Path(path).read_bytes()
    state = flax.serialization.msgpack_restore(raw)
    if template is not None:
        state = flax.serialization.from_state_dict(template, state)
    return state


def torch_resnet_to_flax(state_dict, depth: int = 50) -> Dict[str, Any]:
    """Import torchvision ResNet weights into the flax ResNet param layout
    (the reference initializes from torchvision checkpoints:
    configs/bevdet/bevdet-r50-cbgs.py:82).  Returns {'params', 'batch_stats'}
    subtrees for the `img_backbone` module."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO

    params["stem_conv"] = {"kernel": conv(state_dict["conv1.weight"])}
    params["stem_bn"] = {
        "scale": np.asarray(state_dict["bn1.weight"]),
        "bias": np.asarray(state_dict["bn1.bias"]),
    }
    stats["stem_bn"] = {
        "mean": np.asarray(state_dict["bn1.running_mean"]),
        "var": np.asarray(state_dict["bn1.running_var"]),
    }
    from ..models.backbones.resnet import STAGE_BLOCKS, BASIC_DEPTHS

    blocks = STAGE_BLOCKS[depth]
    ncv = 2 if depth in BASIC_DEPTHS else 3
    for stage in range(4):
        for b in range(blocks[stage]):
            src = f"layer{stage + 1}.{b}"
            dst = f"stage{stage}_block{b}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for ci in range(1, ncv + 1):
                p[f"conv{ci}"] = {"kernel": conv(state_dict[f"{src}.conv{ci}.weight"])}
                p[f"bn{ci}"] = {
                    "scale": np.asarray(state_dict[f"{src}.bn{ci}.weight"]),
                    "bias": np.asarray(state_dict[f"{src}.bn{ci}.bias"]),
                }
                s[f"bn{ci}"] = {
                    "mean": np.asarray(state_dict[f"{src}.bn{ci}.running_mean"]),
                    "var": np.asarray(state_dict[f"{src}.bn{ci}.running_var"]),
                }
            if f"{src}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = {"kernel": conv(state_dict[f"{src}.downsample.0.weight"])}
                p["downsample_bn"] = {
                    "scale": np.asarray(state_dict[f"{src}.downsample.1.weight"]),
                    "bias": np.asarray(state_dict[f"{src}.downsample.1.bias"]),
                }
                s["downsample_bn"] = {
                    "mean": np.asarray(state_dict[f"{src}.downsample.1.running_mean"]),
                    "var": np.asarray(state_dict[f"{src}.downsample.1.running_var"]),
                }
            params[dst] = p
            stats[dst] = s
    return {"params": params, "batch_stats": stats}
