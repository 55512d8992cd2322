"""Mixed-precision quantization policy: per-site exclusion patterns.

The reference never runs pure INT8: it builds every int8 engine with BOTH
the INT8 and FP16 builder flags set (det2trt/convert/onnx2tensorrt.py:49-54),
so TensorRT keeps quantization-sensitive layers in fp16 per-layer.  This
module is the TPU-native equivalent with the selection made explicit: a
tuple of path patterns names the sites that stay in the compute dtype
(bf16/fp32) while everything else quantizes.

A "site" is a flax module path, e.g.
    pts_bbox_head/transformer/decoder/layers_0/attentions_0/q_proj
plus two pseudo-leaves for non-Dense quantization decisions:
    .../msda_tables   — int8-quad value-table packing in the sorted MSDA kernel
    .../flash         — int8 flash-MHA kernel selection

A pattern excludes a site if it is a substring of the '/'-joined path or an
fnmatch glob match.  The policy is part of the model config
(BEVFormerConfig.quant_exclude) and is published to this module at trace
time by the detectors' __call__ (the config is a module field, so a policy
change retraces under jit).  Calibration artifacts persist the policy next
to the scales (tools/bevformer/calibrate.py --exclude) so deployments pick
it up automatically.
"""
from __future__ import annotations

import fnmatch
from typing import Sequence, Tuple

_EXCLUDE: Tuple[str, ...] = ()


def set_quant_exclude(patterns: Sequence[str]) -> None:
    """Publish the active exclusion patterns (trace-time channel; the source
    of truth is the model config)."""
    global _EXCLUDE
    _EXCLUDE = tuple(patterns or ())


def get_quant_exclude() -> Tuple[str, ...]:
    return _EXCLUDE


def quant_excluded(path: Sequence[str]) -> bool:
    """True if the '/'-joined module path matches any active pattern."""
    if not _EXCLUDE:
        return False
    p = "/".join(path)
    return any(pat in p or fnmatch.fnmatch(p, pat) for pat in _EXCLUDE)


def effective_quant(quant, path: Sequence[str]):
    """Resolve a module's quant mode under the active policy: excluded sites
    run plain fp (the per-layer fp16 fallback of the reference's dual-flag
    int8 builds)."""
    if quant and quant_excluded(path):
        return False
    return quant


def _policy_path(artifact_path) -> str:
    return str(artifact_path) + ".policy.json"


def save_policy(artifact_path, exclude: Sequence[str] = (), **meta) -> None:
    """Persist the mixed-precision policy as a sidecar next to a scale-dict
    artifact (the analogue of the per-layer precision choices TensorRT bakes
    into an int8+fp16 engine)."""
    import json

    with open(_policy_path(artifact_path), "w") as f:
        json.dump({"exclude": list(exclude), **meta}, f)


def load_policy(artifact_path) -> Tuple[str, ...]:
    """Load the exclusion patterns persisted next to a scale-dict artifact;
    empty when no sidecar exists (pure-int8 artifact)."""
    import json
    import os

    p = _policy_path(artifact_path)
    if not os.path.exists(p):
        return ()
    with open(p) as f:
        return tuple(json.load(f).get("exclude", ()))
