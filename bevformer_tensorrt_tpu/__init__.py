"""bevformer_tensorrt_tpu — a TPU-native quantized-inference framework for
camera-based BEV 3D detection (BEVFormer tiny/small/base, BEVDet) and 2D
detection (YOLOX, CenterNet).

Capability-parity rebuild of DerryHub/BEVFormer_tensorrt, redesigned for
TPU: JAX/XLA for the graph, Pallas for the hot kernels, pjit/shard_map over
a `jax.sharding.Mesh` for multi-chip scaling, and a functional PTQ/QAT
quantization subsystem producing scale-dicts instead of TensorRT engines.

Layer map (vs. the reference's five-layer stack, SURVEY.md §1):
  reference L1 (CUDA TensorRT plugins)  -> `ops/` (jnp reference impls + Pallas kernels)
  reference L3 (det2trt)                -> `models/`, `quant/`, `runtime/`
  reference L2 (bev_mmdet3d)            -> `models/`, `core/`, `data/`, `evalsuite/`
  reference L4/L5 (tools/samples)       -> `tools/`, `configs/`
  (new, no reference equivalent)        -> `parallel/` (mesh/sharding/collectives)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # some environments pin jax_platforms via sitecustomize config (which
    # outranks the env var) — honor an EXPLICIT env var so CPU runs of the
    # tools/tests work even when an accelerator plugin is present but
    # unwanted (or unreachable)
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
