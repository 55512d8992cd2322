"""AOT compilation and serialized executables — the ".trt engine" analogue.

The reference's deployment artifact is a serialized TensorRT plan
(det2trt/convert/onnx2tensorrt.py:62-67; loaded by utils/tensorrt.py:12-16).
The TPU-native equivalents, both provided here:

  * `export_serialized` / `load_serialized`: portable StableHLO artifact via
    `jax.export` — device-independent, reload-and-jit anywhere.
  * `aot_compile`: `jit(...).lower().compile()` producing a loaded
    executable for THIS chip (plus the persistent compilation cache set up
    by `enable_compilation_cache`, which plays the role of the on-disk
    engine plan between processes).
"""
from __future__ import annotations

import pathlib
from typing import Any, Callable, Sequence

import jax


def enable_compilation_cache(path: str = "/root/repo/.jax_cache") -> None:
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def export_serialized(fn: Callable, args: Sequence[Any], path: str | pathlib.Path) -> None:
    """Serialize `jit(fn)` traced at `args` to a StableHLO artifact."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(fn))(*args)
    pathlib.Path(path).write_bytes(exported.serialize())


def load_serialized(path: str | pathlib.Path) -> Callable:
    """Load a serialized artifact; returns a callable (jit-compiled on call)."""
    from jax import export as jax_export

    exported = jax_export.deserialize(pathlib.Path(path).read_bytes())
    return jax.jit(exported.call)


def aot_compile(fn: Callable, args: Sequence[Any]):
    """Ahead-of-time compile for the current backend; returns the loaded
    executable (callable)."""
    return jax.jit(fn).lower(*args).compile()
