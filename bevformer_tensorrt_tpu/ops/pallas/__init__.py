"""Pallas TPU kernels — the framework's native-kernel layer.

These are the TPU-native equivalents of the reference's CUDA TensorRT
plugin library (TensorRT/plugin/*, SURVEY.md §2.1 N1-N7).  Each kernel has
a jnp oracle in ops/ and golden tests mirroring the reference's
P5-as-oracle pattern (§4); on CPU the kernels run in interpreter mode, on
TPU they compile through Mosaic.
"""
from .flash_attn import flash_attention, flash_attention_int8  # noqa: F401
from .int8_matmul import int8_matmul  # noqa: F401
