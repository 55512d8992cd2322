"""Op library: TPU-native equivalents of the reference's 7 TensorRT plugin
families (SURVEY.md §2.1 N1-N7).

Each op has a pure-jnp implementation (the oracle + XLA/default path, which
is differentiable and runs anywhere) and, where it pays, a Pallas TPU kernel
under `ops/pallas/`.  The public names here dispatch to the best available
implementation for the current backend.
"""
from .grid_sample import grid_sample_2d, grid_sample_3d, grid_sampler
from .msda import (
    multi_scale_deformable_attn,
    multi_scale_deformable_attn_reference,
    multi_scale_deformable_attn_sorted,
    multi_scale_deformable_attn_sorted_diff,
    multi_scale_deformable_attn_sorted_qm,
    multi_scale_deformable_attn_sorted_qm_diff,
    msda_sampling_locations,
)
from .rotate import rotate
from .bev_pool import bev_pool_v2
from .attention import qkv, multi_head_attention
from .dcn import modulated_deform_conv2d
from .inverse import inverse, inverse_4x4

__all__ = [
    "grid_sample_2d",
    "grid_sample_3d",
    "grid_sampler",
    "multi_scale_deformable_attn",
    "multi_scale_deformable_attn_sorted",
    "multi_scale_deformable_attn_sorted_diff",
    "multi_scale_deformable_attn_sorted_qm",
    "multi_scale_deformable_attn_sorted_qm_diff",
    "msda_sampling_locations",
    "rotate",
    "bev_pool_v2",
    "qkv",
    "multi_head_attention",
    "modulated_deform_conv2d",
    "inverse",
    "inverse_4x4",
]
