"""Golden tests: grid_sample vs torch.nn.functional.grid_sample (CPU oracle).

Mirrors the reference's plugin-parity test pattern
(det2trt/models/utils/test_trt_ops/test_grid_sampler.py): the torch op is the
oracle, our TPU-native op is the DUT, assert mean-abs-diff below delta.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bevformer_tensorrt_tpu.ops import grid_sample_2d, grid_sample_3d

MODES = ["bilinear", "nearest", "bicubic"]
PADS = ["zeros", "border", "reflection"]


def _mad(a, b):
    return float(np.mean(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("pad", PADS)
@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_2d(rng, mode, pad, align):
    N, C, H, W = 2, 5, 13, 17
    Ho, Wo = 9, 11
    inp = rng.standard_normal((N, C, H, W)).astype(np.float32)
    # cover in-bounds and far out-of-bounds coordinates
    grid = (rng.standard_normal((N, Ho, Wo, 2)) * 1.2).astype(np.float32)

    ours = grid_sample_2d(inp, grid, mode=mode, padding_mode=pad, align_corners=align)
    ref = F.grid_sample(
        torch.from_numpy(inp),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode=pad,
        align_corners=align,
    ).numpy()
    assert _mad(ours, ref) < 1e-5, (mode, pad, align)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("pad", PADS)
@pytest.mark.parametrize("align", [False, True])
def test_grid_sample_3d(rng, mode, pad, align):
    N, C, D, H, W = 2, 3, 5, 7, 9
    Do, Ho, Wo = 4, 5, 6
    inp = rng.standard_normal((N, C, D, H, W)).astype(np.float32)
    grid = (rng.standard_normal((N, Do, Ho, Wo, 3)) * 1.2).astype(np.float32)

    ours = grid_sample_3d(inp, grid, mode=mode, padding_mode=pad, align_corners=align)
    ref = F.grid_sample(
        torch.from_numpy(inp),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode=pad,
        align_corners=align,
    ).numpy()
    assert _mad(ours, ref) < 1e-5, (mode, pad, align)


def test_grid_sample_2d_exact_corners(rng):
    """Pixel-center grid must reproduce the input exactly (bilinear)."""
    N, C, H, W = 1, 2, 8, 8
    inp = rng.standard_normal((N, C, H, W)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = (2 * xs + 1) / W - 1
    gy = (2 * ys + 1) / H - 1
    grid = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = grid_sample_2d(inp, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    np.testing.assert_allclose(np.asarray(out), inp, rtol=0, atol=1e-6)
