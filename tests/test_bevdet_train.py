"""BEVDet training criterion tests (train/losses_bevdet.py).

Mirrors the reference's target/loss semantics from mmdet3d
CenterHead.get_targets/loss (bev_mmdet3d/models/dense_heads/
centerpoint_head.py): gaussian peaks of exactly 1 at gt centers,
code-weighted L1 at center cells only, pad rows ignored.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro, bevdet_r50
from bevformer_tensorrt_tpu.train.losses_bevdet import (
    bevdet_loss_single,
    bevdet_targets,
)


def _gt(cfg, n=3, seed=0):
    rng = np.random.default_rng(seed)
    G = 8
    boxes = np.zeros((G, 9), np.float32)
    span = cfg.grid_xbound[1] - cfg.grid_xbound[0]
    boxes[:n, 0] = rng.uniform(cfg.grid_xbound[0] + 0.1 * span,
                               cfg.grid_xbound[1] - 0.1 * span, n)
    boxes[:n, 1] = rng.uniform(cfg.grid_ybound[0] + 0.1 * span,
                               cfg.grid_ybound[1] - 0.1 * span, n)
    boxes[:n, 2] = rng.uniform(-1, 1, n)
    boxes[:n, 3:6] = rng.uniform(1.0, 4.0, (n, 3))
    boxes[:n, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:n, 7:9] = rng.uniform(-2, 2, (n, 2))
    labels = np.full(G, -1, np.int32)
    labels[:n] = rng.integers(0, cfg.num_classes, n)
    return jnp.asarray(boxes), jnp.asarray(labels)


def test_targets_peak_at_center():
    cfg = bevdet_micro()
    boxes, labels = _gt(cfg, n=2)
    heat, anno, pos, mask = bevdet_targets(cfg, boxes, labels)
    assert heat.shape == (cfg.bev_h, cfg.bev_w, cfg.num_classes)
    assert bool(mask[0]) and bool(mask[1])
    for g in range(2):
        y, x = int(pos[g]) // cfg.bev_w, int(pos[g]) % cfg.bev_w
        c = int(labels[g])
        assert float(heat[y, x, c]) == pytest.approx(1.0, abs=1e-5)
    # pad rows contribute nothing
    assert not bool(mask[5])
    # regression targets: fractional offsets in [0, 1), log dims finite
    assert np.all((np.asarray(anno[:2, :2]) >= 0) & (np.asarray(anno[:2, :2]) < 1))
    assert np.isfinite(np.asarray(anno)).all()


def test_targets_out_of_range_masked():
    cfg = bevdet_micro()
    boxes = jnp.zeros((4, 9)).at[0, 0].set(cfg.grid_xbound[1] * 5)
    labels = jnp.asarray([0, -1, -1, -1], jnp.int32)
    heat, _, _, mask = bevdet_targets(cfg, boxes, labels)
    assert not bool(mask[0])
    assert float(heat.max()) == 0.0


def test_loss_values_and_grad_direction():
    cfg = bevdet_r50()
    boxes, labels = _gt(cfg, n=4, seed=1)
    H, W, C = cfg.bev_h, cfg.bev_w, cfg.num_classes
    rng = np.random.default_rng(0)
    heads = {
        "heatmap": jnp.asarray(rng.normal(-2, 0.1, (1, H, W, C)), jnp.float32),
        "reg": jnp.zeros((1, H, W, 2)),
        "height": jnp.zeros((1, H, W, 1)),
        "dim": jnp.zeros((1, H, W, 3)),
        "rot": jnp.zeros((1, H, W, 2)),
        "vel": jnp.zeros((1, H, W, 2)),
    }
    li = bevdet_loss_single(cfg, heads, boxes, labels)
    assert np.isfinite(float(li["loss"]))
    assert float(li["num_pos"]) == 4
    # perfect prediction at the gt cells -> bbox loss ~0
    _, anno, pos, mask = bevdet_targets(cfg, boxes, labels)
    flat = {k: np.zeros((H * W, v.shape[-1]), np.float32)
            for k, v in heads.items() if k != "heatmap"}
    a = np.asarray(anno)
    p = np.asarray(pos)
    off = 0
    for k, ch in (("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2)):
        for g in range(4):
            flat[k][p[g]] = a[g, off:off + ch]
        off += ch
    heads2 = dict(heads)
    for k, ch in (("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2)):
        heads2[k] = jnp.asarray(flat[k].reshape(1, H, W, ch))
    li2 = bevdet_loss_single(cfg, heads2, boxes, labels)
    assert float(li2["loss_bbox"]) < 1e-5
    assert float(li2["loss_bbox"]) < float(li["loss_bbox"])
