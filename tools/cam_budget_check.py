"""Measure per-camera visible-query counts on a realistic nuScenes rig.

The spatial cross-attention compacts each camera's work to a static top-K
of the bev_mask (K = ceil(cam_budget * nq) rounded up to 128); compaction
is exact iff every camera sees <= K queries (attention.py cam_budget).
The reference instead rebatches dynamically to the measured max
(spatial_cross_attention.py:201-231), so it can never drop a visible
query.  This tool builds a realistic 6-camera nuScenes rig (published
1600x900 intrinsics, yaw layout FRONT/±55/180/±110) and reports the
per-camera visible counts at any config's BEV scale, so cam_budget
defaults are set from geometry instead of hope.

Usage: JAX_PLATFORMS=cpu python tools/cam_budget_check.py [--model base]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def nuscenes_rig(img_w: int = 1600, img_h: int = 900) -> np.ndarray:
    """Approximate nuScenes v1.0 camera rig as lidar2img [6, 4, 4].

    Intrinsics/yaws follow the published calibration (fx~=1266 for the five
    70deg cameras, fx~=809 for the 120deg CAM_BACK); positions are roof
    mounts ~1.5 m up.  Scale relative to the real sensors: sx = img_w/1600.
    """
    sx, sy = img_w / 1600.0, img_h / 900.0
    # (name, yaw deg, fx, tx, ty)
    cams = [
        ("CAM_FRONT", 0.0, 1266.4, 1.70, 0.0),
        ("CAM_FRONT_RIGHT", -55.0, 1260.8, 1.56, -0.49),
        ("CAM_FRONT_LEFT", 55.0, 1272.6, 1.58, 0.50),
        ("CAM_BACK", 180.0, 809.2, 0.05, 0.0),
        ("CAM_BACK_LEFT", 110.0, 1256.7, 1.04, 0.48),
        ("CAM_BACK_RIGHT", -110.0, 1259.5, 1.06, -0.47),
    ]
    out = []
    for _, yaw_deg, fx, tx, ty in cams:
        th = np.deg2rad(yaw_deg)
        fwd = np.array([np.cos(th), np.sin(th), 0.0])
        right = np.array([np.sin(th), -np.cos(th), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R = np.stack([right, down, fwd])  # rows: cam axes in lidar frame
        t = np.array([tx, ty, 1.51])
        l2c = np.eye(4)
        l2c[:3, :3] = R
        l2c[:3, 3] = -R @ t
        K = np.eye(4)
        K[0, 0], K[1, 1] = fx * sx, fx * sy
        K[0, 2], K[1, 2] = (img_w - 1) / 2.0, (img_h - 1) / 2.0
        out.append(K @ l2c)
    return np.stack(out).astype(np.float32)


def visible_counts(cfg) -> np.ndarray:
    """Per-camera count of BEV queries with nonzero bev_mask for cfg."""
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.models.modules.encoder import (
        get_reference_points_3d,
        point_sampling,
    )

    l2i = nuscenes_rig(cfg.img_w, cfg.img_h)
    ref_3d = jnp.asarray(
        get_reference_points_3d(cfg.bev_h, cfg.bev_w, cfg.num_points_in_pillar)
    )
    _, mask = point_sampling(
        ref_3d, cfg.pc_range, jnp.asarray(l2i)[None], (cfg.img_h, cfg.img_w),
        cfg.num_cams,
    )
    return np.asarray((np.asarray(mask)[:, :, 0] > 0).sum(axis=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="base", choices=["tiny", "small", "base"])
    args = ap.parse_args()

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs

    cfg = getattr(cfgs, f"bevformer_{args.model}")()
    nq = cfg.bev_h * cfg.bev_w
    K = min(nq, -(-int(nq * cfg.cam_budget) // 128) * 128)
    counts = visible_counts(cfg)
    names = ["FRONT", "FRONT_RIGHT", "FRONT_LEFT", "BACK", "BACK_LEFT", "BACK_RIGHT"]
    for n, c in zip(names, counts):
        flag = "" if c <= K else "  <-- OVER BUDGET (visible queries dropped)"
        print(f"{n:12s} {c:6d} / K={K}{flag}")
    mx = int(counts.max())
    print(
        f"max {mx} ({mx / nq:.3f} of nq={nq}); cam_budget={cfg.cam_budget} -> K={K}; "
        f"headroom {(K - mx) / nq:+.3f}"
    )
    sys.exit(0 if mx <= K else 1)


if __name__ == "__main__":
    main()
