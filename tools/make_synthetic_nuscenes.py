"""Generate a tiny synthetic nuScenes-format dataset (infos pkl + images).

For CI / smoke-testing the full eval pipeline without the real dataset:
produces `nuscenes_infos_synthetic.pkl` in the mmdet3d infos layout consumed
by data/nuscenes.py, plus JPEG camera images on disk.

Usage: python tools/make_synthetic_nuscenes.py <out_dir> [--frames 4] [--cams 6]
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=900)
    ap.add_argument(
        "--shared-gt", action="store_true",
        help="same GT boxes in every frame: a memorizable constant scene, "
        "so short overfit runs reach meaningful AP (the fp/int8/QAT NDS "
        "deltas are the point of the synthetic accuracy cycle, not scene "
        "variety)",
    )
    args = ap.parse_args()

    from PIL import Image

    out = Path(args.out_dir)
    (out / "samples").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    infos = []
    shared = None
    for i in range(args.frames):
        scene = f"scene{i // 2}"  # 2 frames per scene
        cams = {}
        for c in range(args.cams):
            rel = f"samples/f{i}_cam{c}.jpg"
            img = rng.integers(0, 255, (args.height, args.width, 3), np.uint8)
            Image.fromarray(img).save(out / rel, quality=70)
            yaw = 2 * np.pi * c / args.cams
            rot = np.array(
                [
                    [np.cos(yaw), -np.sin(yaw), 0],
                    [np.sin(yaw), np.cos(yaw), 0],
                    [0, 0, 1],
                ]
            ) @ np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]])  # cam looks +x rotated
            cams[f"CAM{c}"] = dict(
                data_path=rel,
                sensor2lidar_rotation=rot,
                sensor2lidar_translation=rng.normal(0, 0.5, 3),
                cam_intrinsic=np.array(
                    [[1200.0, 0, args.width / 2], [0, 1200.0, args.height / 2], [0, 0, 1]]
                ),
            )
        if args.shared_gt and shared is not None:
            gt_boxes, names, vel = shared
        else:
            n_gt = int(rng.integers(3, 8))
            gt_boxes = np.zeros((n_gt, 7), np.float32)
            gt_boxes[:, :2] = rng.uniform(-30, 30, (n_gt, 2))
            gt_boxes[:, 2] = rng.uniform(-1, 1, n_gt)
            gt_boxes[:, 3:6] = rng.uniform(0.5, 4, (n_gt, 3))
            gt_boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
            names = rng.choice(["car", "truck", "pedestrian", "bicycle"], n_gt)
            vel = rng.normal(0, 2, (n_gt, 2)).astype(np.float32)
            if args.shared_gt:
                shared = (gt_boxes, names, vel)
        infos.append(
            dict(
                token=f"sample{i}",
                scene_token=scene,
                timestamp=1_000_000 * i,
                cams=cams,
                can_bus=np.zeros(18, np.float64),
                ego2global_translation=[float(i) * 5.0, 0.0, 0.0],
                ego2global_rotation=[1.0, 0.0, 0.0, 0.0],
                lidar2ego_translation=[0.9, 0.0, 1.8],
                lidar2ego_rotation=[1.0, 0.0, 0.0, 0.0],
                gt_boxes=gt_boxes,
                gt_names=list(names),
                gt_velocity=vel,
                valid_flag=np.ones(n_gt, bool),
            )
        )

    pkl = out / "nuscenes_infos_synthetic.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "synthetic"}}, f)
    print(f"wrote {len(infos)} frames -> {pkl}")


if __name__ == "__main__":
    main()
