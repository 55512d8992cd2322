"""create_data test: a synthetic raw-nuScenes table set round-trips through
infos generation, the dataset layer, and the lidar2img projection."""
import json
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from create_data import build_infos, quat_to_rot  # noqa: E402

from bevformer_tensorrt_tpu.data.nuscenes import (  # noqa: E402
    extract_gt,
    lidar2img_from_cam_info,
)


def make_raw(root: Path):
    v = root / "v1.0-mini"
    v.mkdir(parents=True)
    # camera optical frame: z forward, x right, y down; looking along ego +x
    cam_rot_matrix = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
    # quaternion for that matrix: rotation by -90 about z then -90 about x...
    # easier: supply the quaternion whose quat_to_rot equals the matrix.
    # R = Rz(-90) ? verify numerically below; use half-angle construction:
    # q = qz(-90deg) * qx(-90deg)
    def qmul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]

    s = np.sin(-np.pi / 4)
    c = np.cos(-np.pi / 4)
    q_cam = qmul([c, 0, 0, s], [c, s, 0, 0])
    assert np.allclose(quat_to_rot(q_cam), cam_rot_matrix, atol=1e-9)

    tables = {
        "scene": [{"token": "sc0", "name": "scene-0001"}],
        "sample": [
            {"token": "s0", "scene_token": "sc0", "timestamp": 1000000},
        ],
        "sensor": [
            {"token": "se_lidar", "channel": "LIDAR_TOP"},
            {"token": "se_cam", "channel": "CAM_FRONT"},
        ],
        "calibrated_sensor": [
            {
                "token": "cs_lidar",
                "sensor_token": "se_lidar",
                "rotation": [1, 0, 0, 0],
                "translation": [0, 0, 1.8],
                "camera_intrinsic": [],
            },
            {
                "token": "cs_cam",
                "sensor_token": "se_cam",
                "rotation": q_cam,
                "translation": [1.0, 0.0, 1.5],
                "camera_intrinsic": [[1000.0, 0, 800], [0, 1000.0, 450], [0, 0, 1]],
            },
        ],
        "ego_pose": [
            {"token": "ep0", "rotation": [1, 0, 0, 0], "translation": [0, 0, 0]},
        ],
        "sample_data": [
            {
                "token": "sd_lidar", "sample_token": "s0", "is_key_frame": True,
                "calibrated_sensor_token": "cs_lidar", "ego_pose_token": "ep0",
                "filename": "lidar.bin", "timestamp": 1000000,
            },
            {
                "token": "sd_cam", "sample_token": "s0", "is_key_frame": True,
                "calibrated_sensor_token": "cs_cam", "ego_pose_token": "ep0",
                "filename": "cam.jpg", "timestamp": 1000000,
            },
        ],
        "category": [{"token": "cat_car", "name": "vehicle.car"}],
        "instance": [{"token": "in0", "category_token": "cat_car"}],
        "sample_annotation": [
            {
                "token": "a0", "sample_token": "s0", "instance_token": "in0",
                "translation": [10.0, 0.0, 1.5], "size": [2.0, 4.5, 1.6],
                "rotation": [1, 0, 0, 0], "prev": "", "next": "",
                "num_lidar_pts": 5, "num_radar_pts": 0,
            }
        ],
    }
    for name, rows in tables.items():
        (v / f"{name}.json").write_text(json.dumps(rows))
    return root


def test_create_data_roundtrip(tmp_path):
    make_raw(tmp_path)
    infos = build_infos(tmp_path, "v1.0-mini")
    assert len(infos) == 1
    info = infos[0]
    assert "CAM_FRONT" in info["cams"]

    # GT: annotation at global (10, 0, 1.5); lidar frame = ego shifted up 1.8
    boxes, labels = extract_gt(info)
    assert boxes.shape == (1, 9)
    np.testing.assert_allclose(boxes[0, :3], [10.0, 0.0, 1.5 - 1.8], atol=1e-6)
    np.testing.assert_allclose(boxes[0, 3:6], [2.0, 4.5, 1.6], atol=1e-6)
    assert labels[0] == 0  # car

    # projection: the GT center must land on the image via lidar2img
    cam = info["cams"]["CAM_FRONT"]
    l2i = lidar2img_from_cam_info(cam)
    p = np.append(boxes[0, :3], 1.0)
    proj = l2i @ p
    u, v_ = proj[0] / proj[2], proj[1] / proj[2]
    # camera at ego (1, 0, 1.5) looking +x; point at (10, 0, 1.5 global);
    # expected: centered horizontally (u = cx = 800)
    np.testing.assert_allclose(u, 800.0, atol=1e-3)
    assert proj[2] > 0  # in front of camera
    # vertical: point is at camera height -> v = cy
    np.testing.assert_allclose(v_, 450.0, atol=1e-3)
