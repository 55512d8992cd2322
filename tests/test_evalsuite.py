"""Eval metric tests: NDS/mAP behaves correctly at the extremes (perfect
predictions -> NDS 1, garbage -> ~0), the matching is score-greedy, and the
COCO mAP matches hand-computable cases."""
import numpy as np
import pytest

from bevformer_tensorrt_tpu.evalsuite import (
    EvalBox,
    box_iou,
    evaluate_coco_map,
    evaluate_nuscenes,
)
from bevformer_tensorrt_tpu.evalsuite.nds import DETECTION_CLASSES


def make_box(token, xy, name, score=-1.0, size=(2.0, 4.0, 1.5), yaw=0.0, vel=(0, 0), attr=""):
    return EvalBox(
        sample_token=token,
        translation=np.array([xy[0], xy[1], 0.0]),
        size=np.array(size),
        yaw=yaw,
        velocity=np.array(vel, np.float64),
        detection_name=name,
        detection_score=score,
        attribute_name=attr,
    )


def scatter_gt(rng, n=40, cls="car"):
    gts, preds = [], []
    for i in range(n):
        tok = f"s{i % 8}"
        xy = rng.uniform(-40, 40, 2)
        gts.append(make_box(tok, xy, cls, attr="vehicle.parked"))
        preds.append(make_box(tok, xy, cls, score=rng.uniform(0.5, 1), attr="vehicle.parked"))
    return gts, preds


class TestNDS:
    def test_perfect_predictions(self, rng):
        gts, preds = scatter_gt(rng)
        m = evaluate_nuscenes(gts, preds, classes=("car",))
        assert m["AP_car"] > 0.98
        assert m["mATE"] < 1e-6
        assert m["mASE"] < 1e-6
        assert m["NDS"] > 0.98

    def test_no_predictions(self, rng):
        gts, _ = scatter_gt(rng)
        m = evaluate_nuscenes(gts, [], classes=("car",))
        assert m["mAP"] == 0.0
        assert m["NDS"] <= 0.5

    def test_all_false_positives(self, rng):
        gts, _ = scatter_gt(rng, n=20)
        fps = [make_box(f"s{i % 8}", rng.uniform(30, 45, 2) * (-1) ** i, "car", score=0.9)
               for i in range(20)]
        # FPs far from any GT (>4m): AP must be ~0
        far = [b for b in fps if all(
            np.hypot(*(b.translation[:2] - g.translation[:2])) > 5 for g in gts
            if g.sample_token == b.sample_token)]
        m = evaluate_nuscenes(gts, far, classes=("car",))
        assert m["mAP"] < 0.05

    def test_translation_error_reflected(self, rng):
        gts, preds = scatter_gt(rng)
        shifted = [
            make_box(p.sample_token, p.translation[:2] + np.array([1.5, 0.0]), "car",
                     score=p.detection_score, attr="vehicle.parked")
            for p in preds
        ]
        m = evaluate_nuscenes(gts, shifted, classes=("car",))
        # matched at 2m/4m thresholds but not at 0.5/1m
        assert 0.3 < m["mAP"] < 0.7
        assert abs(m["mATE"] - 1.5) < 0.05

    def test_range_filter_drops_far_boxes(self):
        gts = [make_box("s0", (100.0, 0.0), "car", attr="vehicle.parked")]
        preds = [make_box("s0", (100.0, 0.0), "car", score=0.9)]
        m = evaluate_nuscenes(gts, preds, classes=("car",))
        assert m["mAP"] == 0.0  # both filtered: no GT in range -> AP 0

    def test_rigid_transform_invariance(self, rng):
        gts, preds = scatter_gt(rng, n=25)
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        t = np.array([3.0, -2.0])

        def move(b):
            xy = R @ b.translation[:2] + t
            return EvalBox(
                sample_token=b.sample_token,
                translation=np.array([xy[0], xy[1], 0.0]),
                size=b.size,
                yaw=b.yaw + th,
                velocity=R @ b.velocity,
                detection_name=b.detection_name,
                detection_score=b.detection_score,
                attribute_name=b.attribute_name,
                ego_translation=b.translation[:2],  # keep original range filter
            )

        m1 = evaluate_nuscenes(gts, preds, classes=("car",))
        m2 = evaluate_nuscenes([move(b) for b in gts], [move(b) for b in preds], classes=("car",))
        for k in ("mAP", "NDS", "mATE", "mAOE", "mAVE"):
            np.testing.assert_allclose(m1[k], m2[k], atol=1e-9)

    def test_all_classes_run(self, rng):
        gts, preds = [], []
        for c in DETECTION_CLASSES:
            g, p = scatter_gt(rng, n=6, cls=c)
            gts += g
            preds += p
        m = evaluate_nuscenes(gts, preds)
        assert m["mAP"] > 0.9


class TestCocoMap:
    def test_box_iou(self):
        a = [[0, 0, 10, 10]]
        b = [[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]]
        iou = box_iou(a, b)[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)

    def test_perfect(self):
        gt = [{"image_id": "a", "category_id": 0, "bbox": [0, 0, 10, 10]},
              {"image_id": "a", "category_id": 0, "bbox": [20, 20, 40, 40]}]
        pred = [dict(g, score=0.9) for g in gt]
        m = evaluate_coco_map(gt, pred, num_classes=1)
        assert m["mAP"] > 0.99

    def test_misses_lower_ap(self):
        gt = [{"image_id": "a", "category_id": 0, "bbox": [0, 0, 10, 10]},
              {"image_id": "a", "category_id": 0, "bbox": [20, 20, 40, 40]}]
        pred = [dict(gt[0], score=0.9)]
        m = evaluate_coco_map(gt, pred, num_classes=1)
        assert 0.4 < m["mAP"] < 0.6

    def test_loose_box_only_counts_at_low_iou(self):
        gt = [{"image_id": "a", "category_id": 0, "bbox": [0, 0, 10, 10]}]
        pred = [{"image_id": "a", "category_id": 0, "bbox": [0, 0, 10, 14], "score": 0.9}]
        m = evaluate_coco_map(gt, pred, num_classes=1)
        assert m["mAP_50"] > 0.99
        assert m["mAP_75"] == 0.0


class TestDataPipeline:
    def test_pad_and_normalize(self):
        from bevformer_tensorrt_tpu.data.nuscenes import (
            IMG_NORM_PYTORCH,
            normalize_image,
            pad_to_divisor,
        )

        img = np.full((900, 1600, 3), 128, np.uint8)
        n = normalize_image(img, IMG_NORM_PYTORCH)
        assert n.shape == (900, 1600, 3)
        # to_rgb flips channels; mean/std applied
        np.testing.assert_allclose(n[0, 0, 0], (128 - 123.675) / 58.395, rtol=1e-5)
        p = pad_to_divisor(n, 32)
        assert p.shape == (928, 1600, 3)
        assert np.all(p[900:] == 0)

    def test_lidar2img_matches_reference_formula(self, rng):
        from bevformer_tensorrt_tpu.data.nuscenes import lidar2img_from_cam_info

        # random orthonormal rotation
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        cam = {
            "sensor2lidar_rotation": q,
            "sensor2lidar_translation": rng.normal(size=3),
            "cam_intrinsic": np.array([[1200.0, 0, 800], [0, 1200, 450], [0, 0, 1]]),
        }
        l2i = lidar2img_from_cam_info(cam)
        # a point at the camera origin must project to (0, 0, 0) depth
        pt = np.append(cam["sensor2lidar_translation"], 1.0)
        proj = l2i @ pt
        np.testing.assert_allclose(proj[:3], 0.0, atol=1e-4)

    def test_can_bus_processing(self):
        from bevformer_tensorrt_tpu.data.nuscenes import process_can_bus, quaternion_yaw

        yaw = 0.73
        info = {
            "can_bus": np.zeros(18),
            "ego2global_rotation": [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)],
            "ego2global_translation": [10.0, 20.0, 0.0],
        }
        cb = process_can_bus(info)
        np.testing.assert_allclose(cb[:3], [10, 20, 0], atol=1e-6)
        np.testing.assert_allclose(cb[-2], yaw, atol=1e-6)
        np.testing.assert_allclose(quaternion_yaw(info["ego2global_rotation"]), yaw, atol=1e-9)
