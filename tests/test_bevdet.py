"""BEVDet family tests: LSS geometry (frustum/ranks vs a brute-force
reference), bev_pool parity, CenterPoint decode round-trip, rotated NMS
against shapely-free hand cases, and the micro end-to-end forward."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro, bevdet_r50
from bevformer_tensorrt_tpu.core.nms import nms_rotated, rotated_iou_bev, scale_nms
from bevformer_tensorrt_tpu.models.necks.view_transformer import (
    get_lidar_coor,
    make_frustum,
    voxel_pooling_prepare,
)


class TestGeometry:
    def test_frustum_shape_and_range(self):
        cfg = bevdet_r50()
        f = make_frustum(cfg)
        assert f.shape == (cfg.depth_bins, cfg.feat_h, cfg.feat_w, 3)
        assert f[..., 2].min() == 1.0 and f[..., 2].max() == 59.0
        assert f[..., 0].max() == cfg.input_w - 1

    def test_identity_rig_geometry(self):
        """A camera at the origin looking +z with identity intrinsics maps the
        frustum point (u, v, d) to ((u)*d, (v)*d, d) in ego space."""
        cfg = bevdet_micro()
        N = cfg.num_cams
        s2e = np.broadcast_to(np.eye(4, dtype=np.float32), (N, 4, 4)).copy()
        intr = np.broadcast_to(np.eye(3, dtype=np.float32), (N, 3, 3)).copy()
        coor = get_lidar_coor(cfg, s2e, intr)
        f = make_frustum(cfg)
        expect = np.stack(
            [f[..., 0] * f[..., 2], f[..., 1] * f[..., 2], f[..., 2]], -1
        )
        np.testing.assert_allclose(coor[0], expect, rtol=1e-4)

    def test_ranks_sorted_and_valid(self, rng):
        cfg = bevdet_micro()
        N = cfg.num_cams
        # rig with cameras looking outward, realistic intrinsics
        s2e = np.broadcast_to(np.eye(4, dtype=np.float32), (N, 4, 4)).copy()
        intr = np.stack([np.array([[60.0, 0, 64], [0, 60.0, 32], [0, 0, 1]], np.float32)] * N)
        coor = get_lidar_coor(cfg, s2e, intr)
        ranks = voxel_pooling_prepare(cfg, coor)
        rb = ranks.ranks_bev
        assert len(rb) > 0
        assert np.all(np.diff(rb) >= 0)  # sorted
        assert rb.max() < cfg.bev_h * cfg.bev_w
        assert ranks.ranks_depth.max() < N * cfg.depth_bins * cfg.feat_h * cfg.feat_w
        assert ranks.ranks_feat.max() < N * cfg.feat_h * cfg.feat_w
        assert ranks.interval_lengths.sum() == len(rb)

    def test_padding(self):
        cfg = bevdet_micro()
        N = cfg.num_cams
        s2e = np.broadcast_to(np.eye(4, dtype=np.float32), (N, 4, 4)).copy()
        intr = np.stack([np.array([[60.0, 0, 64], [0, 60.0, 32], [0, 0, 1]], np.float32)] * N)
        coor = get_lidar_coor(cfg, s2e, intr)
        raw = voxel_pooling_prepare(cfg, coor)
        padded = voxel_pooling_prepare(cfg, coor, pad_to=len(raw.ranks_bev) + 100)
        assert np.all(padded.ranks_bev[len(raw.ranks_bev):] == -1)
        np.testing.assert_array_equal(padded.ranks_bev[: len(raw.ranks_bev)], raw.ranks_bev)


class TestRotatedNMS:
    def test_iou_axis_aligned(self):
        a = np.array([0, 0, 2, 4, 0.0])
        b = np.array([1, 0, 2, 4, 0.0])
        np.testing.assert_allclose(rotated_iou_bev(a, b), 4 / 12, atol=1e-6)

    def test_iou_rotated_90(self):
        a = np.array([0, 0, 2, 4, 0.0])
        b = np.array([0, 0, 2, 4, np.pi / 2])
        np.testing.assert_allclose(rotated_iou_bev(a, b), 4 / 12, atol=1e-6)

    def test_iou_identical(self):
        a = np.array([3, -2, 1.5, 4, 0.7])
        np.testing.assert_allclose(rotated_iou_bev(a, a), 1.0, atol=1e-6)

    def test_nms_suppresses_overlaps(self):
        boxes = np.array(
            [[0, 0, 2, 4, 0.0], [0.1, 0, 2, 4, 0.0], [10, 10, 2, 4, 0.0]]
        )
        scores = np.array([0.9, 0.8, 0.7])
        keep = nms_rotated(boxes, scores, iou_threshold=0.2)
        assert sorted(keep.tolist()) == [0, 2]

    def test_scale_nms_class_rescale(self):
        # two thin boxes of class 9 (traffic cone, factor 3.5): overlap only
        # after rescale -> suppressed under scale-NMS, kept under plain NMS
        boxes9 = np.zeros((2, 9))
        boxes9[:, 3:5] = 0.3  # w, l
        boxes9[1, 0] = 0.5    # offset x
        boxes9[:, 6] = 0.0
        scores = np.array([0.9, 0.8])
        labels = np.array([9, 9])
        keep_plain = scale_nms(boxes9, scores, labels, 0.2, (1.0,) * 10)
        keep_scaled = scale_nms(boxes9, scores, labels, 0.2, (1.0,) * 9 + (3.5,))
        assert len(keep_plain) == 2
        assert len(keep_scaled) == 1


class TestDecode:
    def test_decode_recovers_peak(self):
        from bevformer_tensorrt_tpu.models.heads.centerpoint_head import centerpoint_decode

        cfg = bevdet_micro()
        H = W = cfg.bev_h
        heads = {
            "heatmap": jnp.full((1, H, W, cfg.num_classes), -10.0),
            "reg": jnp.zeros((1, H, W, 2)),
            "height": jnp.zeros((1, H, W, 1)),
            "dim": jnp.zeros((1, H, W, 3)),
            "rot": jnp.zeros((1, H, W, 2)),
            "vel": jnp.zeros((1, H, W, 2)),
        }
        # place a confident detection of class 3 at cell (5, 7)
        heads["heatmap"] = heads["heatmap"].at[0, 5, 7, 3].set(8.0)
        heads["reg"] = heads["reg"].at[0, 5, 7].set(jnp.array([0.5, 0.5]))
        heads["dim"] = heads["dim"].at[0, 5, 7].set(jnp.log(jnp.array([2.0, 4.0, 1.5])))
        boxes, scores, labels, valid = centerpoint_decode(cfg, heads)
        v = np.asarray(valid)
        assert v[0]
        assert int(labels[0]) == 3
        b = np.asarray(boxes[0])
        ex = (7 + 0.5) * cfg.out_size_factor * cfg.voxel_size[0] + cfg.pc_range[0]
        ey = (5 + 0.5) * cfg.out_size_factor * cfg.voxel_size[1] + cfg.pc_range[1]
        np.testing.assert_allclose(b[0], ex, atol=1e-5)
        np.testing.assert_allclose(b[1], ey, atol=1e-5)
        np.testing.assert_allclose(b[3:6], [2.0, 4.0, 1.5], rtol=1e-5)


@pytest.mark.slow
class TestEndToEnd:
    def test_micro_forward(self, rng):
        from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet

        cfg = bevdet_micro()
        N = cfg.num_cams
        s2e = np.broadcast_to(np.eye(4, dtype=np.float32), (N, 4, 4)).copy()
        intr = np.stack([np.array([[60.0, 0, 64], [0, 60.0, 32], [0, 0, 1]], np.float32)] * N)
        coor = get_lidar_coor(cfg, s2e, intr)
        ranks = voxel_pooling_prepare(cfg, coor, pad_to=8192)

        model = BEVDet(cfg)
        image = jnp.asarray(
            rng.standard_normal((1, N, 3, cfg.input_h, cfg.input_w)), jnp.float32
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            image,
            jnp.asarray(ranks.ranks_depth),
            jnp.asarray(ranks.ranks_feat),
            jnp.asarray(ranks.ranks_bev),
        )
        out = model.apply(
            variables,
            image,
            jnp.asarray(ranks.ranks_depth),
            jnp.asarray(ranks.ranks_feat),
            jnp.asarray(ranks.ranks_bev),
        )
        assert out["heatmap"].shape == (1, cfg.bev_h, cfg.bev_w, cfg.num_classes)
        assert out["dim"].shape == (1, cfg.bev_h, cfg.bev_w, 3)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))

        from bevformer_tensorrt_tpu.models.heads.centerpoint_head import (
            centerpoint_post_process,
        )

        res = centerpoint_post_process(cfg, out)
        assert res["boxes_3d"].shape[1] == 9
