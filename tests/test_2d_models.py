"""2D family tests: YOLOX decode math, 2D NMS, CenterNet local-max decode,
and micro end-to-end forwards for both detectors."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tensorrt_tpu.configs.centernet import centernet_micro
from bevformer_tensorrt_tpu.configs.yolox import yolox_micro
from bevformer_tensorrt_tpu.core.nms2d import multiclass_nms, nms


class TestNMS2D:
    def test_nms_basic(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], float)
        keep = nms(boxes, np.array([0.9, 0.8, 0.7]), 0.5)
        assert sorted(keep.tolist()) == [0, 2]

    def test_multiclass_keeps_per_class(self):
        boxes = np.array([[0, 0, 10, 10]] * 2, float)
        scores = np.zeros((2, 3))
        scores[0, 0] = 0.9
        scores[1, 1] = 0.8  # same box, different class -> both kept
        b, s, l = multiclass_nms(boxes, scores, 0.01, 0.5, 10)
        assert len(b) == 2
        assert set(l.tolist()) == {0, 1}


class TestYOLOXDecode:
    def test_decode_grid_unmapping(self):
        from bevformer_tensorrt_tpu.models.heads.yolox_head import yolox_decode

        h = w = 4
        outs = [
            {
                "cls": jnp.zeros((1, h, w, 2)),
                "reg": jnp.zeros((1, h, w, 4)),
                "obj": jnp.zeros((1, h, w, 1)),
            }
        ]
        boxes, scores = yolox_decode(outs, strides=(8,))
        # cell (1, 2): center = (2*8, 1*8), wh = exp(0)*8
        b = np.asarray(boxes).reshape(h, w, 4)
        np.testing.assert_allclose(b[1, 2], [16 - 4, 8 - 4, 16 + 4, 8 + 4])
        np.testing.assert_allclose(np.asarray(scores), 0.25)  # sigmoid(0)^2

    def test_micro_forward(self, rng):
        from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX
        from bevformer_tensorrt_tpu.models.heads.yolox_head import (
            yolox_decode,
            yolox_post_process,
        )

        cfg = yolox_micro()
        model = YOLOX(cfg)
        img = jnp.asarray(rng.standard_normal((2, 3, cfg.img_size, cfg.img_size)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        outs = model.apply(variables, img)
        assert len(outs) == 3
        assert outs[0]["cls"].shape == (2, 8, 8, cfg.num_classes)
        boxes, scores = yolox_decode(outs)
        assert boxes.shape[0] == 2 and boxes.shape[2] == 4
        b, s, l = yolox_post_process(np.asarray(boxes[0]), np.asarray(scores[0]), 0.2)
        assert b.shape[1] == 4


class TestCenterNet:
    def test_decode_peak(self):
        from bevformer_tensorrt_tpu.models.heads.centernet_head import centernet_decode

        H = W = 16
        heads = {
            "heatmap": jnp.full((1, H, W, 3), -10.0),
            "wh": jnp.zeros((1, H, W, 2)),
            "offset": jnp.zeros((1, H, W, 2)),
        }
        heads["heatmap"] = heads["heatmap"].at[0, 5, 7, 1].set(6.0)
        heads["wh"] = heads["wh"].at[0, 5, 7].set(jnp.array([4.0, 2.0]))
        heads["offset"] = heads["offset"].at[0, 5, 7].set(jnp.array([0.25, 0.5]))
        boxes, scores, labels = centernet_decode(heads, k=5, stride=4)
        assert int(labels[0, 0]) == 1
        cx, cy = (7 + 0.25) * 4, (5 + 0.5) * 4
        np.testing.assert_allclose(
            np.asarray(boxes[0, 0]), [cx - 8, cy - 4, cx + 8, cy + 4], atol=1e-5
        )

    def test_local_max_suppresses_neighbors(self):
        from bevformer_tensorrt_tpu.models.heads.centernet_head import centernet_decode

        H = W = 16
        heads = {
            "heatmap": jnp.full((1, H, W, 1), -10.0),
            "wh": jnp.ones((1, H, W, 2)),
            "offset": jnp.zeros((1, H, W, 2)),
        }
        # a peak and a weaker adjacent cell: the neighbor must be zeroed
        heads["heatmap"] = heads["heatmap"].at[0, 5, 7, 0].set(6.0)
        heads["heatmap"] = heads["heatmap"].at[0, 5, 8, 0].set(5.0)
        _, scores, _ = centernet_decode(heads, k=3)
        s = np.asarray(scores[0])
        assert s[0] > 0.9
        assert s[1] < 1e-3  # suppressed neighbor

    def test_micro_forward(self, rng):
        from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet
        from bevformer_tensorrt_tpu.models.heads.centernet_head import centernet_decode

        cfg = centernet_micro()
        model = CenterNet(cfg)
        img = jnp.asarray(rng.standard_normal((1, 3, cfg.img_size, cfg.img_size)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img)
        heads = model.apply(variables, img)
        # stride 4: 64/4 = 16
        assert heads["heatmap"].shape == (1, 16, 16, cfg.num_classes)
        boxes, scores, labels = centernet_decode(heads, k=cfg.topk)
        assert boxes.shape == (1, cfg.topk, 4)
        assert np.all(np.isfinite(np.asarray(boxes)))
