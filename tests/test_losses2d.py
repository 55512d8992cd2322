"""2D training criteria tests: SimOTA/YOLOX and CenterNet losses.

Property-based (mmdet isn't installed to diff against): jittability at
static shapes, padding invariance, perfect-prediction optimality, and
hand-checked assignment behavior on a tiny constructed case.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tensorrt_tpu.train.losses2d import (
    centernet_loss_single,
    centernet_targets,
    yolox_loss_single,
    _decode_boxes,
    _pairwise_iou,
)

C = 5  # classes


def _yolox_outs(rng, hw=((8, 8), (4, 4), (2, 2)), batch=1):
    outs = []
    for h, w in hw:
        outs.append(
            {
                "cls": jnp.asarray(rng.standard_normal((batch, h, w, C)), jnp.float32),
                "reg": jnp.asarray(rng.standard_normal((batch, h, w, 4)) * 0.1, jnp.float32),
                "obj": jnp.asarray(rng.standard_normal((batch, h, w, 1))[..., 0], jnp.float32),
            }
        )
    return outs


class TestYOLOXLoss:
    def test_jittable_and_finite(self, rng):
        outs = _yolox_outs(rng)
        gt = jnp.asarray([[8.0, 8.0, 30.0, 30.0], [0, 0, 0, 0]], jnp.float32)
        gl = jnp.asarray([2, -1], jnp.int32)
        f = jax.jit(lambda o, b, l: yolox_loss_single(o, b, l, C))
        out = f(outs, gt, gl)
        assert np.isfinite(float(out["loss"]))
        assert float(out["num_pos"]) >= 1

    def test_padding_invariance(self, rng):
        outs = _yolox_outs(rng)
        gt1 = jnp.asarray([[8.0, 8.0, 30.0, 30.0], [0, 0, 0, 0]], jnp.float32)
        gl1 = jnp.asarray([2, -1], jnp.int32)
        gt2 = jnp.pad(gt1, ((0, 3), (0, 0)))
        gl2 = jnp.pad(gl1, (0, 3), constant_values=-1)
        a = yolox_loss_single(outs, gt1, gl1, C)
        b = yolox_loss_single(outs, gt2, gl2, C)
        assert float(a["loss"]) == pytest.approx(float(b["loss"]), rel=1e-6)

    def test_good_predictions_beat_bad(self, rng):
        """Priors predicting the GT box with high scores must incur less
        loss than anti-predictions (gradient direction sanity)."""
        gt = jnp.asarray([[10.0, 10.0, 30.0, 30.0]], jnp.float32)
        gl = jnp.asarray([1], jnp.int32)

        def outs_with(scale_cls, scale_obj):
            outs = []
            for h, w, s in ((8, 8, 8), (4, 4, 16), (2, 2, 32)):
                cls = np.full((1, h, w, C), -4.0, np.float32)
                reg = np.zeros((1, h, w, 4), np.float32)
                obj = np.full((1, h, w), -4.0, np.float32)
                gx, gy = np.meshgrid(np.arange(w), np.arange(h))
                cx, cy = (gx + 0.5) * s, (gy + 0.5) * s
                inside = (cx > 10) & (cx < 30) & (cy > 10) & (cy < 30)
                cls[0, :, :, 1] = np.where(inside, scale_cls, -4.0)
                obj[0] = np.where(inside, scale_obj, -4.0)
                # aim the box at the gt: xy offset to center, wh = log(20/s)
                reg[0, :, :, 0] = (20.0 - cx) / s + 0.5
                reg[0, :, :, 1] = (20.0 - cy) / s + 0.5
                reg[0, :, :, 2] = np.log(20.0 / s)
                reg[0, :, :, 3] = np.log(20.0 / s)
                outs.append(
                    {"cls": jnp.asarray(cls), "reg": jnp.asarray(reg), "obj": jnp.asarray(obj)}
                )
            return outs

        good = yolox_loss_single(outs_with(4.0, 4.0), gt, gl, C)
        bad = yolox_loss_single(outs_with(-4.0, -4.0), gt, gl, C)
        assert float(good["loss"]) < float(bad["loss"])
        assert float(good["loss_bbox"]) < 0.5  # matched boxes IoU ~1

    def test_decode_roundtrip(self):
        centers = jnp.asarray([[12.0, 20.0]], jnp.float32)
        stride = jnp.asarray([8.0], jnp.float32)
        reg = jnp.asarray([[0.5, 0.5, np.log(2.0), np.log(3.0)]], jnp.float32)
        # grid origin = 8,16; xy = (0.5+1)*8? -> origin + pred*stride
        box = np.asarray(_decode_boxes(reg, centers, stride))[0]
        cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
        assert cx == pytest.approx(8 + 0.5 * 8)
        assert cy == pytest.approx(16 + 0.5 * 8)
        assert box[2] - box[0] == pytest.approx(16.0)
        assert box[3] - box[1] == pytest.approx(24.0)


class TestCenterNetLoss:
    def test_targets_gaussian_peak(self):
        gt = jnp.asarray([[8.0, 8.0, 40.0, 40.0]], jnp.float32)
        gl = jnp.asarray([3], jnp.int32)
        heat, ctr, ctr_int, w, h, ok = centernet_targets(gt, gl, C, 16, 16, stride=4)
        heat = np.asarray(heat)
        assert heat[:, :, 3].max() == pytest.approx(1.0)
        yy, xx = np.unravel_index(heat[:, :, 3].argmax(), (16, 16))
        assert (xx, yy) == (6, 6)  # center (24, 24) / 4
        assert heat[:, :, 0].max() == 0.0  # other classes empty
        assert bool(ok[0])

    def test_perfect_prediction_low_loss(self, rng):
        gt = jnp.asarray([[8.0, 8.0, 40.0, 40.0]], jnp.float32)
        gl = jnp.asarray([3], jnp.int32)
        heat, ctr, ctr_int, w, h, ok = centernet_targets(gt, gl, C, 16, 16, 4)
        logit = jnp.log(jnp.clip(heat, 1e-6, 1 - 1e-6) / (1 - jnp.clip(heat, 1e-6, 1 - 1e-6)))
        wh = jnp.zeros((16, 16, 2)).at[6, 6].set(jnp.asarray([8.0, 8.0]))
        off = jnp.zeros((16, 16, 2))
        heads_perfect = {"heatmap": logit[None], "wh": wh[None], "offset": off[None]}
        heads_bad = {
            "heatmap": jnp.full((1, 16, 16, C), 3.0),
            "wh": jnp.zeros((1, 16, 16, 2)),
            "offset": jnp.zeros((1, 16, 16, 2)),
        }
        good = centernet_loss_single(heads_perfect, gt, gl, C)
        bad = centernet_loss_single(heads_bad, gt, gl, C)
        assert float(good["loss"]) < float(bad["loss"])
        assert float(good["loss_wh"]) == pytest.approx(0.0, abs=1e-6)
        assert float(good["loss_offset"]) < 0.2

    def test_jittable(self, rng):
        heads = {
            "heatmap": jnp.asarray(rng.standard_normal((1, 16, 16, C)), jnp.float32),
            "wh": jnp.asarray(rng.standard_normal((1, 16, 16, 2)), jnp.float32),
            "offset": jnp.asarray(rng.standard_normal((1, 16, 16, 2)), jnp.float32),
        }
        gt = jnp.asarray([[8.0, 8.0, 40.0, 40.0], [0, 0, 0, 0]], jnp.float32)
        gl = jnp.asarray([3, -1], jnp.int32)
        out = jax.jit(lambda h, b, l: centernet_loss_single(h, b, l, C))(heads, gt, gl)
        assert np.isfinite(float(out["loss"]))
