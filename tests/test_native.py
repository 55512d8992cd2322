"""Native C++ kernel tests: build, parity with the numpy implementations."""
import numpy as np
import pytest

from bevformer_tensorrt_tpu import native
from bevformer_tensorrt_tpu.core.nms import nms_rotated, rotated_iou_bev


@pytest.fixture(scope="module")
def nms_lib():
    lib = native._nms_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


class TestNativeNMS:
    def test_iou_matrix_matches_numpy(self, nms_lib, rng):
        a = np.zeros((6, 5), np.float32)
        a[:, :2] = rng.uniform(-5, 5, (6, 2))
        a[:, 2:4] = rng.uniform(1, 4, (6, 2))
        a[:, 4] = rng.uniform(-np.pi, np.pi, 6)
        b = a[rng.permutation(6)][:4]
        m = native.rotated_iou_matrix_native(a, b)
        ref = np.array([[rotated_iou_bev(x, y) for y in b] for x in a])
        np.testing.assert_allclose(m, ref, atol=1e-5)

    def test_nms_matches_numpy(self, nms_lib, rng):
        n = 60
        boxes = np.zeros((n, 5), np.float32)
        boxes[:, :2] = rng.uniform(-20, 20, (n, 2))
        boxes[:, 2:4] = rng.uniform(1, 5, (n, 2))
        boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        kn = sorted(native.nms_rotated_native(boxes, scores, 0.3).tolist())
        kp = sorted(nms_rotated(boxes, scores, 0.3).tolist())
        assert kn == kp


class TestNativeImagePipeline:
    def test_matches_numpy_path(self, rng):
        imgs = rng.integers(0, 255, (2, 90, 160, 3), dtype=np.uint8)
        mean = (123.675, 116.28, 103.53)
        std = (58.395, 57.12, 57.375)
        out = native.normalize_pad_chw_native(imgs, 96, 160, mean, std, to_rgb=True)
        assert out.shape == (2, 3, 96, 160)
        # reference: python path
        from bevformer_tensorrt_tpu.data.nuscenes import ImgNorm, normalize_image

        ref = normalize_image(imgs[0], ImgNorm(mean, std, True))
        np.testing.assert_allclose(out[0, :, :90], ref.transpose(2, 0, 1), atol=1e-4)
        assert np.all(out[:, :, 90:] == 0)  # padded rows

    def test_no_rgb_swap(self, rng):
        imgs = rng.integers(0, 255, (1, 8, 8, 3), dtype=np.uint8)
        mean = (103.530, 116.280, 123.675)
        std = (1.0, 1.0, 1.0)
        out = native.normalize_pad_chw_native(imgs, 8, 8, mean, std, to_rgb=False)
        ref = imgs[0].astype(np.float32) - np.asarray(mean)
        np.testing.assert_allclose(out[0], ref.transpose(2, 0, 1), atol=1e-4)
