"""Data-layer sampler tests (CBGS class-balanced resampling)."""
import numpy as np
import pytest


class TestCBGS:
    def test_balances_rare_classes(self):
        from bevformer_tensorrt_tpu.data.sampler import cbgs_indices

        # class 0 common (90 frames), class 1 rare (10 frames)
        frames = [[0] for _ in range(90)] + [[1] for _ in range(10)]
        idx = cbgs_indices(frames, num_classes=2, seed=0)
        rare = np.sum(idx >= 90)
        common = np.sum(idx < 90)
        # mmdet3d CBGS: each class resampled to ~duplicated/num_classes
        assert rare == pytest.approx(50, abs=10)
        assert common == pytest.approx(50, abs=10)

    def test_empty_and_multilabel(self):
        from bevformer_tensorrt_tpu.data.sampler import cbgs_indices

        assert len(cbgs_indices([[], []], 3)) == 2  # no labels -> identity
        idx = cbgs_indices([[0, 1], [0], [0], [0]], 2, seed=1)
        assert set(idx) <= {0, 1, 2, 3}
        assert np.sum(idx == 0) >= 1  # the only class-1 frame is boosted


# ------------------------------------------------------- train transforms ---
class TestTrainTransforms:
    def test_hsv_roundtrip(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (16, 24, 3)).astype(np.float32)
        from bevformer_tensorrt_tpu.data.transforms import bgr2hsv, hsv2bgr

        back = hsv2bgr(bgr2hsv(img))
        np.testing.assert_allclose(back, img, atol=1e-3)

    def test_photometric_identity_bounds_and_determinism(self):
        from bevformer_tensorrt_tpu.data.transforms import PhotoMetricDistortion

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (12, 18, 3)).astype(np.float32)
        pm = PhotoMetricDistortion()
        a = pm(img.copy(), np.random.default_rng(7))
        b = pm(img.copy(), np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)  # seeded rng -> reproducible
        assert a.shape == img.shape and a.dtype == np.float32
        # brightness/contrast envelope: |out| bounded by 1.5*(255+32)
        assert np.abs(a).max() <= 1.5 * (255 + 32) + 1e-3

    def test_resize_bilinear_matches_torch(self):
        import torch
        import torch.nn.functional as F

        from bevformer_tensorrt_tpu.data.transforms import resize_bilinear

        rng = np.random.default_rng(1)
        img = rng.standard_normal((10, 14, 3)).astype(np.float32)
        out = resize_bilinear(img, 7, 9)
        ref = F.interpolate(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            size=(7, 9), mode="bilinear", align_corners=False,
        )[0].numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_random_scale_updates_lidar2img(self):
        from bevformer_tensorrt_tpu.data.transforms import RandomScaleImage

        rng = np.random.default_rng(2)
        imgs = [np.zeros((40, 60, 3), np.float32)]
        l2i = np.diag([2.0, 3.0, 1.0, 1.0]).astype(np.float32)[None]
        sc = RandomScaleImage(scales=[0.5])
        out, l2 = sc(imgs, l2i, rng)
        assert out[0].shape == (20, 30, 3)
        # scale_factor @ l2i scales the first two rows (transform_3d.py:427)
        np.testing.assert_allclose(l2[0, 0, 0], 1.0)
        np.testing.assert_allclose(l2[0, 1, 1], 1.5)
        # projected pixel coordinates scale with the image
        p = np.array([3.0, 5.0, 1.0, 1.0], np.float32)
        before = (l2i[0] @ p)[:2]
        after = (l2[0] @ p)[:2]
        np.testing.assert_allclose(after, 0.5 * before)

    def test_nuscenes_frames_with_augment(self, tmp_path):
        """NuScenesFrames(augment=...) keeps the frame contract: static
        shapes, finite values, lidar2img consistent with the applied scale."""
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        synth = tmp_path / "synth"
        subprocess.run(
            [sys.executable, str(repo / "tools/make_synthetic_nuscenes.py"),
             str(synth), "--frames", "2", "--cams", "2",
             "--width", "160", "--height", "96"],
            check=True, capture_output=True,
        )
        from bevformer_tensorrt_tpu.data.nuscenes import NuScenesFrames
        from bevformer_tensorrt_tpu.data.transforms import (
            MultiViewTrainAugment,
            RandomScaleImage,
        )

        aug = MultiViewTrainAugment(scale=RandomScaleImage(scales=[0.5]), seed=3)
        fr = NuScenesFrames(
            synth / "nuscenes_infos_synthetic.pkl", synth,
            target_hw=(96, 160), augment=aug,
        )
        plain = NuScenesFrames(
            synth / "nuscenes_infos_synthetic.pkl", synth, target_hw=(96, 160)
        )
        a, p = fr.frame(0), plain.frame(0)
        assert a.image.shape == p.image.shape  # static model input preserved
        assert np.isfinite(a.image).all()
        # 0.5 downscale halves the projective rows of lidar2img
        np.testing.assert_allclose(a.lidar2img[0, :, :2], 0.5 * p.lidar2img[0, :, :2], rtol=1e-5)
        # augmented pixels differ from the clean pipeline
        assert np.abs(a.image - p.image).max() > 1e-3


    def test_nuscenes_frames_fused_loader_matches_numpy_chain(self, tmp_path):
        """The eval fast path (csrc/image_pipeline.cpp fused
        normalize+pad+CHW, wired when augment is None) must be numerically
        identical to the reference numpy chain it replaced
        (normalize_image -> pad_to_divisor -> grow/crop -> CHW)."""
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        synth = tmp_path / "synth"
        subprocess.run(
            [sys.executable, str(repo / "tools/make_synthetic_nuscenes.py"),
             str(synth), "--frames", "2", "--cams", "2",
             "--width", "160", "--height", "96"],
            check=True, capture_output=True,
        )
        from bevformer_tensorrt_tpu.data.nuscenes import (
            IMG_NORM_PYTORCH,
            NuScenesFrames,
            load_image,
            normalize_image,
            pad_to_divisor,
        )

        # target LARGER than the images in one dim and non-divisible by 32
        # in the other exercises both the pad and the crop branches
        th, tw = 100, 192
        fr = NuScenesFrames(
            synth / "nuscenes_infos_synthetic.pkl", synth,
            img_norm=IMG_NORM_PYTORCH, target_hw=(th, tw),
        )
        f = fr.frame(0)
        info = fr.infos[0]
        imgs = []
        for cam in info["cams"].values():
            img = load_image(fr._resolve(cam["data_path"])).astype(np.float32)
            img = pad_to_divisor(normalize_image(img, IMG_NORM_PYTORCH))
            if img.shape[0] < th or img.shape[1] < tw:
                grown = np.zeros(
                    (max(th, img.shape[0]), max(tw, img.shape[1]), 3), img.dtype
                )
                grown[: img.shape[0], : img.shape[1]] = img
                img = grown
            imgs.append(img[:th, :tw].transpose(2, 0, 1))
        ref = np.stack(imgs)[None]
        assert f.image.shape == ref.shape
        np.testing.assert_allclose(f.image, ref, atol=2e-4)
