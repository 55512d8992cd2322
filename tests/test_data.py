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
