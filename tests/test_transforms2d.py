"""2D train-pipeline augmentation tests (data/transforms2d.py): geometric
correctness of the box bookkeeping under mosaic/affine/mixup/flip, and the
CocoDataset.train_sample input-space contract."""
import json

import numpy as np
import pytest

from bevformer_tensorrt_tpu.data.transforms2d import (
    HSVRandomAug,
    MixUp,
    Mosaic,
    RandomAffine,
    YoloxTrainAugment,
    _filter_boxes,
    _transform_boxes,
)


def _img_with_box(h, w, box, val):
    """Image of zeros with `val` inside `box` (xyxy)."""
    img = np.zeros((h, w, 3), np.float32)
    x1, y1, x2, y2 = [int(v) for v in box]
    img[y1:y2, x1:x2] = val
    return img


def test_transform_boxes_identity_and_scale():
    boxes = np.array([[2.0, 3.0, 10.0, 8.0]], np.float32)
    eye = np.eye(3)
    np.testing.assert_allclose(_transform_boxes(boxes, eye), boxes)
    scale = np.diag([2.0, 0.5, 1.0])
    out = _transform_boxes(boxes, scale)
    np.testing.assert_allclose(out, [[4.0, 1.5, 20.0, 4.0]])


def test_mosaic_places_boxes_consistently():
    s = 64
    rng = np.random.default_rng(0)
    # each source image has one box whose interior is a unique constant
    samples = []
    for k in range(4):
        box = np.array([[10.0, 12.0, 30.0, 28.0]], np.float32)
        samples.append(
            (_img_with_box(48, 56, box[0], 50 + k), box, np.array([k], np.int32))
        )
    img, boxes, labels = Mosaic(img_scale=s)(samples, rng)
    assert img.shape == (2 * s, 2 * s, 3)
    assert len(boxes) == len(labels) <= 4
    # every surviving box's interior must contain its source constant
    for b, l in zip(boxes, labels):
        x1, y1, x2, y2 = [int(round(v)) for v in b]
        patch = img[y1:y2, x1:x2, 0]
        assert patch.size > 0
        inside = (patch == 50 + l).mean()
        assert inside > 0.5, (l, b, inside)


def test_random_affine_pure_scale_maps_boxes():
    s = 64
    img = _img_with_box(2 * s, 2 * s, (40, 40, 88, 88), 200.0)
    boxes = np.array([[40.0, 40.0, 88.0, 88.0]], np.float32)
    labels = np.array([1], np.int32)
    aff = RandomAffine(
        max_rotate_degree=0.0,
        max_translate_ratio=0.0,
        scaling_ratio_range=(1.0, 1.0),
        max_shear_degree=0.0,
        border=(-s // 2, -s // 2),
    )
    out, b, l = aff(img, boxes, labels, np.random.default_rng(0))
    assert out.shape == (s, s, 3)
    # identity R/Sh at scale 1: source center (64,64) -> output center (32,32)
    np.testing.assert_allclose(b, [[8.0, 8.0, 56.0, 56.0]], atol=1.0)
    x1, y1, x2, y2 = [int(round(v)) for v in b[0]]
    assert (out[y1 + 2 : y2 - 2, x1 + 2 : x2 - 2, 0] == 200.0).all()


def test_mixup_blends_and_concats():
    s = 32
    img = np.full((s, s, 3), 100.0, np.float32)
    boxes = np.array([[1.0, 1.0, 5.0, 5.0]], np.float32)
    labels = np.array([0], np.int32)
    other_img = np.full((s, s, 3), 200.0, np.float32)
    oboxes = np.array([[4.0, 4.0, 20.0, 20.0]], np.float32)
    olabels = np.array([2], np.int32)
    mu = MixUp(img_scale=s, ratio_range=(1.0, 1.0), flip_ratio=0.0)
    out, b, l = mu(img, boxes, labels, (other_img, oboxes, olabels), np.random.default_rng(0))
    np.testing.assert_allclose(out, 150.0)
    assert len(b) == 2 and set(l.tolist()) == {0, 2}


def test_hsv_bounded_and_shape():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    out = HSVRandomAug()(img, rng)
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    assert out.min() >= -1e-3 and out.max() <= 300.0


def test_yolox_train_augment_end_to_end_deterministic():
    n = 6
    rng = np.random.default_rng(3)
    imgs = [
        (
            rng.uniform(0, 255, (40 + 4 * k, 48, 3)).astype(np.float32),
            np.array([[5.0, 5.0, 25.0, 30.0]], np.float32),
            np.array([k % 3], np.int32),
        )
        for k in range(n)
    ]
    aug_a = YoloxTrainAugment(img_scale=64, seed=11)
    aug_b = YoloxTrainAugment(img_scale=64, seed=11)
    ia, ba, la = aug_a(0, n, lambda j: imgs[j])
    ib, bb, lb = aug_b(0, n, lambda j: imgs[j])
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(ba, bb)
    assert ia.shape[2] == 3 and len(ba) == len(la)
    if len(ba):
        assert (ba[:, 2] > ba[:, 0]).all() and (ba[:, 3] > ba[:, 1]).all()
        assert ba.min() >= 0 and ba[:, 0::2].max() <= ia.shape[1]


def _tiny_coco(tmp_path):
    rng = np.random.default_rng(0)
    imgs = []
    (tmp_path / "imgs").mkdir()
    records, anns = [], []
    for i in range(3):
        arr = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
        from PIL import Image

        Image.fromarray(arr).save(tmp_path / "imgs" / f"{i}.png")
        records.append({"id": i, "file_name": f"{i}.png", "height": 50, "width": 70})
        anns.append(
            {"id": i, "image_id": i, "category_id": 7, "bbox": [10, 8, 30, 20],
             "iscrowd": 0, "area": 600}
        )
    ann = {
        "images": records,
        "annotations": anns,
        "categories": [{"id": 7, "name": "thing"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    return p, tmp_path / "imgs"


def test_train_sample_input_space(tmp_path):
    from bevformer_tensorrt_tpu.data.coco import CocoDataset

    ann, root = _tiny_coco(tmp_path)
    ds = CocoDataset(ann, root, img_size=32)
    img, boxes, labels = ds.train_sample(0, None)
    assert img.shape == (3, 32, 32)
    # original 70x50 -> scale 32/70; gt [10,8,40,28] scaled
    s = 32 / 70
    np.testing.assert_allclose(boxes, [[10 * s, 8 * s, 40 * s, 28 * s]], rtol=1e-5)
    assert labels.tolist() == [0]
    # eval path still reports original coords
    smp = ds.sample(0)
    assert smp.gt[0]["bbox"] == [10, 8, 40, 28]

    # augmented path keeps the contract: input-space, in-bounds
    aug = YoloxTrainAugment(img_scale=32, seed=5)
    img2, b2, l2 = ds.train_sample(0, aug)
    assert img2.shape == (3, 32, 32)
    if len(b2):
        assert b2.min() >= 0 and b2.max() <= 32
