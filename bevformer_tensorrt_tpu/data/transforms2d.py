"""2D train-time augmentation: the YOLOX train pipeline in numpy.

TPU-native equivalent of the reference's mmdet pipeline for the 2D family
(configs/yolox/yolox_x_8x8_300e_coco.py:33-52, inherited by the TRT/QAT
configs): Mosaic -> RandomAffine -> MixUp -> YOLOXHSVRandomAug ->
RandomFlip.  Everything operates host-side on raw float32 BGR images in
[0, 255] with xyxy boxes + labels, driven by an explicit
np.random.Generator; normalization/letterboxing happens afterwards in the
dataset (CocoDataset.train_sample).

These run in the dataloader (CPU), not under jit — augmentation is
inherently dynamic-shape work that does not belong on the TPU hot path.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

Boxes = np.ndarray  # [N, 4] xyxy float32
Labels = np.ndarray  # [N] int32


def _affine_warp(img: np.ndarray, mat: np.ndarray, out_h: int, out_w: int,
                 pad_val: float) -> np.ndarray:
    """Nearest-neighbor warp of [H, W, 3] by the 3x3 forward matrix `mat`
    (output = mat @ input coords), matching cv2.warpPerspective's sampling
    direction used by mmdet RandomAffine."""
    inv = np.linalg.inv(mat)
    ys, xs = np.meshgrid(np.arange(out_h), np.arange(out_w), indexing="ij")
    ones = np.ones_like(xs)
    pts = np.stack([xs, ys, ones], axis=0).reshape(3, -1).astype(np.float64)
    src = inv @ pts
    sx = np.round(src[0] / src[2]).astype(np.int64)
    sy = np.round(src[1] / src[2]).astype(np.int64)
    valid = (sx >= 0) & (sx < img.shape[1]) & (sy >= 0) & (sy < img.shape[0])
    out = np.full((out_h * out_w, 3), pad_val, np.float32)
    out[valid] = img[sy[valid], sx[valid]]
    return out.reshape(out_h, out_w, 3)


def _transform_boxes(boxes: Boxes, mat: np.ndarray) -> Boxes:
    """Map xyxy boxes through a 3x3 matrix: transform 4 corners, re-box."""
    if len(boxes) == 0:
        return boxes.reshape(0, 4)
    x1, y1, x2, y2 = boxes.T
    corners = np.stack(
        [np.stack([x1, y1]), np.stack([x2, y1]), np.stack([x1, y2]), np.stack([x2, y2])],
        axis=0,
    )  # [4, 2, N]
    ones = np.ones((4, 1, len(boxes)))
    pts = np.concatenate([corners, ones], axis=1)  # [4, 3, N]
    warped = np.einsum("ij,cjn->cin", mat, pts)
    warped = warped[:, :2] / warped[:, 2:3]
    xs, ys = warped[:, 0], warped[:, 1]
    return np.stack([xs.min(0), ys.min(0), xs.max(0), ys.max(0)], axis=1).astype(
        np.float32
    )


def _filter_boxes(
    boxes: Boxes, labels: Labels, w: int, h: int, min_size: float = 2.0
) -> Tuple[Boxes, Labels]:
    if len(boxes) == 0:
        return boxes.reshape(0, 4), labels
    boxes = boxes.copy()
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
    keep = ((boxes[:, 2] - boxes[:, 0]) > min_size) & (
        (boxes[:, 3] - boxes[:, 1]) > min_size
    )
    return boxes[keep], labels[keep]


@dataclasses.dataclass
class Mosaic:
    """4-image mosaic (mmdet Mosaic, pad_val=114): a 2sx2s canvas with a
    random center; each quadrant holds one image scaled to fit s."""

    img_scale: int = 640
    center_ratio_range: Tuple[float, float] = (0.5, 1.5)
    pad_val: float = 114.0

    def __call__(self, samples, rng: np.random.Generator):
        """samples: list of 4 (img, boxes, labels). Returns (img2s, boxes, labels)."""
        s = self.img_scale
        canvas = np.full((2 * s, 2 * s, 3), self.pad_val, np.float32)
        cx = int(rng.uniform(*self.center_ratio_range) * s)
        cy = int(rng.uniform(*self.center_ratio_range) * s)
        out_boxes, out_labels = [], []
        for loc, (img, boxes, labels) in zip(
            ("tl", "tr", "bl", "br"), samples
        ):
            h, w = img.shape[:2]
            scale = min(s / h, s / w)
            nh, nw = int(h * scale), int(w * scale)
            ys = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
            xs = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
            im = img[ys][:, xs]
            if loc == "tl":
                x1, y1 = max(cx - nw, 0), max(cy - nh, 0)
                x2, y2 = cx, cy
            elif loc == "tr":
                x1, y1 = cx, max(cy - nh, 0)
                x2, y2 = min(cx + nw, 2 * s), cy
            elif loc == "bl":
                x1, y1 = max(cx - nw, 0), cy
                x2, y2 = cx, min(cy + nh, 2 * s)
            else:
                x1, y1 = cx, cy
                x2, y2 = min(cx + nw, 2 * s), min(cy + nh, 2 * s)
            # crop of the scaled image that lands in the quadrant
            cw, ch = x2 - x1, y2 - y1
            if loc in ("tl", "bl"):
                sx1 = nw - cw
            else:
                sx1 = 0
            if loc in ("tl", "tr"):
                sy1 = nh - ch
            else:
                sy1 = 0
            canvas[y1:y2, x1:x2] = im[sy1 : sy1 + ch, sx1 : sx1 + cw]
            if len(boxes):
                b = boxes * scale
                b[:, 0::2] += x1 - sx1
                b[:, 1::2] += y1 - sy1
                b, l = _filter_boxes(b, labels, 2 * s, 2 * s)
                # drop boxes whose center fell outside this quadrant's crop
                cxs = (b[:, 0] + b[:, 2]) / 2
                cys = (b[:, 1] + b[:, 3]) / 2
                inside = (cxs >= x1) & (cxs < x2) & (cys >= y1) & (cys < y2)
                out_boxes.append(b[inside])
                out_labels.append(l[inside])
        boxes = (
            np.concatenate(out_boxes) if out_boxes else np.zeros((0, 4), np.float32)
        )
        labels = (
            np.concatenate(out_labels) if out_labels else np.zeros((0,), np.int32)
        )
        return canvas, boxes, labels


@dataclasses.dataclass
class RandomAffine:
    """mmdet RandomAffine (rotate/scale/shear/translate) with the YOLOX
    overrides scaling_ratio_range=(0.1, 2) and border=(-s/2, -s/2) — the
    border halves the 2sx2s mosaic canvas back to sxs."""

    max_rotate_degree: float = 10.0
    max_translate_ratio: float = 0.1
    scaling_ratio_range: Tuple[float, float] = (0.1, 2.0)
    max_shear_degree: float = 2.0
    border: Tuple[int, int] = (0, 0)
    pad_val: float = 114.0

    def __call__(self, img, boxes, labels, rng: np.random.Generator):
        h = img.shape[0] + self.border[1] * 2
        w = img.shape[1] + self.border[0] * 2
        rot = np.deg2rad(rng.uniform(-self.max_rotate_degree, self.max_rotate_degree))
        scale = rng.uniform(*self.scaling_ratio_range)
        shx = np.deg2rad(rng.uniform(-self.max_shear_degree, self.max_shear_degree))
        shy = np.deg2rad(rng.uniform(-self.max_shear_degree, self.max_shear_degree))
        tx = rng.uniform(0.5 - self.max_translate_ratio, 0.5 + self.max_translate_ratio) * w
        ty = rng.uniform(0.5 - self.max_translate_ratio, 0.5 + self.max_translate_ratio) * h
        c, s = np.cos(rot), np.sin(rot)
        R = np.array([[c * scale, -s * scale, 0], [s * scale, c * scale, 0], [0, 0, 1]])
        Sh = np.array([[1, np.tan(shx), 0], [np.tan(shy), 1, 0], [0, 0, 1]])
        # center the source image at the origin before R/Sh, then translate
        C = np.array([[1, 0, -img.shape[1] / 2], [0, 1, -img.shape[0] / 2], [0, 0, 1]])
        T = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]])
        mat = T @ Sh @ R @ C
        out = _affine_warp(img, mat, h, w, self.pad_val)
        boxes = _transform_boxes(boxes, mat)
        boxes, labels = _filter_boxes(boxes, labels, w, h)
        return out, boxes, labels


@dataclasses.dataclass
class MixUp:
    """mmdet YOLOX MixUp: blend with a second (jitter-scaled, maybe
    flipped) sample at 0.5/0.5; annotations are concatenated."""

    img_scale: int = 640
    ratio_range: Tuple[float, float] = (0.8, 1.6)
    flip_ratio: float = 0.5
    pad_val: float = 114.0

    def __call__(self, img, boxes, labels, other, rng: np.random.Generator):
        oimg, oboxes, olabels = other
        jit = rng.uniform(*self.ratio_range)
        flip = rng.random() < self.flip_ratio
        h, w = oimg.shape[:2]
        scale = min(self.img_scale / h, self.img_scale / w) * jit
        nh, nw = int(h * scale), int(w * scale)
        ys = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
        xs = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
        om = oimg[ys][:, xs]
        ob = oboxes * scale if len(oboxes) else oboxes.reshape(0, 4)
        if flip:
            om = om[:, ::-1]
            if len(ob):
                ob = ob.copy()
                ob[:, [0, 2]] = nw - ob[:, [2, 0]]
        oh, ow = img.shape[:2]
        pasted = np.full((max(oh, nh), max(ow, nw), 3), self.pad_val, np.float32)
        pasted[:nh, :nw] = om
        pasted = pasted[:oh, :ow]
        out = 0.5 * img + 0.5 * pasted
        ob, ol = _filter_boxes(ob, olabels, ow, oh)
        return (
            out.astype(np.float32),
            np.concatenate([boxes, ob]) if len(ob) else boxes,
            np.concatenate([labels, ol]) if len(ol) else labels,
        )


@dataclasses.dataclass
class HSVRandomAug:
    """mmdet YOLOXHSVRandomAug: integer gain jitter of H(+-5)/S(+-30)/V(+-30)
    in the cv2 uint8 HSV space (H in [0,180))."""

    hue_delta: float = 5.0
    saturation_delta: float = 30.0
    value_delta: float = 30.0

    def __call__(self, img, rng: np.random.Generator):
        from .transforms import bgr2hsv, hsv2bgr

        hsv = bgr2hsv(np.clip(img, 0, 255))
        # our HSV: H [0,360), S [0,1], V [0,255]; cv2 uint8 deltas map as
        # H*2 degrees, S/255, V direct
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-self.hue_delta, self.hue_delta) * 2.0) % 360.0
        hsv[..., 1] = np.clip(
            hsv[..., 1] + rng.uniform(-self.saturation_delta, self.saturation_delta) / 255.0,
            0.0, 1.0,
        )
        hsv[..., 2] = np.clip(
            hsv[..., 2] + rng.uniform(-self.value_delta, self.value_delta), 0.0, 255.0
        )
        return hsv2bgr(hsv)


@dataclasses.dataclass
class YoloxTrainAugment:
    """The full YOLOX train pipeline (reference yolox_x_8x8_300e_coco.py:33-52):
    Mosaic(4) -> RandomAffine -> MixUp(1) -> HSV -> flip.  `get_sample(i)`
    must return (raw float32 BGR img, xyxy boxes, labels)."""

    img_scale: int = 640
    enable_mosaic: bool = True
    enable_mixup: bool = True
    flip_ratio: float = 0.5
    seed: int = 0

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)
        self.mosaic = Mosaic(self.img_scale)
        self.affine = RandomAffine(border=(-self.img_scale // 2, -self.img_scale // 2))
        self.mixup = MixUp(self.img_scale)
        self.hsv = HSVRandomAug()

    def __call__(self, i: int, n: int, get_sample):
        rng = self._rng
        if self.enable_mosaic:
            idxs = [i] + [int(rng.integers(n)) for _ in range(3)]
            img, boxes, labels = self.mosaic([get_sample(j) for j in idxs], rng)
            img, boxes, labels = self.affine(img, boxes, labels, rng)
        else:
            img, boxes, labels = get_sample(i)
            img = img.astype(np.float32)
        if self.enable_mixup:
            other = get_sample(int(rng.integers(n)))
            img, boxes, labels = self.mixup(img, boxes, labels, other, rng)
        img = self.hsv(img, rng)
        if rng.random() < self.flip_ratio:
            img = img[:, ::-1].copy()
            if len(boxes):
                boxes = boxes.copy()
                boxes[:, [0, 2]] = img.shape[1] - boxes[:, [2, 0]]
        return img, boxes, labels
