"""COCO-format 2D detection dataset (self-contained json parsing).

Replaces the reference's mmdet CocoDataset dependency for the 2D family
(configs/yolox, configs/centernet): parses instances_*.json directly,
serves letterboxed/padded images, converts annotations to xyxy.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class CocoSample:
    image_id: str
    image: np.ndarray       # [3, H, W] float32 (normalized, padded)
    scale: float            # model-input / original
    orig_hw: Tuple[int, int]
    gt: List[dict]          # [{category_id (contiguous), bbox xyxy}]


class CocoDataset:
    def __init__(
        self,
        ann_file: str | Path,
        img_root: str | Path,
        img_size: int = 640,
        mean=(0.0, 0.0, 0.0),
        std=(1.0, 1.0, 1.0),
        to_rgb: bool = False,
    ):
        with open(ann_file) as f:
            coco = json.load(f)
        self.images = {im["id"]: im for im in coco["images"]}
        self.img_root = Path(img_root)
        self.img_size = img_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb
        # contiguous category mapping (COCO ids are sparse)
        cats = sorted(c["id"] for c in coco.get("categories", []))
        self.cat_to_label = {c: i for i, c in enumerate(cats)}
        self.anns: Dict[int, List[dict]] = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            self.anns.setdefault(a["image_id"], []).append(a)
        self.ids = [im["id"] for im in coco["images"]]

    def __len__(self) -> int:
        return len(self.ids)

    def raw(self, i: int):
        """(float32 BGR HWC image, xyxy boxes [N,4] f32, labels [N] i32) in
        ORIGINAL image coordinates — the augmentation-pipeline contract
        (data/transforms2d.py)."""
        from .nuscenes import load_image

        info = self.images[self.ids[i]]
        img = load_image(str(self.img_root / info["file_name"])).astype(np.float32)
        boxes, labels = [], []
        for a in self.anns.get(self.ids[i], []):
            x, y, bw, bh = a["bbox"]
            boxes.append([x, y, x + bw, y + bh])
            labels.append(self.cat_to_label[a["category_id"]])
        return (
            img,
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int32).reshape(-1),
        )

    def _letterbox(self, img: np.ndarray):
        """Nearest keep-ratio resize + 114-pad to square (the YOLOX
        letterbox).  Returns (canvas HWC float32 raw-BGR, scale)."""
        h, w = img.shape[:2]
        scale = min(self.img_size / h, self.img_size / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        ys = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
        xs = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
        canvas = np.full((self.img_size, self.img_size, 3), 114.0, np.float32)
        canvas[:nh, :nw] = img[ys][:, xs]
        return canvas, scale

    def _normalize(self, canvas: np.ndarray) -> np.ndarray:
        if self.to_rgb:
            canvas = canvas[..., ::-1]
        canvas = (canvas - self.mean) / self.std
        return canvas.transpose(2, 0, 1).astype(np.float32)

    def train_sample(self, i: int, augment=None):
        """Training view: normalized letterboxed image + gt in MODEL-INPUT
        coordinates (the loss matches predictions against input-space grid
        priors, so targets must live there too — unlike CocoSample.gt,
        which keeps original coords for COCO eval).  `augment` is a
        YoloxTrainAugment (mosaic/affine/mixup/hsv/flip) or None."""
        if augment is not None:
            img, boxes, labels = augment(i, len(self), self.raw)
        else:
            img, boxes, labels = self.raw(i)
        canvas, scale = self._letterbox(img)
        boxes = boxes * scale
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, self.img_size)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, self.img_size)
        keep = ((boxes[:, 2] - boxes[:, 0]) > 1) & ((boxes[:, 3] - boxes[:, 1]) > 1)
        return self._normalize(canvas), boxes[keep], labels[keep]

    def sample(self, i: int) -> CocoSample:
        from .nuscenes import load_image

        info = self.images[self.ids[i]]
        img = load_image(str(self.img_root / info["file_name"]))  # BGR HWC
        h, w = img.shape[:2]
        # nearest resize (keep_ratio) + pad to square — YOLOX eval pipeline
        canvas, scale = self._letterbox(img.astype(np.float32))
        gts = []
        for a in self.anns.get(self.ids[i], []):
            x, y, bw, bh = a["bbox"]
            gts.append(
                {
                    "image_id": str(self.ids[i]),
                    "category_id": self.cat_to_label[a["category_id"]],
                    "bbox": [x, y, x + bw, y + bh],
                }
            )
        return CocoSample(
            image_id=str(self.ids[i]),
            image=self._normalize(canvas),
            scale=scale,
            orig_hw=(h, w),
            gt=gts,
        )
