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

    def sample(self, i: int) -> CocoSample:
        from .nuscenes import load_image

        info = self.images[self.ids[i]]
        img = load_image(str(self.img_root / info["file_name"]))  # BGR HWC
        h, w = img.shape[:2]
        scale = min(self.img_size / h, self.img_size / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        # nearest resize (keep_ratio) + pad to square — YOLOX eval pipeline
        ys = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
        xs = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
        resized = img[ys][:, xs]
        canvas = np.full((self.img_size, self.img_size, 3), 114.0, np.float32)
        canvas[:nh, :nw] = resized
        if self.to_rgb:
            canvas = canvas[..., ::-1]
        canvas = (canvas - self.mean) / self.std
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
            image=canvas.transpose(2, 0, 1).astype(np.float32),
            scale=scale,
            orig_hw=(h, w),
            gt=gts,
        )
