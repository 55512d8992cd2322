"""Generate a tiny synthetic COCO-format detection dataset (json + PNGs).

2D-family analogue of make_synthetic_nuscenes.py: colored rectangles on a
noise background, one category per color, annotations in the COCO
instances layout consumed by data/coco.py::CocoDataset.  The point is the
end-to-end accuracy cycle (train -> fp eval -> PTQ -> int8 eval) at the
micro tiers on CPU — an overfit-able set with a learnable color->class
mapping, not scene realism.

Usage: python tools/make_synthetic_coco.py <out_dir> [--images 64] [--size 96]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

# category colors (BGR-ish triples painted into the RGB png directly)
COLORS = [(220, 40, 40), (40, 200, 40), (40, 60, 220)]
NAMES = ["red_box", "green_box", "blue_box"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=96, help="max image side")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    rng = np.random.default_rng(args.seed)
    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(args.images):
        h = int(rng.integers(args.size * 2 // 3, args.size + 1))
        w = int(rng.integers(args.size * 2 // 3, args.size + 1))
        img = rng.integers(90, 130, (h, w, 3)).astype(np.uint8)
        for _ in range(int(rng.integers(1, 4))):
            cat = int(rng.integers(0, len(COLORS)))
            bw = int(rng.integers(h // 6, h // 2))
            bh = int(rng.integers(h // 6, h // 2))
            x = int(rng.integers(0, max(w - bw, 1)))
            y = int(rng.integers(0, max(h - bh, 1)))
            img[y : y + bh, x : x + bw] = np.asarray(COLORS[cat], np.uint8)
            annotations.append({
                "id": ann_id,
                "image_id": i,
                "category_id": cat + 1,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh),
                "iscrowd": 0,
            })
            ann_id += 1
        name = f"{i:05d}.png"
        Image.fromarray(img).save(out / "images" / name)
        images.append({"id": i, "file_name": name, "width": w, "height": h})

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": c + 1, "name": n} for c, n in enumerate(NAMES)
        ],
    }
    with open(out / "instances_synthetic.json", "w") as f:
        json.dump(coco, f)
    print(f"{out}/instances_synthetic.json: {len(images)} images, "
          f"{len(annotations)} boxes, {len(NAMES)} categories")


if __name__ == "__main__":
    main()
