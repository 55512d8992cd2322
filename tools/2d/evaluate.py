"""Evaluate the 2D family (YOLOX / CenterNet) on COCO (mAP + FPS).

TPU-native equivalent of tools/2d/evaluate_{pth,trt}.py in the reference
(batch-N inference, configs/yolox/yolox_x_8x8_300e_coco_trt.py:32-44).

Usage:
  python tools/2d/evaluate.py yolox_x --ann instances_val2017.json \
      --img-root val2017 [--batch 32] [--limit N]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["yolox_x", "yolox_s", "yolox_micro", "centernet_r18", "centernet_micro"])
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-root", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--quant-scales", default=None,
                    help="PTQ scale-dict checkpoint (tools/2d/calibrate.py)")
    ap.add_argument("--quant", default="int8", choices=["qdq", "int8"],
                    help="with --quant-scales: 'qdq' fake-quant simulation, "
                    "'int8' real int8 matmuls/convs (deploy path)")
    ap.add_argument("--quant-exclude", action="append", default=None,
                    help="mixed precision: site substrings kept in fp; "
                    "defaults to the policy persisted next to --quant-scales")
    args = ap.parse_args()

    import jax

    from bevformer_tensorrt_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()  # persistent cache: skip remote recompiles
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.data.coco import CocoDataset
    from bevformer_tensorrt_tpu.evalsuite import evaluate_coco_map
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint

    quant = False
    exclude = ()
    if args.quant_scales:
        quant = "int8" if args.quant == "int8" else True
        from bevformer_tensorrt_tpu.quant.policy import load_policy

        exclude = (
            tuple(p for p in args.quant_exclude if p)
            if args.quant_exclude is not None
            else load_policy(args.quant_scales)
        )
        if exclude:
            print(f"mixed precision: excluding {exclude}", file=sys.stderr)

    if args.model.startswith("yolox"):
        from bevformer_tensorrt_tpu.configs import yolox as ycfg
        from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX
        from bevformer_tensorrt_tpu.models.heads.yolox_head import (
            yolox_decode,
            yolox_post_process,
        )

        cfg = getattr(ycfg, args.model)(
            dtype=args.dtype, quant=quant, quant_exclude=exclude
        )
        model = YOLOX(cfg)
        ds = CocoDataset(args.ann, args.img_root, img_size=cfg.img_size)

        def infer(variables, imgs):
            outs = model.apply(variables, imgs)
            return yolox_decode(outs)

        def post(decoded, i, sample):
            boxes, scores = decoded
            b, s, l = yolox_post_process(
                np.asarray(boxes[i]), np.asarray(scores[i]),
                cfg.score_thr, cfg.nms_iou, cfg.max_per_img,
            )
            return b / sample.scale, s, l
    else:
        from bevformer_tensorrt_tpu.configs import centernet as ccfg
        from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet
        from bevformer_tensorrt_tpu.models.heads.centernet_head import centernet_decode

        # honor the requested tier (this used to hardcode centernet_r18,
        # silently evaluating centernet_micro at the r18 config)
        cfg = getattr(ccfg, args.model)(
            dtype=args.dtype, quant=quant, quant_exclude=exclude
        )
        model = CenterNet(cfg)
        ds = CocoDataset(
            args.ann, args.img_root, img_size=cfg.img_size,
            mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375), to_rgb=True,
        )

        def infer(variables, imgs):
            heads = model.apply(variables, imgs)
            return centernet_decode(heads, k=cfg.topk, kernel=cfg.local_max_kernel)

        def post(decoded, i, sample):
            boxes, scores, labels = decoded
            keep = np.asarray(scores[i]) > 0.01
            return (
                np.asarray(boxes[i])[keep] / sample.scale,
                np.asarray(scores[i])[keep],
                np.asarray(labels[i])[keep],
            )

    B = args.batch
    imgs0 = jnp.zeros((B, 3, cfg.img_size, cfg.img_size), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs0)
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        family = "yolox" if args.model.startswith("yolox") else "centernet"
        variables = load_variables(args.checkpoint, variables, family=family, cfg=cfg)
        variables = jax.device_put(variables)  # pin on device: jit re-uploads host trees every call
    if args.quant_scales:
        from bevformer_tensorrt_tpu.quant.fold import attach_quant_scales

        # re-fold int8 weights from THIS checkpoint's params (the scale
        # artifact's folded weights are stale for a QAT-finetuned model)
        scales = load_checkpoint(args.quant_scales)
        variables = attach_quant_scales(variables, scales["quant"])
        variables = jax.device_put(variables)
    infer_jit = jax.jit(infer)

    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    gt_all, pred_all = [], []
    lat = []
    # pipelined batches: dispatch batch b+1 (async) before the host
    # readback + per-image post of batch b, overlapping host decode with
    # device execution (same pattern as tools/bevformer/evaluate.py)
    def finish(pending):
        samples, decoded = pending
        for i, sm in enumerate(samples):
            b, sc, l = post(decoded, i, sm)
            gt_all.extend(sm.gt)
            pred_all.extend(
                {"image_id": sm.image_id, "category_id": int(li), "bbox": bi.tolist(), "score": float(si)}
                for bi, si, li in zip(b, sc, l)
            )

    pending = None
    t_last = time.perf_counter()
    for s in range(0, n, B):
        samples = [ds.sample(i) for i in range(s, min(s + B, n))]
        batch = np.zeros((B, 3, cfg.img_size, cfg.img_size), np.float32)
        for i, sm in enumerate(samples):
            batch[i] = sm.image
        decoded = infer_jit(variables, jnp.asarray(batch))
        if pending is not None:
            finish(pending)
            now = time.perf_counter()
            lat.append((now - t_last) / len(pending[0]))
            t_last = now
        pending = (samples, decoded)
    if pending is not None:
        finish(pending)
        lat.append((time.perf_counter() - t_last) / len(pending[0]))

    num_classes = cfg.num_classes
    metrics = evaluate_coco_map(gt_all, pred_all, num_classes)
    l = lat[1:] if len(lat) > 1 else lat
    metrics["fps"] = 1.0 / float(np.mean(l))
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
