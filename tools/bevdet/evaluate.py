"""Evaluate BEVDet on nuScenes (NDS/mAP + FPS).

TPU-native equivalent of tools/bevdet/evaluate_{pth,trt}.py in the
reference: rank tensors come precomputed from the camera rig (the engine
bakes one rig's ranks, tools/bevdet/pth2onnx.py:60-97).

Usage:
  python tools/bevdet/evaluate.py --infos val.pkl --data-root ... \
      [--checkpoint ckpt.msgpack] [--limit N]
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
    ap.add_argument("--model", default="r50", choices=["r50", "micro"])
    ap.add_argument("--infos", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--ranks-pad", type=int, default=400000)
    ap.add_argument(
        "--pool-impl", default="interval", choices=["scatter", "interval"],
        help="bev_pool formulation (ops/bev_pool.py): 'interval' = cumsum "
        "splat over sorted ranks (TPU-friendly)",
    )
    ap.add_argument("--quant-scales", default=None, help="PTQ scale-dict checkpoint")
    ap.add_argument(
        "--quant", default="qdq", choices=["qdq", "int8"],
        help="with --quant-scales: 'qdq' simulates quantization (fake-quant), "
        "'int8' runs real int8 matmuls/convs (reference bevdet evaluate_trt)",
    )
    args = ap.parse_args()

    import jax

    from bevformer_tensorrt_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()  # persistent cache: skip remote recompiles
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro, bevdet_r50
    from bevformer_tensorrt_tpu.data.nuscenes import IMG_NORM_PYTORCH, NuScenesFrames
    from bevformer_tensorrt_tpu.evalsuite import (
        detections_to_eval_boxes,
        evaluate_nuscenes,
        gt_to_eval_boxes,
    )
    from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet
    from bevformer_tensorrt_tpu.models.heads.centerpoint_head import centerpoint_post_process
    from bevformer_tensorrt_tpu.models.necks.view_transformer import (
        get_lidar_coor,
        voxel_pooling_prepare,
    )
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint

    quant = False
    if args.quant_scales:
        quant = "int8" if args.quant == "int8" else True
    mk = bevdet_micro if args.model == "micro" else bevdet_r50
    cfg = mk(dtype=args.dtype, quant=quant)
    model = BEVDet(cfg)
    frames = NuScenesFrames(
        args.infos, args.data_root, img_norm=IMG_NORM_PYTORCH,
        target_hw=(cfg.input_h, cfg.input_w),
    )

    # ranks from the first frame's rig (reference bakes one sample's ranks)
    info0 = frames.infos[0]
    cams = list(info0["cams"].values())
    s2e = np.stack([
        np.block([
            [np.asarray(c["sensor2lidar_rotation"], np.float64), np.asarray(c["sensor2lidar_translation"], np.float64)[:, None]],
            [np.zeros((1, 3)), np.ones((1, 1))],
        ])
        for c in cams
    ]).astype(np.float32)
    intr = np.stack([np.asarray(c["cam_intrinsic"], np.float32) for c in cams])
    coor = get_lidar_coor(cfg, s2e, intr)
    use_iv = args.pool_impl == "interval"
    gz = int(round((cfg.grid_zbound[1] - cfg.grid_zbound[0]) / cfg.grid_zbound[2]))
    ranks = voxel_pooling_prepare(
        cfg, coor, pad_to=args.ranks_pad,
        pad_intervals_to=cfg.bev_h * cfg.bev_w * gz if use_iv else None,
    )
    rd, rf, rb = (jnp.asarray(ranks.ranks_depth), jnp.asarray(ranks.ranks_feat), jnp.asarray(ranks.ranks_bev))
    iv = (
        (jnp.asarray(ranks.interval_starts), jnp.asarray(ranks.interval_lengths))
        if use_iv else (None, None)
    )

    dummy = jnp.zeros((1, cfg.num_cams, 3, cfg.input_h, cfg.input_w), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, rd, rf, rb, *iv)
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        variables = load_variables(args.checkpoint, variables, family="bevdet", cfg=cfg)
        variables = jax.device_put(variables)  # pin on device: jit re-uploads host trees every call
    if args.quant_scales:
        scales = load_checkpoint(args.quant_scales)
        from bevformer_tensorrt_tpu.quant.fold import attach_quant_scales

        # re-fold int8 weights from THIS checkpoint's params (the scale
        # artifact's folded weights are stale for a QAT-finetuned model)
        variables = attach_quant_scales(variables, scales["quant"])

    apply_fn = jax.jit(lambda v, img: model.apply(v, img, rd, rf, rb, *iv))

    gt_all, pred_all = [], []
    lat = []
    n = len(frames) if args.limit is None else min(args.limit, len(frames))

    # pipelined: dispatch frame i+1 (async) before the host readback +
    # CenterPoint decode of frame i, overlapping host post-process with
    # device execution (same pattern as tools/bevformer/evaluate.py)
    def finish(pending):
        f, heads = pending
        det = centerpoint_post_process(cfg, heads)
        pred_all.extend(detections_to_eval_boxes(f.sample_token, det))
        gt_all.extend(gt_to_eval_boxes(f.sample_token, f.gt_boxes, f.gt_labels))

    pending = None
    t_last = time.perf_counter()
    for i in range(n):
        f = frames.frame(i)
        heads = apply_fn(variables, jnp.asarray(f.image))
        if pending is not None:
            finish(pending)
            now = time.perf_counter()
            lat.append(now - t_last)
            t_last = now
        pending = (f, heads)
    if pending is not None:
        finish(pending)
        lat.append(time.perf_counter() - t_last)

    metrics = evaluate_nuscenes(gt_all, pred_all, verbose=True)
    l = lat[1:-1] if len(lat) > 2 else lat
    metrics["fps"] = 1.0 / float(np.mean(l))
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
