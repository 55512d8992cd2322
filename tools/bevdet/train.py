"""Train / QAT-finetune BEVDet on nuScenes.

TPU-native equivalent of the reference's mmdet3d-driven BEVDet trainer
(bev_mmdet3d train APIs + configs/bevdet/bevdet-r50-cbgs.py): one jitted
step — backbone->LSS->BEV encoder->CenterHead forward, gaussian-focal
heatmap + code-weighted L1 criterion (train/losses_bevdet.py), AdamW.
The pooling ranks come from the first frame's camera rig exactly like the
deploy engine (tools/bevdet/pth2onnx.py:60-97 bakes one rig).

QAT = --quant-scales <calib.msgpack>: QDQ fake-quant sites active at the
calibrated scales with a tiny lr (the reference's 1-epoch QAT recipe).

Usage:
  python tools/bevdet/train.py --infos nuscenes_infos_train.pkl \
      --data-root data/nuscenes --steps 5000 [--quant-scales scales.msgpack]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

MAX_GT = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="r50", choices=["r50", "micro"])
    ap.add_argument("--infos", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--quant-scales", default=None, help="enable QAT with these scales")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument(
        "--lr", type=float, default=None,
        help="peak lr (default 2e-4; QAT default 1e-6 — the reference's "
        "1-epoch tiny-lr recipe; an explicit --lr overrides both)",
    )
    ap.add_argument("--ranks-pad", type=int, default=400000)
    ap.add_argument(
        "--pool-impl", default="interval", choices=["scatter", "interval"],
    )
    ap.add_argument("--out", default="checkpoints/bevdet.msgpack")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--limit", type=int, default=None,
                    help="restrict to the first N frames (overfit runs)")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from bevformer_tensorrt_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import optax

    from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro, bevdet_r50
    from bevformer_tensorrt_tpu.data.nuscenes import IMG_NORM_PYTORCH, NuScenesFrames
    from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet
    from bevformer_tensorrt_tpu.models.necks.view_transformer import (
        get_lidar_coor,
        voxel_pooling_prepare,
    )
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
    from bevformer_tensorrt_tpu.train.losses_bevdet import bevdet_loss_single

    qat = args.quant_scales is not None
    mk = bevdet_micro if args.model == "micro" else bevdet_r50
    cfg = mk(quant=qat)
    model = BEVDet(cfg)

    frames = NuScenesFrames(
        args.infos, args.data_root, img_norm=IMG_NORM_PYTORCH,
        target_hw=(cfg.input_h, cfg.input_w),
    )
    n_frames = len(frames) if args.limit is None else min(args.limit, len(frames))

    # rig ranks from the first frame (deploy-engine convention)
    info0 = frames.infos[0]
    cams = list(info0["cams"].values())
    s2e = np.stack([
        np.block([
            [np.asarray(c["sensor2lidar_rotation"], np.float64),
             np.asarray(c["sensor2lidar_translation"], np.float64)[:, None]],
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
    rd, rf, rb = (jnp.asarray(ranks.ranks_depth), jnp.asarray(ranks.ranks_feat),
                  jnp.asarray(ranks.ranks_bev))
    iv = (
        (jnp.asarray(ranks.interval_starts), jnp.asarray(ranks.interval_lengths))
        if use_iv else (None, None)
    )

    dummy = jnp.zeros((1, cfg.num_cams, 3, cfg.input_h, cfg.input_w), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, rd, rf, rb, *iv)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        ckpt = load_variables(
            args.checkpoint, {"params": params, **extra}, family="bevdet", cfg=cfg
        )
        params = ckpt["params"]
        extra = {k: v for k, v in ckpt.items() if k != "params"}
    if qat:
        extra["quant"] = load_checkpoint(args.quant_scales)["quant"]

    lr = args.lr if args.lr is not None else (1e-6 if qat else 2e-4)
    warmup = min(500, max(1, args.steps // 5))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(args.steps, warmup + 1))
    tx = optax.chain(optax.clip_by_global_norm(35.0),
                     optax.adamw(sched, weight_decay=1e-2))
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        heads = model.apply(
            {"params": params, **extra}, batch["image"], rd, rf, rb, *iv
        )
        li = bevdet_loss_single(cfg, heads, batch["gt_boxes"], batch["gt_labels"])
        return li["loss"], (li["loss_heatmap"], li["loss_bbox"], li["num_pos"])

    @jax.jit
    def step_fn(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def batch_iter():
        idx = np.arange(n_frames)
        rng = np.random.default_rng(0)
        while True:
            rng.shuffle(idx)
            for i in idx:
                f = frames.frame(int(i))
                gb = np.zeros((MAX_GT, 9), np.float32)
                gl = np.full(MAX_GT, -1, np.int32)
                n = 0 if f.gt_boxes is None else min(len(f.gt_boxes), MAX_GT)
                if n:
                    gb[:n] = f.gt_boxes[:n]
                    gl[:n] = f.gt_labels[:n]
                yield {
                    "image": f.image.astype(np.float32),
                    "gt_boxes": gb,
                    "gt_labels": gl,
                }

    it = batch_iter()
    t0 = time.perf_counter()
    for step in range(args.steps):
        params, opt_state, loss, (lh, lb, npos) = step_fn(params, opt_state, next(it))
        if step % args.log_every == 0:
            dt = time.perf_counter() - t0
            print(
                f"step {step}: loss {float(loss):.4f} (hm {float(lh):.4f} "
                f"bbox {float(lb):.4f}) num_pos {float(npos):.0f} "
                f"({dt / (step + 1):.2f}s/step)",
                file=sys.stderr, flush=True,
            )
    save_checkpoint(args.out, {"params": params, **extra})
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
