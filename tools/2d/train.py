"""Train / QAT-finetune the 2D family (YOLOX / CenterNet) on COCO.

TPU-native equivalent of the reference's mmdet-driven 2D trainer
(tools/2d/train.py:1-272 + configs/yolox/yolox_x_8x8_300e_coco_trt_q.py,
configs/centernet/..._trt_q.py): one jitted step — forward, SimOTA /
gaussian-focal criterion (train/losses2d.py), AdamW — over a dp mesh.
QAT = --quant-scales <calib.msgpack> (QDQ fake-quant sites active at the
calibrated scales, tiny lr, the reference's 1-epoch recipe).

Usage:
  python tools/2d/train.py yolox_s --ann instances_train2017.json \
      --img-root train2017 --steps 1000 [--quant-scales scales.msgpack]
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
    ap.add_argument("model", choices=["yolox_x", "yolox_s", "yolox_micro", "centernet_r18", "centernet_micro"])
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-root", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--quant-scales", default=None, help="enable QAT with these scales")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument(
        "--lr", type=float, default=None,
        help="peak lr (default 1e-4; QAT default 1e-6, the reference's "
        "1-epoch tiny-lr recipe — an explicit --lr overrides both)",
    )
    ap.add_argument("--out", default="checkpoints/2d.msgpack")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument(
        "--no-augment",
        action="store_true",
        help="disable the train pipeline augmentation (YOLOX: mosaic/"
        "affine/mixup/hsv/flip, reference yolox_x_8x8_300e_coco.py:33-52; "
        "CenterNet: hsv/flip only)",
    )
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from bevformer_tensorrt_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()  # persistent cache: skip remote recompiles

    import jax.numpy as jnp
    import optax

    from bevformer_tensorrt_tpu.data.coco import CocoDataset
    from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
    from bevformer_tensorrt_tpu.train.losses2d import (
        centernet_loss_single,
        yolox_loss_single,
    )

    qat = args.quant_scales is not None
    is_yolox = args.model.startswith("yolox")
    if is_yolox:
        from bevformer_tensorrt_tpu.configs import yolox as ycfg
        from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX

        cfg = getattr(ycfg, args.model)(quant=qat)
        model = YOLOX(cfg)
    else:
        from bevformer_tensorrt_tpu.configs import centernet as ccfg
        from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet

        cfg = getattr(ccfg, args.model)(quant=qat)
        model = CenterNet(cfg)

    if is_yolox:
        ds = CocoDataset(args.ann, args.img_root, img_size=cfg.img_size)
    else:
        # CenterNet trains on the mmdet pipeline's ImageNet-normalized RGB
        # (configs/centernet/centernet_resnet18_140e_coco.py img_norm_cfg) —
        # MUST match calibrate/evaluate, which already normalize this way:
        # an r5 cycle trained raw-BGR and evaluated ImageNet-RGB read
        # mAP 0.0 from a converged model
        ds = CocoDataset(
            args.ann, args.img_root, img_size=cfg.img_size,
            mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375),
            to_rgb=True,
        )
    nc = cfg.num_classes
    augment = None
    if not args.no_augment:
        from bevformer_tensorrt_tpu.data.transforms2d import YoloxTrainAugment

        # CenterNet's reference pipeline has no mosaic/mixup — keep hsv+flip
        augment = YoloxTrainAugment(
            img_scale=cfg.img_size,
            enable_mosaic=is_yolox,
            enable_mixup=is_yolox,
        )

    dummy = jnp.zeros((args.batch, 3, cfg.img_size, cfg.img_size), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    if args.checkpoint:
        from bevformer_tensorrt_tpu.runtime.torch_import import load_variables

        family = "yolox" if args.model.startswith("yolox") else "centernet"
        ckpt = load_variables(
            args.checkpoint, {"params": params, **extra}, family=family, cfg=cfg
        )
        params = ckpt["params"]
        extra = {k: v for k, v in ckpt.items() if k != "params"}
    if qat:
        extra["quant"] = load_checkpoint(args.quant_scales)["quant"]

    # reference QAT recipe: tiny-lr fine-tune; explicit --lr overrides
    lr = args.lr if args.lr is not None else (1e-6 if qat else 1e-4)
    tx = optax.chain(optax.clip_by_global_norm(35.0), optax.adamw(lr, weight_decay=1e-4))
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        outs = model.apply({"params": params, **extra}, batch["image"])
        total = 0.0
        npos = 0.0
        for i in range(args.batch):
            if is_yolox:
                li = yolox_loss_single(
                    outs, batch["gt_boxes"][i], batch["gt_labels"][i], nc, img_idx=i
                )
            else:
                li = centernet_loss_single(
                    outs, batch["gt_boxes"][i], batch["gt_labels"][i], nc,
                    stride=4, img_idx=i,
                )
            total = total + li["loss"]
            npos = npos + li["num_pos"]
        return total / args.batch, npos

    @jax.jit
    def step_fn(params, opt_state, batch):
        (loss, npos), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, npos

    def batch_iter():
        idx = np.arange(len(ds))
        rng = np.random.default_rng(0)
        while True:
            rng.shuffle(idx)
            for s in range(0, len(idx) - args.batch + 1, args.batch):
                imgs, gbs, gls = [], [], []
                for i in idx[s : s + args.batch]:
                    # train_sample returns gt in MODEL-INPUT coordinates
                    # (letterbox scale applied) — the loss matches against
                    # input-space grid priors
                    img, boxes, labels = ds.train_sample(int(i), augment)
                    gb = np.zeros((MAX_GT, 4), np.float32)
                    gl = np.full(MAX_GT, -1, np.int32)
                    n = min(len(boxes), MAX_GT)
                    gb[:n] = boxes[:n]
                    gl[:n] = labels[:n]
                    imgs.append(img)
                    gbs.append(gb)
                    gls.append(gl)
                yield {
                    "image": np.stack(imgs),
                    "gt_boxes": np.stack(gbs),
                    "gt_labels": np.stack(gls),
                }

    it = batch_iter()
    t0 = time.perf_counter()
    for step in range(args.steps):
        params, opt_state, loss, npos = step_fn(params, opt_state, next(it))
        if step % args.log_every == 0:
            dt = time.perf_counter() - t0
            print(
                f"step {step}: loss {float(loss):.4f} num_pos {float(npos):.0f} "
                f"({dt / (step + 1):.2f}s/step)",
                file=sys.stderr,
            )
    save_checkpoint(args.out, {"params": params})
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
