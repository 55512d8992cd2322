"""Model FLOPs / parameter counting via XLA's own cost analysis.

TPU-native equivalent of tools/flops_params.py in the reference (which walks
modules with thop hooks; here the compiled HLO reports exact flops).

Usage: python tools/flops_params.py [tiny|small|base|bevdet|yolox|centernet]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def count_params(params) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="tiny")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.model in ("tiny", "small", "base", "micro"):
        from bevformer_tensorrt_tpu.configs import bevformer as cfgs
        from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer

        cfg = getattr(cfgs, f"bevformer_{args.model}")()
        model = BEVFormer(cfg)
        nq = cfg.bev_h * cfg.bev_w
        inputs = (
            jnp.zeros((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w), jnp.float32),
            jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32),
            jnp.float32(0.0),
            jnp.zeros(cfg.can_bus_dims, jnp.float32),
            jnp.zeros((1, cfg.num_cams, 4, 4), jnp.float32),
        )
    elif args.model == "yolox":
        from bevformer_tensorrt_tpu.configs.yolox import yolox_x
        from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX

        cfg = yolox_x()
        model = YOLOX(cfg)
        inputs = (jnp.zeros((1, 3, cfg.img_size, cfg.img_size), jnp.float32),)
    elif args.model == "centernet":
        from bevformer_tensorrt_tpu.configs.centernet import centernet_r18
        from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet

        cfg = centernet_r18()
        model = CenterNet(cfg)
        inputs = (jnp.zeros((1, 3, cfg.img_size, cfg.img_size), jnp.float32),)
    else:
        raise SystemExit(f"unknown model {args.model}")

    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), *inputs)
    n_params = count_params(variables["params"])

    lowered = jax.jit(lambda v, *a: model.apply(v, *a)).lower(variables, *inputs)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    print(f"model: {args.model}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops:  {flops / 1e9:.2f} GFLOPs/frame")


if __name__ == "__main__":
    main()
