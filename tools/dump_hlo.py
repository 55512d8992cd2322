"""Dump the compiled program text for inspection.

The reference inspects its exported graphs with netron
(tools/onnx_visualization.py); with no ONNX in the loop the artifact to
inspect is the (Stable)HLO.  Usage:
  python tools/dump_hlo.py [tiny|micro|...] [--stage stablehlo|optimized] [--out f.txt]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="micro")
    ap.add_argument("--stage", default="stablehlo", choices=["stablehlo", "optimized"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, cfg.num_cams, 1, 1))),
    )
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), *inputs)
    lowered = jax.jit(lambda v, *a: model.apply(v, *a)).lower(variables, *inputs)
    text = (
        lowered.as_text()
        if args.stage == "stablehlo"
        else lowered.compile().as_text()
    )
    if args.out:
        Path(args.out).write_text(text)
        print(f"wrote {len(text)} chars -> {args.out}")
    else:
        print(text[:20000])


if __name__ == "__main__":
    main()
