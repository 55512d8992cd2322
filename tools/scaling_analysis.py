"""Per-collective communication attribution of the sharded train step +
an analytical 2-host scaling model (VERDICT r3 item 9: a scaling story
beyond "structure ok").

What it does:
  1. jit-lowers the FULL dp x tp training step on an 8-device virtual mesh
     (same path as __graft_entry__.dryrun_multichip) and walks the OPTIMIZED
     HLO for collectives (all-reduce / all-gather / reduce-scatter /
     collective-permute), classifying each by mesh axis from its
     replica_groups stride (tp = consecutive device ids, dp = strided).
  2. Prices each collective with the standard ring model
     (time = bytes x (g-1)/g / bw, 2x for all-reduce) on the axis's
     interconnect: tp rides ICI inside a host, dp rides DCN across the
     2 hosts of the north-star deployment.
  3. Prices compute from XLA's own cost analysis (flops) at an assumed
     MFU, and reports the expected 2-host efficiency with and without
     comm/compute overlap (grad all-reduce overlaps the backward pass;
     only the post-backward tail is exposed).

The byte counts are exact (from the compiled HLO); the times are a model —
stated as such in the artifact.  Bandwidth constants are the public v5e
numbers (ICI 2D torus ~45 GB/s/link/direction x 4 links; DCN ~25 GB/s/host,
jax-ml.github.io/scaling-book).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/scaling_analysis.py [--dp 2 --tp 4] [--out SCALING_r4.json]
"""
from __future__ import annotations

import argparse
import collections
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ICI_BW = 4 * 45e9          # bytes/s per chip (4 links x ~45 GB/s, v5e torus)
DCN_BW = 25e9              # bytes/s per host (data-center network)
PEAK_BF16 = 197e12         # v5e bf16 FLOP/s
ASSUMED_MFU = 0.30         # stated model assumption for the compute term

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}


def parse_collectives(hlo: str, tp: int):
    """Walk optimized HLO text; return per-collective rows with exact bytes
    and the mesh axis inferred from replica_groups."""
    rows = []
    pat = re.compile(
        r"%?(\S+)\s*=\s*(\([^)]*\)|\S+)\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(?:-start)?\(", )
    shape_pat = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|s64|u64|f64)\[([\d,]*)\]")
    group_pat = re.compile(r"replica_groups=\{?\{([\d,]+)\}")
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m or "-done" in m.group(1):
            continue
        kind = m.group(3)
        bytes_total = 0
        for dt, dims in shape_pat.findall(m.group(2)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bytes_total += n * DTYPE_BYTES[dt]
        gm = group_pat.search(line)
        axis, gsize = "unknown", 0
        if gm:
            ids = [int(x) for x in gm.group(1).split(",")]
            gsize = len(ids)
            if len(ids) >= 2:
                stride = ids[1] - ids[0]
                axis = "tp" if stride == 1 else "dp"
        else:
            # iota format: replica_groups=[G,S]<=[...] (optionally T(perm));
            # a transpose means strided groups (the dp axis of a dp x tp
            # mesh laid out dp-major), plain iota means consecutive (tp)
            im = re.search(r"replica_groups=\[(\d+),(\d+)\]<=\[([^\]]*)\](T\([^)]*\))?", line)
            if im:
                gsize = int(im.group(2))
                axis = "dp" if im.group(4) else "tp"
                # full-mesh groups (S == dp*tp) span both axes: the ring
                # crosses hosts, price as dp
                dims = [int(x) for x in im.group(3).split(",") if x]
                if gsize == int(np.prod(dims)):
                    axis = "dp+tp"
        sp = re.search(r"source_target_pairs=\{(.+?)\}\}", line)
        if kind == "collective-permute" and sp:
            axis, gsize = "pp/ring", 2
        rows.append({"kind": kind, "axis": axis, "group": gsize,
                     "bytes": bytes_total})
    return rows


def ring_time(kind, bytes_, g, bw):
    """Standard ring-collective cost (scaling-book §collectives)."""
    if g <= 1:
        return 0.0
    if kind == "all-reduce":
        return 2 * bytes_ * (g - 1) / g / bw
    return bytes_ * (g - 1) / g / bw      # all-gather / reduce-scatter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--out", default="SCALING_r4.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from bevformer_tensorrt_tpu.parallel import make_mesh
    from bevformer_tensorrt_tpu.parallel.sharding import param_shardings
    from bevformer_tensorrt_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    n = args.dp * args.tp
    devs = jax.devices()[:n]
    mesh = make_mesh(devs, dp=args.dp, tp=args.tp)
    cfg = bevformer_micro()
    model = BEVFormer(cfg)
    tx = make_optimizer(total_steps=100)
    params, batch_stats, opt_state = init_train_state(
        model, jax.random.PRNGKey(0), cfg, tx
    )
    params = jax.device_put(params, param_shardings(mesh, params))
    batch_stats = jax.device_put(
        batch_stats, jax.tree.map(lambda _: NamedSharding(mesh, P()), batch_stats)
    )

    B, max_gt = args.dp, 8
    rng = np.random.default_rng(0)
    l2i = np.tile(np.eye(4, dtype=np.float32), (B, 1, cfg.num_cams, 1, 1))
    l2i[..., 0, 0] = l2i[..., 1, 1] = cfg.img_w / 2.0
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((B, cfg.num_cams, 3, cfg.img_h, cfg.img_w)),
            jnp.float32,
        ),
        "can_bus": jnp.zeros((B, cfg.can_bus_dims), jnp.float32),
        "lidar2img": jnp.asarray(l2i),
        "gt_boxes": jnp.zeros((B, max_gt, 9), jnp.float32),
        "gt_labels": jnp.zeros((B, max_gt), jnp.int32),
    }
    batch = jax.device_put(
        batch,
        jax.tree.map(
            lambda x: NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))), batch
        ),
    )

    step = make_train_step(model, cfg.num_classes, tx)
    compiled = jax.jit(step, donate_argnums=(0, 2)).lower(
        params, batch_stats, opt_state, batch
    ).compile()
    hlo = compiled.as_text()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    rows = parse_collectives(hlo, args.tp)
    agg = collections.defaultdict(lambda: {"count": 0, "bytes": 0})
    for r in rows:
        k = (r["kind"], r["axis"])
        agg[k]["count"] += 1
        agg[k]["bytes"] += r["bytes"]

    # --- 2-host model: dp axis crosses hosts (DCN), tp stays on-host (ICI).
    t_tp = sum(
        ring_time(r["kind"], r["bytes"], r["group"], ICI_BW)
        for r in rows if r["axis"] in ("tp", "pp/ring")
    )
    t_dp = sum(
        ring_time(r["kind"], r["bytes"], max(r["group"], 2), DCN_BW)
        for r in rows if r["axis"] in ("dp", "dp+tp", "unknown")
    )
    # per-device compute: flops is whole-program (already partitioned by
    # GSPMD? cost_analysis reports the per-module estimate -> treat as
    # per-device work at this dp x tp)
    t_compute = flops / (PEAK_BF16 * ASSUMED_MFU)
    eff_no_overlap = t_compute / (t_compute + t_tp + t_dp) if t_compute else 0.0
    # overlap model: the dp grad all-reduce overlaps the backward pass
    # (exposed tail ~ 20%); tp psums sit on the critical path.
    t_dp_exposed = 0.2 * t_dp
    eff_overlap = (
        t_compute / (t_compute + t_tp + t_dp_exposed) if t_compute else 0.0
    )

    # --- base-tier projection: the micro step is communication-dominated by
    # construction (15 GFLOP of compute vs the full gradient tree), which
    # says nothing about the deployment target.  Project the SAME per-byte
    # model onto the base tier: grads = param bytes (one dp all-reduce per
    # step), compute = 3x the forward FLOPs (tools/flops_params.py r2:
    # 3.76 TFLOP/frame).
    from bevformer_tensorrt_tpu.configs.bevformer import bevformer_base

    cfg_b = bevformer_base()
    model_b = BEVFormer(cfg_b)
    nq_b = cfg_b.bev_h * cfg_b.bev_w
    vars_b = jax.eval_shape(
        model_b.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg_b.num_cams, 3, cfg_b.img_h, cfg_b.img_w), jnp.float32),
        jnp.zeros((nq_b, 1, cfg_b.embed_dims), jnp.float32),
        jnp.float32(0.0),
        jnp.zeros(cfg_b.can_bus_dims, jnp.float32),
        jnp.zeros((1, cfg_b.num_cams, 4, 4), jnp.float32),
    )
    param_bytes = sum(
        int(np.prod(x.shape)) * 4 for x in jax.tree.leaves(vars_b["params"])
    )
    fwd_flops = 3.76e12  # per frame, tools/flops_params.py (r2 artifact)
    t_comp_b = 3 * fwd_flops / (PEAK_BF16 * ASSUMED_MFU)
    t_dp_b = ring_time("all-reduce", param_bytes, 2, DCN_BW)
    base_proj = {
        "param_bytes": param_bytes,
        "train_flops_per_frame": 3 * fwd_flops,
        "t_compute_s": round(t_comp_b, 5),
        "t_dp_dcn_s": round(t_dp_b, 5),
        "efficiency_no_overlap": round(t_comp_b / (t_comp_b + t_dp_b), 4),
        "efficiency_with_overlap": round(
            t_comp_b / (t_comp_b + 0.2 * t_dp_b), 4
        ),
        "note": "base tier, batch 1/host, 2 hosts dp over DCN: the gradient "
        "all-reduce is the only cross-host traffic and overlaps the "
        "backward pass — the micro numbers above are comm-dominated only "
        "because the micro model has ~250x less compute per step",
    }

    table = [
        {"kind": k, "axis": a, **v} for (k, a), v in sorted(agg.items())
    ]
    rec = {
        "mesh": f"dp{args.dp}xtp{args.tp}",
        "model": "micro train step (same path as dryrun_multichip)",
        "collectives": table,
        "total_comm_bytes": int(sum(r["bytes"] for r in rows)),
        "flops_per_step": flops,
        "model_2host": {
            "assumptions": {
                "ici_bw_Bps": ICI_BW, "dcn_bw_Bps": DCN_BW,
                "peak_bf16_flops": PEAK_BF16, "mfu": ASSUMED_MFU,
                "dp_overlap_exposed_fraction": 0.2,
                "note": "byte counts exact from compiled HLO; times are a "
                "ring-model projection, dp crosses hosts over DCN",
            },
            "t_compute_s": t_compute,
            "t_tp_ici_s": t_tp,
            "t_dp_dcn_s": t_dp,
            "efficiency_no_overlap": round(eff_no_overlap, 4),
            "efficiency_with_overlap": round(eff_overlap, 4),
        },
        "base_tier_projection_2host": base_proj,
    }
    Path(args.out).write_text(json.dumps(rec, indent=1))
    for t in table:
        print(f"{t['kind']:20s} {t['axis']:8s} x{t['count']:3d} "
              f"{t['bytes'] / 1e6:9.2f} MB", file=sys.stderr)
    print(json.dumps({k: v for k, v in rec.items() if k != "collectives"}))


if __name__ == "__main__":
    main()
