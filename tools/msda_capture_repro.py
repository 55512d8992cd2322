"""Capture REAL in-model MSDA kernel operands and replay them standalone.

The BENCH_r04 int8 kernel fault is data-dependent (prev_bev=zeros runs,
real prev_bev faults) and bisects to the temporal self-attention int8
tables (tools/device_op_check.py --exclude runs).  Synthetic inputs at the
same shapes do NOT reproduce it — so this tool extracts the exact operands
the model feeds the kernel:

  capture:  run the base int8 model with `self_attn/msda_tables` excluded
            (bf16 TSA tables -> no crash; the KERNEL INPUTS are identical
            to the crashing config because the exclusion only changes the
            packing downstream of them), with mutable=['intermediates'] so
            the attention modules' sow() records (v_t, ref_t, off_t,
            attn_t) per layer; save each to <dir>/tsa<i>.npz / sca<i>.npz.
  replay:   feed one captured operand set into the standalone sorted
            kernel with int8 packing on the device.

Usage:
  python tools/msda_capture_repro.py capture --dir /tmp/msda_caps
  python tools/msda_capture_repro.py replay --dir /tmp/msda_caps --layer tsa0
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SS_BEV = ((200, 200),)
SS_IMG = ((116, 200), (58, 100), (29, 50), (15, 25))


def capture(out_dir: Path, exclude=("self_attn/msda_tables",),
            prev_bev_file=None, save_bev0=None, run_only=False):
    """Build the base int8 model with `exclude` patterns, run0 (prev_bev =
    zeros -> bev0), then the capture run with prev_bev = bev0 or the pinned
    `prev_bev_file` (bit-exactness across configs), recording every sorted
    MSDA call's operands via mutable=['intermediates'].

    run_only=True skips the capture pass (crash probing: the second run is
    a plain apply, so a worker fault surfaces as JaxRuntimeError)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from flax import traverse_util

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from bevformer_tensorrt_tpu.quant.fold import fold_int8_weights
    from tools.geometry_analysis import nuscenes_like_rig

    cfg = cfgs.bevformer_base(
        dtype="bfloat16", quant="int8", quant_exclude=tuple(exclude),
    )
    print(f"quant_exclude={exclude}", file=sys.stderr, flush=True)
    model = BEVFormer(cfg)
    nq = cfg.bev_h * cfg.bev_w
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)), jnp.float32
    )
    pb0 = jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32)
    can_bus = jnp.asarray(rng.standard_normal(cfg.can_bus_dims), jnp.float32)
    l2i = nuscenes_like_rig(cfg.img_w, cfg.img_h)[: cfg.num_cams]
    lidar2img = jnp.asarray(l2i.reshape(1, cfg.num_cams, 4, 4).astype(np.float32))

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), image, pb0, jnp.float32(0.0), can_bus, lidar2img
    )
    _, mut = jax.jit(
        lambda v, *a: model.apply(v, *a, mutable=["amax_stats"])
    )(variables, image, pb0, jnp.float32(1.0), can_bus, lidar2img)
    flat = traverse_util.flatten_dict(
        jax.tree.map(lambda a: jnp.maximum(a, 1e-6) / 127.0, mut["amax_stats"])
    )
    flat = {p[:-1] + ("scale",): vv for p, vv in flat.items()}
    variables = {**variables, "quant": traverse_util.unflatten_dict(flat)}
    variables = fold_int8_weights(variables)

    fn = jax.jit(lambda v, *a: model.apply(v, *a))
    t0 = time.perf_counter()
    bev0, cls0, _ = fn(variables, image, pb0, jnp.float32(1.0), can_bus, lidar2img)
    np.asarray(cls0[-1, 0, 0, 0])
    print(f"run0 OK in {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    if save_bev0:
        np.save(save_bev0, np.asarray(bev0, dtype=np.float32))
        print(f"saved bev0 -> {save_bev0}", file=sys.stderr, flush=True)
    pb1 = (
        jnp.asarray(np.load(prev_bev_file), jnp.float32)
        if prev_bev_file else bev0
    )

    if run_only:
        t0 = time.perf_counter()
        _, cls1, _ = fn(variables, image, pb1, jnp.float32(1.0), can_bus, lidar2img)
        np.asarray(cls1[-1, 0, 0, 0])
        print(f"run1 OK in {time.perf_counter() - t0:.1f}s (no crash)",
              file=sys.stderr, flush=True)
        return

    cap = jax.jit(
        lambda v, *a: model.apply(v, *a, mutable=["intermediates"])
    )
    t0 = time.perf_counter()
    _, inter = cap(variables, image, pb1, jnp.float32(1.0), can_bus, lidar2img)
    jax.block_until_ready(inter)
    print(f"capture run OK in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    flat_i = traverse_util.flatten_dict(inter["intermediates"])
    out_dir.mkdir(parents=True, exist_ok=True)
    for path, vals in flat_i.items():
        p = "/".join(path)
        if "msda_in" not in p:
            continue
        kind = "tsa" if "self_attn" in p else "sca"
        import re

        m = re.search(r"layers?_?(\d+)", p)
        layer = m.group(1) if m else "x"
        v_t, ref_t, off_t, attn_t = vals[0]
        np.savez(
            out_dir / f"{kind}{layer}.npz",
            v=np.asarray(v_t, dtype=np.float32),
            ref=np.asarray(ref_t, dtype=np.float32),
            off=np.asarray(off_t, dtype=np.float32),
            attn=np.asarray(attn_t, dtype=np.float32),
        )
        print(f"saved {kind}{layer}: v{v_t.shape} ref{ref_t.shape} "
              f"off{off_t.shape} attn{attn_t.shape}", file=sys.stderr, flush=True)


def capture_crash(out_dir: Path):
    """Run the CRASHING config (full int8, no exclusions) with an ordered
    io_callback saving every sorted-MSDA call's operands to host BEFORE the
    kernel executes.  When the worker faults at call k, calls <= k are
    already on disk bit-exact — the file count names the faulting call, and
    replaying the last file standalone either reproduces the fault or
    proves it context-dependent."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from flax import traverse_util

    import bevformer_tensorrt_tpu.models.modules.attention as attn_mod
    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from bevformer_tensorrt_tpu.quant.fold import fold_int8_weights
    from tools.geometry_analysis import nuscenes_like_rig

    out_dir.mkdir(parents=True, exist_ok=True)
    run_tag = ["r0"]

    def save_cb(idx, v, r, o, a):
        idx = int(idx)
        np.savez(out_dir / f"{run_tag[0]}_call{idx:02d}.npz",
                 v=np.asarray(v, np.float32), ref=np.asarray(r, np.float32),
                 off=np.asarray(o, np.float32), attn=np.asarray(a, np.float32))
        print(f"saved {run_tag[0]}_call{idx:02d} v{v.shape}",
              file=sys.stderr, flush=True)

    orig = attn_mod.multi_scale_deformable_attn_sorted_qm_diff
    counter = [0]

    def wrapper(v_t, ref_t, off_t, attn_t, *args, **kw):
        idx = counter[0]
        counter[0] += 1
        jax.experimental.io_callback(
            save_cb, None, jnp.int32(idx), v_t, ref_t, off_t, attn_t,
            ordered=True,
        )
        return orig(v_t, ref_t, off_t, attn_t, *args, **kw)

    attn_mod.multi_scale_deformable_attn_sorted_qm_diff = wrapper
    try:
        cfg = cfgs.bevformer_base(dtype="bfloat16", quant="int8")
        model = BEVFormer(cfg)
        nq = cfg.bev_h * cfg.bev_w
        rng = np.random.default_rng(0)
        image = jnp.asarray(
            rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)),
            jnp.float32,
        )
        pb0 = jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32)
        can_bus = jnp.asarray(rng.standard_normal(cfg.can_bus_dims), jnp.float32)
        l2i = nuscenes_like_rig(cfg.img_w, cfg.img_h)[: cfg.num_cams]
        lidar2img = jnp.asarray(l2i.reshape(1, cfg.num_cams, 4, 4).astype(np.float32))

        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), image, pb0, jnp.float32(0.0), can_bus, lidar2img
        )
        _, mut = jax.jit(
            lambda v, *a: model.apply(v, *a, mutable=["amax_stats"])
        )(variables, image, pb0, jnp.float32(1.0), can_bus, lidar2img)
        flat = traverse_util.flatten_dict(
            jax.tree.map(lambda a: jnp.maximum(a, 1e-6) / 127.0, mut["amax_stats"])
        )
        flat = {p[:-1] + ("scale",): vv for p, vv in flat.items()}
        variables = {**variables, "quant": traverse_util.unflatten_dict(flat)}
        variables = fold_int8_weights(variables)

        fn = jax.jit(lambda v, *a: model.apply(v, *a))
        t0 = time.perf_counter()
        bev0, cls0, _ = fn(variables, image, pb0, jnp.float32(1.0), can_bus, lidar2img)
        np.asarray(cls0[-1, 0, 0, 0])
        print(f"run0 OK in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        run_tag[0] = "r1"
        t0 = time.perf_counter()
        bev1, cls1, _ = fn(variables, image, bev0, jnp.float32(1.0), can_bus, lidar2img)
        np.asarray(cls1[-1, 0, 0, 0])
        print(f"run1 OK in {time.perf_counter() - t0:.1f}s (no crash!)",
              file=sys.stderr, flush=True)
    finally:
        attn_mod.multi_scale_deformable_attn_sorted_qm_diff = orig


def replay(out_dir: Path, layer: str, packed="int8"):
    """--layer tsa0|sca3|...: one standalone kernel call.
    --layer chain: all captured tsa+sca operand sets in ONE jit program,
    back-to-back (the in-model sequence — catches cross-call interactions a
    single pallas_call can't)."""
    import jax
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.ops.msda import (
        multi_scale_deformable_attn_sorted_qm,
        multi_scale_deformable_attn_sorted_qm_diff,
    )

    pk = {"int8": "int8", "bf16": True, "f32": False}[packed]
    if layer == "chain":
        sets = []
        for i in range(6):
            for kind, ss in (("tsa", SS_BEV), ("sca", SS_IMG)):
                f = out_dir / f"{kind}{i}.npz"
                if f.exists():
                    d = np.load(f)
                    sets.append((f"{kind}{i}", ss, (
                        jnp.asarray(d["v"], jnp.bfloat16), jnp.asarray(d["ref"]),
                        jnp.asarray(d["off"]), jnp.asarray(d["attn"]),
                    )))

        @jax.jit
        def run_all(ops):
            outs = []
            for (name, ss, (v, r, o, a)), op in zip(sets, ops):
                outs.append(multi_scale_deformable_attn_sorted_qm_diff(
                    op[0], op[1], op[2], op[3], ss, num_heads=8, packed=pk,
                    out_dtype=jnp.bfloat16,
                ).sum())
            return jnp.stack(outs)

        t0 = time.perf_counter()
        out = np.asarray(run_all([s[2] for s in sets]))
        print(f"REPLAY_OK chain({len(sets)} calls) packed={packed} in "
              f"{time.perf_counter()-t0:.1f}s finite={np.isfinite(out).all()}",
              flush=True)
        return

    d = np.load(out_dir / f"{layer}.npz")
    ss = SS_BEV if layer.startswith("tsa") else SS_IMG
    t0 = time.perf_counter()
    out = multi_scale_deformable_attn_sorted_qm(
        jnp.asarray(d["v"], jnp.bfloat16), jnp.asarray(d["ref"]),
        jnp.asarray(d["off"]), jnp.asarray(d["attn"]), ss, num_heads=8,
        packed=pk, out_dtype=jnp.float32,
    )
    out = np.asarray(out)
    print(f"REPLAY_OK {layer} packed={packed} in {time.perf_counter()-t0:.1f}s "
          f"finite={np.isfinite(out).all()}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["capture", "capture_crash", "replay"])
    ap.add_argument("--dir", default="/tmp/msda_caps")
    ap.add_argument("--layer", default="tsa0")
    ap.add_argument("--packed", default="int8", choices=["int8", "bf16", "f32"])
    ap.add_argument("--exclude", action="append", default=[])
    ap.add_argument("--prev-bev", default=None,
                    help="pinned prev_bev .npy for the second run")
    ap.add_argument("--save-bev0", default=None,
                    help="save run0's bev output here")
    ap.add_argument("--run-only", action="store_true",
                    help="plain second run, no capture (crash probing)")
    args = ap.parse_args()
    if args.phase == "capture":
        capture(Path(args.dir), exclude=tuple(args.exclude),
                prev_bev_file=args.prev_bev, save_bev0=args.save_bev0,
                run_only=args.run_only)
    elif args.phase == "capture_crash":
        capture_crash(Path(args.dir))
    else:
        replay(Path(args.dir), args.layer, args.packed)


if __name__ == "__main__":
    main()
