"""On-device per-op test harness — every Pallas kernel x precision at real
deploy shapes, with adversarial data, each case in its own subprocess.

The reference runs every plugin x precision against the built engine on
hardware (tools/test_trt_ops.py:1-11, det2trt/models/utils/test_trt_ops/
base_test_case.py:8-195); the CPU pytest suite runs the same kernels only in
interpret mode, where device-only failures (Mosaic kernel faults, OOB DMAs)
are invisible.  This tool closes that gap: it exercises each kernel variant
at the shapes the models actually deploy, with data distributions chosen to
stress data-dependent control flow (panel sweeps driven by sampling
locations), and survives a TPU worker crash in any one case because every
case runs in a disposable subprocess.

Usage:
  python tools/device_op_check.py                 # all cases x all data modes
  python tools/device_op_check.py --cases msda_tsa_int8 --data wild
  python tools/device_op_check.py --run msda_tsa_int8 --data wild  # in-proc

Data modes:
  normal   unit-scale inputs, oracle compare vs the jnp MSDA path
  wild     offsets x200 (taps far outside every level), refs in [-0.5, 1.5],
           saturated logits, value x1e4 — the iteration-0 crash signature
           was data-dependent (BENCH_r04), so the sweep-driving inputs get
           pushed to their extremes
  nonfinite  inf/nan injected into offsets, logits and value
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# base-tier deploy shapes (tools/device_op_check.py derivation:
# eval_shape of ResNet101+FPN at 928x1600 -> 4 levels)
SS_IMG = ((116, 200), (58, 100), (29, 50), (15, 25))
SS_BEV = ((200, 200),)
EMBED, HEADS = 256, 8
CH = EMBED // HEADS


def _rng():
    return np.random.default_rng(7)


def _inject_nonfinite(rng, *arrays):
    out = []
    for a in arrays:
        a = np.array(a)
        flat = a.reshape(-1)
        n = max(1, flat.size // 997)
        idx = rng.integers(0, flat.size, size=n)
        flat[idx[: n // 2]] = np.inf
        flat[idx[n // 2 :]] = np.nan
        out.append(a)
    return out


def _msda_inputs(mode, *, B, nq, L, P, ppg, ss, seed=7):
    """Build q-minor MSDA operands at deploy shapes for data mode `mode`."""
    rng = np.random.default_rng(seed)
    keys = sum(h * w for h, w in ss)
    v = rng.standard_normal((B, EMBED, keys)).astype(np.float32)
    ref = rng.uniform(0, 1, (B, ppg, 2, nq)).astype(np.float32)
    off = (rng.standard_normal((B, HEADS * L * P * 2, nq)) * 4).astype(np.float32)
    attn = rng.standard_normal((B, HEADS * L * P, nq)).astype(np.float32)
    if mode == "wild":
        off = off * 50.0  # taps hundreds of pixels outside every level
        ref = rng.uniform(-0.5, 1.5, ref.shape).astype(np.float32)
        attn = attn * 30.0  # saturated softmax
        v = v * 1e4
    elif mode == "nonfinite":
        off, attn, v = _inject_nonfinite(rng, off, attn, v)
    return v, ref, off, attn


def _run_msda(packed, mode, *, B, nq, L, P, ppg, ss, check=True):
    import jax
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.ops.msda import (
        _qm_to_qmajor,
        multi_scale_deformable_attn,
        multi_scale_deformable_attn_sorted_qm,
    )

    v, ref, off, attn = _msda_inputs(mode, B=B, nq=nq, L=L, P=P, ppg=ppg, ss=ss)
    v, ref, off, attn = map(jnp.asarray, (v, ref, off, attn))
    out = multi_scale_deformable_attn_sorted_qm(
        v, ref, off, attn, ss, num_heads=HEADS, packed=packed,
        out_dtype=jnp.float32,
    )
    out = np.asarray(out)
    rec = {"out_shape": list(out.shape)}
    if mode != "nonfinite":
        rec["finite"] = bool(np.isfinite(out).all())
        if not rec["finite"]:
            raise AssertionError(f"non-finite outputs from finite inputs: {rec}")
    if check and mode == "normal":
        value, rp, so, aw = _qm_to_qmajor(v, ref, off, attn, ss, HEADS)
        oracle = np.asarray(
            multi_scale_deformable_attn(
                value.astype(jnp.float32), rp, so, aw, ss
            )
        )  # [bs, nq, heads*ch] — same layout as the sorted_qm output
        scale = max(np.abs(oracle).max(), 1e-6)
        err = np.abs(out - oracle).max() / scale
        rec["rel_err"] = float(err)
        tol = 0.05 if packed == "int8" else (0.02 if packed else 1e-5)
        if err > tol:
            raise AssertionError(f"oracle mismatch: rel_err {err:.4f} > {tol}")
    return rec


def _run_dcn(packed, mode):
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.ops.dcn import modulated_deform_conv2d

    rng = _rng()
    N, H, W, Cin, Cout = 6, 58, 100, 512, 512
    x = rng.standard_normal((N, H, W, Cin)).astype(np.float32)
    offset = (rng.standard_normal((N, H, W, 18)) * 2).astype(np.float32)
    mask = rng.uniform(0, 1, (N, H, W, 9)).astype(np.float32)
    wgt = (rng.standard_normal((Cout, Cin, 3, 3)) * 0.02).astype(np.float32)
    if mode == "wild":
        offset = offset * 500.0
        x = x * 1e4
    elif mode == "nonfinite":
        offset, x = _inject_nonfinite(rng, offset, x)
    out = modulated_deform_conv2d(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(wgt, jnp.bfloat16), impl="pallas",
        quant="int8" if packed == "int8" else False, layout="NHWC",
    )
    out = np.asarray(out.astype(jnp.float32))
    rec = {"out_shape": list(out.shape)}
    if mode != "nonfinite":
        rec["finite"] = bool(np.isfinite(out).all())
        if not rec["finite"]:
            raise AssertionError("non-finite outputs from finite inputs")
    return rec


def _run_flash(packed, mode):
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.ops.pallas.flash_attn import (
        flash_attention,
        flash_attention_int8,
    )

    rng = _rng()
    q = rng.standard_normal((HEADS, 900, CH)).astype(np.float32)
    k = rng.standard_normal((HEADS, 900, CH)).astype(np.float32)
    v = rng.standard_normal((HEADS, 900, CH)).astype(np.float32)
    if mode == "wild":
        q, k, v = q * 1e3, k * 1e3, v * 1e4
    elif mode == "nonfinite":
        q, k, v = _inject_nonfinite(rng, q, k, v)
    fn = flash_attention_int8 if packed == "int8" else flash_attention
    out = np.asarray(
        fn(jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
           jnp.asarray(v, jnp.bfloat16)).astype(jnp.float32)
    )
    rec = {"out_shape": list(out.shape)}
    if mode != "nonfinite":
        rec["finite"] = bool(np.isfinite(out).all())
        if not rec["finite"]:
            raise AssertionError("non-finite outputs from finite inputs")
    return rec


def _run_model(mode, quant="int8", exclude=()):
    """Full base model, iteration-0 repro: run once with prev_bev=zeros
    (the r4 bench's successful first run), then once with a non-trivial
    prev_bev (the crashing iteration-0 configuration)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
    from tools.geometry_analysis import nuscenes_like_rig

    cfg = cfgs.bevformer_base(
        dtype="bfloat16",
        quant={"none": False, "qdq": True, "int8": "int8"}[quant],
        quant_exclude=tuple(exclude),
    )
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
    if quant != "none":
        _, mut = jax.jit(
            lambda v, *a: model.apply(v, *a, mutable=["amax_stats"])
        )(variables, image, pb0, jnp.float32(1.0), can_bus, lidar2img)
        from flax import traverse_util

        flat = traverse_util.flatten_dict(
            jax.tree.map(lambda a: jnp.maximum(a, 1e-6) / 127.0, mut["amax_stats"])
        )
        flat = {p[:-1] + ("scale",): vv for p, vv in flat.items()}
        variables = {**variables, "quant": traverse_util.unflatten_dict(flat)}
        if quant == "int8":
            from bevformer_tensorrt_tpu.quant.fold import fold_int8_weights

            variables = fold_int8_weights(variables)

    fn = jax.jit(lambda v, *a: model.apply(v, *a))
    t0 = time.perf_counter()
    bev0, cls0, _ = fn(variables, image, pb0, jnp.float32(1.0), can_bus, lidar2img)
    np.asarray(cls0[-1, 0, 0, 0])
    print(f"run0 (prev_bev=zeros) OK in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    if mode == "feedback":
        pb1 = bev0  # exactly the r4 iteration-0 input
    else:
        pb1 = jnp.asarray(
            np.random.default_rng(1).standard_normal(pb0.shape), jnp.float32
        )
    t0 = time.perf_counter()
    bev1, cls1, _ = fn(variables, image, pb1, jnp.float32(1.0), can_bus, lidar2img)
    np.asarray(cls1[-1, 0, 0, 0])
    print(f"run1 (prev_bev={mode}) OK in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    return {"finite": bool(np.isfinite(np.asarray(cls1)).all())}


# K = base cam-budget compaction width: ceil(40000*0.35/128)*128
K_SCA = -(-int(40000 * 0.35) // 128) * 128

CASES = {
    # temporal self-attention shapes (batch = 2-frame BEV queue)
    "msda_tsa_bf16": lambda m: _run_msda(True, m, B=2, nq=40000, L=1, P=4, ppg=1, ss=SS_BEV),
    "msda_tsa_int8": lambda m: _run_msda("int8", m, B=2, nq=40000, L=1, P=4, ppg=1, ss=SS_BEV),
    # spatial cross-attention shapes (batch = 6 cameras, compacted queries)
    "msda_sca_bf16": lambda m: _run_msda(True, m, B=6, nq=K_SCA, L=4, P=8, ppg=4, ss=SS_IMG),
    "msda_sca_int8": lambda m: _run_msda("int8", m, B=6, nq=K_SCA, L=4, P=8, ppg=4, ss=SS_IMG),
    # decoder cross-attention shapes (the model statically picks jnp here,
    # but the sorted kernel must still survive them)
    "msda_dec_int8": lambda m: _run_msda("int8", m, B=1, nq=900, L=1, P=4, ppg=1, ss=SS_BEV),
    "dcn_bf16": lambda m: _run_dcn(True, m),
    "dcn_int8": lambda m: _run_dcn("int8", m),
    "flash_bf16": lambda m: _run_flash(True, m),
    "flash_int8": lambda m: _run_flash("int8", m),
    # full-model iteration-0 repro (BENCH_r04 crash signature)
    "model_int8": lambda m, ex=(): _run_model(
        m if m in ("feedback", "random") else "feedback", exclude=ex
    ),
}

MODES = ["normal", "wild", "nonfinite"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="*", default=None)
    ap.add_argument("--data", nargs="*", default=None, choices=MODES + ["feedback", "random"])
    ap.add_argument("--run", default=None, help="(internal) run one case in-process")
    ap.add_argument("--out", default=None, help="write the JSON summary here too")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--exclude", action="append", default=[],
                    help="model case: quant_exclude patterns (bisection)")
    args = ap.parse_args()

    if args.run:
        mode = (args.data or ["normal"])[0]
        if args.run == "model_int8":
            rec = CASES[args.run](mode, tuple(args.exclude))
        else:
            rec = CASES[args.run](mode)
        print("CASE_OK " + json.dumps(rec), flush=True)
        return

    cases = args.cases or list(CASES)
    results = {}
    for name in cases:
        modes = args.data or (["feedback"] if name == "model_int8" else MODES)
        for mode in modes:
            t0 = time.perf_counter()
            try:
                p = subprocess.run(
                    [sys.executable, __file__, "--run", name, "--data", mode],
                    timeout=args.timeout, capture_output=True, text=True,
                )
                dt = time.perf_counter() - t0
                ok_line = [l for l in p.stdout.splitlines() if l.startswith("CASE_OK")]
                if p.returncode == 0 and ok_line:
                    rec = json.loads(ok_line[-1][8:])
                    results[f"{name}/{mode}"] = {"status": "ok", "s": round(dt, 1), **rec}
                else:
                    tail = (p.stderr or p.stdout).strip().splitlines()[-8:]
                    crashed = any(
                        s in (p.stderr or "")
                        for s in ("TPU worker", "UNAVAILABLE", "Core halted",
                                  "kernel fault", "INTERNAL")
                    )
                    results[f"{name}/{mode}"] = {
                        "status": "crash" if crashed else "fail",
                        "rc": p.returncode, "s": round(dt, 1), "tail": tail,
                    }
                    # give a crashed TPU worker time to restart before the
                    # next case (observed ~10-30 s on the axon relay)
                    if crashed:
                        print(f"{name}/{mode}: DEVICE CRASH — waiting 45s",
                              file=sys.stderr, flush=True)
                        time.sleep(45)
            except subprocess.TimeoutExpired:
                results[f"{name}/{mode}"] = {
                    "status": "timeout", "s": round(time.perf_counter() - t0, 1),
                }
            status = results[f"{name}/{mode}"]["status"]
            print(f"{name}/{mode}: {status}", file=sys.stderr, flush=True)

    bad = {k: v for k, v in results.items() if v["status"] != "ok"}
    summary = {"ok": len(results) - len(bad), "bad": len(bad), "results": results}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
