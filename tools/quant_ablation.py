"""INT8 accuracy ablation: localize which quantization sites destroy NDS
(VERDICT r3 item 1) and pick the mixed-precision default policy.

Reuses an accuracy_cycle workdir (trained fp checkpoint + synthetic set):
calibrates ONCE per method (extra methods are free — the stats passes are
method-independent), then evaluates int8 under a grid of named exclusion
policies (quant/policy.py patterns), emitting a JSON table of NDS/mAP per
(method, policy).  The reference analogue is TensorRT's per-layer precision
election under the dual INT8+FP16 builder flags
(det2trt/convert/onnx2tensorrt.py:49-54) — this makes the election explicit
and measured.

Usage:
  python tools/quant_ablation.py --workdir /tmp/acc_cycle [--model tiny]
      [--methods entropy,percentile,max] [--policies all]
      [--out ABLATION_r4.json]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Named exclusion policies.  A policy is a list of path-substring patterns
# (quant/policy.py semantics) naming sites that stay in the compute dtype.
POLICIES = {
    # pure int8 — the r3 configuration that collapsed (NDS -0.102)
    "none": [],
    # reference parity: the decoder's MultiheadAttention is NOT quantized in
    # the reference quant config (configs/bevformer/bevformer_base_trt_q.py:
    # attn_cfgs[0] is a plain MultiheadAttention, no linear_cfg) — its
    # q/k/v/out projections and the flash kernel stay fp
    "ref_mha_fp": ["decoder/layer*/self_attn"],
    # kernel pseudo-sites
    "no_msda_tables": ["msda_tables"],
    "no_flash": ["flash", "qdq_q", "qdq_k", "qdq_v"],
    # functional groups
    "no_offsets": ["sampling_offsets", "attention_weights"],
    "no_head": ["cls_branch", "reg_branch", "reference_points", "can_bus"],
    "no_backbone": ["img_backbone", "img_neck"],
    "no_encoder": ["transformer/encoder"],
    "no_decoder": ["transformer/decoder"],
    # combinations (filled in after single-site results are known)
    "sensitive_fp": [
        "decoder/layer*/self_attn",
        "sampling_offsets",
        "attention_weights",
        "reference_points",
        "can_bus",
        "cls_branch",
        "reg_branch",
    ],
}


def run(cmd, log, timeout=7200, attempts=3):
    for a in range(attempts):
        print(f"+ {' '.join(map(str, cmd))}" + (f" [retry {a}]" if a else ""),
              file=sys.stderr, flush=True)
        with open(log, "w") as f:
            r = subprocess.run(list(map(str, cmd)), stdout=f,
                               stderr=subprocess.STDOUT, timeout=timeout)
        if r.returncode == 0:
            return Path(log).read_text()
        tail = Path(log).read_text()[-3000:]
        transient = "response body closed" in tail or "Connection reset" in tail
        if a + 1 == attempts or not transient:
            raise SystemExit(f"step failed ({cmd[1]}):\n{tail}")
        time.sleep(20)


def last_json(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit("no JSON line found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", choices=["micro", "tiny", "small"])
    ap.add_argument("--workdir", default="/tmp/acc_cycle",
                    help="accuracy_cycle workdir with fp.msgpack + synth/")
    ap.add_argument("--methods", default="entropy,percentile,max")
    ap.add_argument("--policies", default="all",
                    help="comma list of policy names, or 'all'")
    ap.add_argument("--frames", type=int, default=None,
                    help="calibration frames (default: all in the synth set)")
    ap.add_argument("--eval-dtype", default="float32")
    ap.add_argument("--out", default="ABLATION_r4.json")
    args = ap.parse_args()

    wd = Path(args.workdir)
    synth = wd / "synth"
    infos = synth / "nuscenes_infos_synthetic.pkl"
    ckpt = wd / "fp.msgpack"
    assert ckpt.exists(), f"run tools/accuracy_cycle.py first ({ckpt} missing)"
    py = sys.executable
    methods = [m for m in args.methods.split(",") if m]
    policies = (
        list(POLICIES) if args.policies == "all" else args.policies.split(",")
    )
    t0 = time.time()

    # fp reference (once)
    fp = last_json(run(
        [py, REPO / "tools/bevformer/evaluate.py", args.model,
         "--infos", infos, "--data-root", synth, "--checkpoint", ckpt,
         "--dtype", args.eval_dtype],
        wd / "ab_eval_fp.log"))
    print(f"fp: NDS {fp['NDS']:.4f} mAP {fp['mAP']:.4f}", file=sys.stderr)

    # calibrate once; extra methods are free
    scales = wd / "ab_scales.msgpack"
    cal_cmd = [py, REPO / "tools/bevformer/calibrate.py", args.model,
               "--infos", infos, "--data-root", synth, "--checkpoint", ckpt,
               "--method", methods[0], "--out", scales]
    if len(methods) > 1:
        cal_cmd += ["--also-methods", ",".join(methods[1:])]
    if args.frames:
        cal_cmd += ["--length", args.frames]
    run(cal_cmd, wd / "ab_calibrate.log")

    rows = []
    for method in methods:
        sfile = scales if method == methods[0] else f"{scales}.{method}"
        for pol in policies:
            pats = POLICIES[pol]
            cmd = [py, REPO / "tools/bevformer/evaluate.py", args.model,
                   "--infos", infos, "--data-root", synth,
                   "--checkpoint", ckpt, "--quant-scales", sfile,
                   "--quant", "int8", "--dtype", args.eval_dtype]
            for p in pats:
                cmd += ["--quant-exclude", p]
            if not pats:
                cmd += ["--quant-exclude", ""]  # explicit empty: override sidecar
            res = last_json(run(cmd, wd / f"ab_eval_{method}_{pol}.log"))
            row = {
                "method": method, "policy": pol, "exclude": pats,
                "NDS": res["NDS"], "mAP": res["mAP"],
                "nds_drop": round(fp["NDS"] - res["NDS"], 4),
                "map_drop": round(fp["mAP"] - res["mAP"], 4),
            }
            rows.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
            Path(args.out).write_text(json.dumps(
                {"model": args.model, "fp": fp, "rows": rows,
                 "wall_s": round(time.time() - t0, 1)}, indent=1))

    print(json.dumps({"model": args.model, "fp": {"NDS": fp["NDS"], "mAP": fp["mAP"]},
                      "rows": rows, "wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
