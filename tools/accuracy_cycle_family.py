"""Accuracy cycles for the BEVDet and 2D families: train -> fp eval ->
calibrate -> int8 eval [-> QAT -> int8 eval], as one artifact per family.

Mirrors tools/accuracy_cycle.py (the BEVFormer cycle) for the other model
families the reference publishes int8 accuracy for (README.md:81-108:
BEVDet R50 NDS/mAP, YOLOX-x and CenterNet mAP at every precision) —
VERDICT r4 item 7 asked for exactly these artifacts.  Synthetic data with
learnable signal (rendered cuboids for BEVDet via make_synthetic_nuscenes,
colored rectangles for COCO via make_synthetic_coco); micro tiers run the
whole cycle on CPU.

Usage:
  python tools/accuracy_cycle_family.py --family bevdet --steps 800
  python tools/accuracy_cycle_family.py --family yolox --family centernet
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from accuracy_cycle import last_json, run

REPO = Path(__file__).resolve().parents[1]


def cycle_bevdet(args, wd):
    py = sys.executable
    synth = wd / "synth"
    infos = synth / "nuscenes_infos_synthetic.pkl"
    run([py, REPO / "tools/make_synthetic_nuscenes.py", synth,
         "--frames", args.frames, "--seed", args.seed, "--cams", "2",
         "--width", "128", "--height", "64", "--shared-gt"],
        wd / "00_data.log")
    ckpt = wd / "fp.msgpack"
    run([py, REPO / "tools/bevdet/train.py", "--model", "micro",
         "--infos", infos, "--data-root", synth, "--steps", args.steps,
         "--ranks-pad", "8192", "--log-every", "50", "--out", ckpt],
        wd / "01_train.log")
    common = ["--model", "micro", "--infos", infos, "--data-root", synth,
              "--ranks-pad", "8192"]
    fp = last_json(run([py, REPO / "tools/bevdet/evaluate.py", *common,
                        "--checkpoint", ckpt], wd / "02_eval_fp.log"))
    scales = wd / "scales.msgpack"
    run([py, REPO / "tools/bevdet/calibrate.py", *common,
         "--checkpoint", ckpt, "--length", args.frames,
         "--method", "percentile", "--out", scales], wd / "03_calibrate.log")
    ptq = last_json(run([py, REPO / "tools/bevdet/evaluate.py", *common,
                         "--checkpoint", ckpt, "--quant-scales", scales,
                         "--quant", "int8"], wd / "04_eval_int8.log"))
    qat_ckpt = wd / "qat.msgpack"
    run([py, REPO / "tools/bevdet/train.py", "--model", "micro",
         "--infos", infos, "--data-root", synth, "--steps", args.qat_steps,
         "--ranks-pad", "8192", "--log-every", "25", "--checkpoint", ckpt,
         "--quant-scales", scales, "--lr", "2e-5", "--out", qat_ckpt],
        wd / "05_qat.log")
    qat = last_json(run([py, REPO / "tools/bevdet/evaluate.py", *common,
                         "--checkpoint", qat_ckpt, "--quant-scales", scales,
                         "--quant", "int8"], wd / "06_eval_qat.log"))
    return {
        "fp": fp, "int8_ptq": ptq, "int8_qat": qat,
        "nds_drop_ptq": round(fp["NDS"] - ptq["NDS"], 4),
        "nds_drop_qat": round(fp["NDS"] - qat["NDS"], 4),
        "reference_rows": "BEVDet R50 int8 NDS 0.372 vs fp 0.377 "
        "(README.md:81-84); synthetic-overfit analogue at micro",
    }


def cycle_2d(which, args, wd):
    py = sys.executable
    synth = wd / "synth"
    ann = synth / "instances_synthetic.json"
    img_root = synth / "images"
    run([py, REPO / "tools/make_synthetic_coco.py", synth,
         "--images", "48", "--size", "96", "--seed", args.seed],
        wd / "00_data.log")
    model = f"{which}_micro"
    ckpt = wd / "fp.msgpack"
    run([py, REPO / "tools/2d/train.py", model, "--ann", ann,
         "--img-root", img_root, "--steps", args.steps, "--batch", "8",
         "--no-augment", "--log-every", "50", "--out", ckpt],
        wd / "01_train.log")
    common = [model, "--ann", ann, "--img-root", img_root]
    fp = last_json(run([py, REPO / "tools/2d/evaluate.py", *common,
                        "--checkpoint", ckpt], wd / "02_eval_fp.log"))
    scales = wd / "scales.msgpack"
    run([py, REPO / "tools/2d/calibrate.py", *common, "--checkpoint", ckpt,
         "--length", "48", "--method", "percentile", "--out", scales],
        wd / "03_calibrate.log")
    ptq = last_json(run([py, REPO / "tools/2d/evaluate.py", *common,
                         "--checkpoint", ckpt, "--quant-scales", scales,
                         "--quant", "int8"], wd / "04_eval_int8.log"))
    qat_ckpt = wd / "qat.msgpack"
    run([py, REPO / "tools/2d/train.py", model, "--ann", ann,
         "--img-root", img_root, "--steps", args.qat_steps, "--batch", "8",
         "--no-augment", "--log-every", "25", "--checkpoint", ckpt,
         "--quant-scales", scales, "--lr", "2e-5", "--out", qat_ckpt],
        wd / "05_qat.log")
    qat = last_json(run([py, REPO / "tools/2d/evaluate.py", *common,
                         "--checkpoint", qat_ckpt, "--quant-scales", scales,
                         "--quant", "int8"], wd / "06_eval_qat.log"))
    key = "mAP" if "mAP" in fp else "map"
    return {
        "fp": fp, "int8_ptq": ptq, "int8_qat": qat,
        "map_drop_ptq": round(fp[key] - ptq[key], 4),
        "map_drop_qat": round(fp[key] - qat[key], 4),
        "reference_rows": "YOLOX-x int8 mAP 0.494 vs fp 0.506; CenterNet "
        "int8 0.261 vs fp 0.299 (README.md:92-108); synthetic micro analogue",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", action="append",
                    choices=["bevdet", "yolox", "centernet"], default=None)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--qat-steps", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="ACCURACY_FAMILIES_r5.json")
    ap.add_argument("--workdir", default="/tmp/acc_fam")
    args = ap.parse_args()

    fams = args.family or ["bevdet", "yolox", "centernet"]
    out = {}
    t0 = time.time()
    for fam in fams:
        wd = Path(args.workdir) / fam
        wd.mkdir(parents=True, exist_ok=True)
        print(f"=== {fam} cycle ===", file=sys.stderr, flush=True)
        if fam == "bevdet":
            out[fam] = cycle_bevdet(args, wd)
        else:
            out[fam] = cycle_2d(fam, args, wd)
        Path(args.out).write_text(json.dumps(
            {**out, "steps": args.steps, "qat_steps": args.qat_steps,
             "seed": args.seed, "wall_s": round(time.time() - t0, 1)},
            indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
