"""Full accuracy pipeline at real deploy shapes on synthetic data
(VERDICT r2 item 3): train -> fp eval -> entropy calibrate -> int8 eval ->
QAT -> int8 eval, committing the NDS numbers as an artifact.

The reference's acceptance test is NDS on nuScenes val with <= 0.003 drop at
INT8 (README.md:51-65).  Real nuScenes is absent from this environment, so
this proves the PIPELINE at the tiny tier's REAL deploy shapes (480x800,
6 cams, 50x50 BEV) on a generated synthetic set: the model overfits the
clips, and the int8/QAT evals run against the fp model's own NDS.

Usage:
  python tools/accuracy_cycle.py [--model tiny] [--frames 16] [--steps 200] \
      [--qat-steps 30] [--out ACCURACY_r3.json] [--workdir /tmp/acc_cycle]

Every stage is a subprocess of the real CLI (train/evaluate/calibrate) —
this is also an end-to-end drive of the tool surface.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run(cmd, log, timeout=7200, attempts=3):
    """Run one stage; retry on failure — the axon relay's remote-compile
    HTTP stream occasionally drops mid-compile ('response body closed'),
    and a retry usually hits the warmed server-side cache."""
    for a in range(attempts):
        print(f"+ {' '.join(map(str, cmd))}" + (f"  [retry {a}]" if a else ""),
              file=sys.stderr, flush=True)
        with open(log, "w") as f:
            r = subprocess.run(list(map(str, cmd)), stdout=f,
                               stderr=subprocess.STDOUT, timeout=timeout)
        if r.returncode == 0:
            return Path(log).read_text()
        tail = Path(log).read_text()[-3000:]
        transient = "remote_compile" in tail or "response body closed" in tail
        if a + 1 == attempts or not transient:
            raise SystemExit(f"step failed ({cmd[1]}):\n{tail}")
        time.sleep(20)


def last_json(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit("no JSON line found in output")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", choices=["micro", "tiny", "small"])
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--qat-steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=2e-4,
                help="2e-4: 4e-4 destabilizes the tiny bbox loss post-warmup (NOTES_r4)")
    ap.add_argument("--qat-lr", type=float, default=1e-5,
                    help="QAT fine-tune lr (reference: 1e-6 SGD for a full "
                    "epoch; higher here to move in a short synthetic run)")
    ap.add_argument("--msda-impl", default="sorted")
    ap.add_argument(
        "--method", default="percentile",
        help="calibration method.  percentile-99.99 is the reference's QDQ "
        "default (calibrator_qdq.py:76) and the ABLATION_r4.json winner: "
        "pure-int8 NDS drop 0.000 vs entropy's 0.061 (entropy-KL scales "
        "clip the head's long-tailed cls/reg activations)",
    )
    ap.add_argument(
        "--exclude", action="append", default=None,
        help="mixed-precision site pattern kept fp (repeatable), forwarded "
        "to calibrate.py and persisted in the scale artifact",
    )
    ap.add_argument("--out", default="ACCURACY_r3.json")
    ap.add_argument("--workdir", default="/tmp/acc_cycle")
    ap.add_argument("--seed", type=int, default=0,
                    help="synthetic-scene seed (3-seed spread runs)")
    ap.add_argument("--shared-gt", action="store_true",
                    help="constant scene (same GT every frame) — reaches "
                    "meaningful AP in a short overfit run")
    args = ap.parse_args()

    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    synth = wd / "synth"
    infos = synth / "nuscenes_infos_synthetic.pkl"
    py = sys.executable
    t0 = time.time()

    if args.model == "micro":
        shape = ["--cams", "2", "--width", "160", "--height", "96"]
    else:
        shape = ["--cams", "6", "--width", "800", "--height", "480"]
    extra = ["--shared-gt"] if args.shared_gt else []
    run([py, REPO / "tools/make_synthetic_nuscenes.py", synth,
         "--frames", args.frames, "--seed", args.seed, *shape, *extra],
        wd / "00_data.log")

    ckpt = wd / "fp.msgpack"
    run([py, REPO / "tools/bevformer/train.py", args.model,
         "--infos", infos, "--data-root", synth,
         "--steps", args.steps, "--lr", args.lr, "--no-augment",
         "--msda-impl", args.msda_impl, "--log-every", "20",
         "--save-every", "0", "--out", ckpt], wd / "01_train.log")

    # fp eval at BOTH dtypes: bf16 is the deploy/bench dtype (the int8 evals
    # below run their fp-fallback sites in bf16 too), fp32 documents the
    # dtype-only delta once (VERDICT r3 weak #7)
    fp = last_json(run([py, REPO / "tools/bevformer/evaluate.py", args.model,
                        "--infos", infos, "--data-root", synth,
                        "--dtype", "bfloat16",
                        "--checkpoint", ckpt], wd / "02_eval_fp.log"))
    fp32 = last_json(run([py, REPO / "tools/bevformer/evaluate.py", args.model,
                          "--infos", infos, "--data-root", synth,
                          "--dtype", "float32",
                          "--checkpoint", ckpt], wd / "02_eval_fp32.log"))

    scales = wd / "scales.msgpack"
    cal_cmd = [py, REPO / "tools/bevformer/calibrate.py", args.model,
               "--infos", infos, "--data-root", synth, "--checkpoint", ckpt,
               "--length", args.frames, "--method", args.method,
               "--out", scales]
    for p in args.exclude or ():
        cal_cmd += ["--exclude", p]
    run(cal_cmd, wd / "03_calibrate.log")

    ptq = last_json(run([py, REPO / "tools/bevformer/evaluate.py", args.model,
                         "--infos", infos, "--data-root", synth,
                         "--dtype", "bfloat16",
                         "--checkpoint", ckpt, "--quant-scales", scales,
                         "--quant", "int8"], wd / "04_eval_int8.log"))

    # QAT: PTQ-init + low-lr fine-tune with fake-quant sites live (reference
    # recipe: samples/bevformer/base/quant_aware_train.sh:19-26, lr 1e-6 SGD
    # for one epoch; scaled to the synthetic overfit's step count)
    qat_ckpt = wd / "qat.msgpack"
    run([py, REPO / "tools/bevformer/train.py", args.model,
         "--infos", infos, "--data-root", synth,
         "--steps", args.qat_steps, "--no-augment", "--log-every", "10",
         "--lr", args.qat_lr,
         "--checkpoint", ckpt, "--quant-scales", scales,
         "--msda-impl", args.msda_impl, "--save-every", "0", "--out", qat_ckpt],
        wd / "05_qat.log")

    qat = last_json(run([py, REPO / "tools/bevformer/evaluate.py", args.model,
                         "--infos", infos, "--data-root", synth,
                         "--dtype", "bfloat16",
                         "--checkpoint", qat_ckpt, "--quant-scales", scales,
                         "--quant", "int8"], wd / "06_eval_qat_int8.log"))

    rec = {
        "model": args.model,
        "seed": args.seed,
        "frames": args.frames,
        "train_steps": args.steps,
        "qat_steps": args.qat_steps,
        "method": args.method,
        "fp": fp,
        "fp32": fp32,
        "nds_delta_bf16_vs_fp32": round(fp32["NDS"] - fp["NDS"], 4),
        "int8_ptq": ptq,
        "int8_qat": qat,
        "nds_drop_ptq": round(fp["NDS"] - ptq["NDS"], 4),
        "nds_drop_qat": round(fp["NDS"] - qat["NDS"], 4),
        "reference_envelope": "int8 drop <= 0.003 NDS on real nuScenes "
        "(README.md:51-65); synthetic-overfit analogue",
        "wall_s": round(time.time() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
