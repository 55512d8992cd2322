"""A/B the sorted-MSDA kernel layout knobs on the real TPU.

Runs BEVFormer-base bf16 once per (MSDA_QBB, MSDA_TWO_PLANE) config in a
fresh subprocess (env-keyed jit caches can't be flipped in-process without
clearing everything), appending one JSON line per config to --out as each
finishes — safe against interruption.  Run AFTER backend recovery; do NOT
kill mid-compile (see CLAUDE.md).

Usage: python tools/ab_kernel_layouts.py [--out /tmp/ab.jsonl] [--iters 6]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CONFIGS = [
    {"MSDA_QBB": "8", "MSDA_TWO_PLANE": "1"},  # preferred (round-2 default)
    {"MSDA_QBB": "4", "MSDA_TWO_PLANE": "1"},
    {"MSDA_QBB": "1", "MSDA_TWO_PLANE": "1"},
    {"MSDA_QBB": "8", "MSDA_TWO_PLANE": "0"},
    {"MSDA_QBB": "1", "MSDA_TWO_PLANE": "0"},  # round-2 TPU-validated layout
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ab_kernel_layouts.jsonl")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--model", default="base")
    ap.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY=V1,V2",
        help="sweep axis (repeatable): cross-product of the given env values "
        "replaces the built-in CONFIGS, e.g. --set MSDA_QBB=1,8 "
        "--set MSDA_RG=2,4 --set MSDA_KG=1,3",
    )
    args = ap.parse_args()

    configs = CONFIGS
    if args.set:
        import itertools

        axes = []
        for spec in args.set:
            k, vs = spec.split("=", 1)
            axes.append([(k, v) for v in vs.split(",")])
        configs = [dict(combo) for combo in itertools.product(*axes)]

    for cfg in configs:
        env = dict(os.environ, **cfg)
        label = "_".join(f"{k.lower()}{v}" for k, v in cfg.items())
        print(f"=== {label} ===", file=sys.stderr, flush=True)
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--model", args.model,
             "--iters", str(args.iters), "--warmup", "2"],
            env=env, capture_output=True, text=True, cwd=str(REPO),
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            rec = {"config": cfg, **json.loads(line)}
        except (json.JSONDecodeError, ValueError):
            rec = {"config": cfg, "error": (r.stderr or "")[-400:]}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
