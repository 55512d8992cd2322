"""Aggregate a jax.profiler trace into a per-op-family latency table.

Companion to tools/profile.py (which captures the trace) and
tools/component_bench.py (stage-level bisection): this reads the
TensorBoard trace-event JSON and prints ms/frame per op family — the
device-side truth for where a frame goes (Pallas kernels vs XLA fusions
vs relayout copies), replacing hand-made breakdowns.

Usage:
  python tools/profile.py base --out /tmp/trace --frames 2
  python tools/trace_breakdown.py /tmp/trace --frames 2 [--top 30]

Prints one human table and a final JSON line.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--frames", type=int, default=2,
                    help="frames captured inside the trace (divisor)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--ops", type=int, default=0,
                    help="also print the top-N INDIVIDUAL device ops with "
                    "XLA long_name/source attribution")
    args = ap.parse_args()

    paths = sorted(glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]

    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    if not dev_pids:
        raise SystemExit(
            f"no device track found in trace (processes: {pids}) — "
            "was the capture taken on an accelerator?"
        )

    fam = collections.Counter()
    cnt = collections.Counter()
    env = collections.Counter()  # per jit-envelope family (init/apply/decode)
    ops = collections.Counter()  # individual op -> total us
    meta = {}                    # individual op -> XLA/source attribution
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_"):  # whole-program envelope, overlaps children
            env[re.sub(r"\(.*\)$", "", name)] += e.get("dur", 0)
            continue
        g = re.sub(r"[.\d]+$", "", name)
        fam[g] += e.get("dur", 0)
        cnt[g] += 1
        ops[name] += e.get("dur", 0)
        if name not in meta:
            a = e.get("args", {}) or {}
            meta[name] = (
                a.get("long_name") or a.get("tf_op") or a.get("source") or ""
            )
    # the model frame is the DOMINANT envelope; a warmup/init/decode program
    # captured in the same window would otherwise inflate the total
    total = max(env.values()) if env else 0.0

    n = args.frames
    print(f"device frame (module envelope): {total / n / 1e3:.1f} ms")
    print(f"{'ms/frame':>10}  {'calls':>6}  family")
    rows = []
    for name, d in fam.most_common(args.top):
        print(f"{d / n / 1e3:10.2f}  {cnt[name] // n:6d}  {name}")
        rows.append({"family": name, "ms_per_frame": round(d / n / 1e3, 2),
                     "calls_per_frame": cnt[name] // n})
    if args.ops:
        # individual-op attribution: the family table above hides WHICH
        # fusion/copy dominates; this names them, with XLA's long_name /
        # tf_op metadata (jax source path) when the trace carries it
        print(f"\ntop {args.ops} individual ops:")
        print(f"{'ms/frame':>10}  op  [attribution]")
        for name, d in ops.most_common(args.ops):
            m = meta.get(name, "")
            m = (" [" + m[:160] + "]") if m else ""
            print(f"{d / n / 1e3:10.2f}  {name}{m}")

    print(json.dumps({
        "device_ms_per_frame": round(total / n / 1e3, 1),
        "families": rows[:10],
    }))


if __name__ == "__main__":
    main()
