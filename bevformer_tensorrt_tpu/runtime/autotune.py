"""Export-time kernel-knob autotuning, persisted with the deploy artifact.

The reference empirically times every cuBLAS algorithm at ENGINE BUILD time
and serializes the winner into the plan (TensorRT/plugin/multi_head_attn/
multiHeadAttnPlugin.cpp:246-262 allocates a workspace and runs the algo
sweep; :295-335 reads the chosen algo back from the serialized engine).
The TPU-native analogue: the sorted-MSDA kernel family has layout knobs
(panels/iteration, table planes, query blocks/program) whose best setting
is shape- and tier-dependent (NOTES_r3: 15%+ swings); `autotune` sweeps the
grid at the model's REAL deploy shapes at export time and `save_knobs`
serializes the winner next to the StableHLO/AOT artifact.  Tools that
re-trace (evaluate/bench/serving) call `apply_knobs(load_knobs(dir))` —
the env vars are read at TRACE time (ops/msda.py _sorted_core), so the
tuned layout bakes into every subsequent compile, exactly like the algo id
baked into a TRT plan.
"""
from __future__ import annotations

import json
import os
import pathlib
from typing import Callable, Dict, List, Optional, Sequence

# knob name -> env var consumed by ops/msda.py _sorted_core at trace time
KNOB_ENV = ("MSDA_NP", "MSDA_TWO_PLANE", "MSDA_QBB")

# default sweep: panels/iteration x table planes.  QBB measured flat on v5e
# (NOTES_r3) so it stays at its default unless the caller widens the grid.
DEFAULT_GRID: List[Dict[str, str]] = [
    {"MSDA_NP": np_, "MSDA_TWO_PLANE": tp}
    for np_ in ("1", "2", "4", "8")
    for tp in ("0", "1")
]


def apply_knobs(knobs: Optional[Dict[str, str]]) -> None:
    """Publish tuned knobs to the trace-time env channel.  Clears knobs not
    present so a loaded artifact fully determines the layout."""
    for k in KNOB_ENV:
        if knobs and k in knobs:
            os.environ[k] = str(knobs[k])
        else:
            os.environ.pop(k, None)


def autotune(
    bench_once: Callable[[Dict[str, str]], float],
    grid: Sequence[Dict[str, str]] = DEFAULT_GRID,
) -> Dict:
    """Sweep `grid`, timing `bench_once(knobs)` (seconds; the callable must
    set the knobs via `apply_knobs`, retrace, and return a robust per-frame
    latency).  Returns {"knobs": winner, "table": [...]} — the table is
    persisted too, the analogue of TRT's verbose tactic log."""
    table = []
    best, best_t = None, float("inf")
    for knobs in grid:
        try:
            t = float(bench_once(dict(knobs)))
        except Exception as e:  # a layout that fails to compile loses
            table.append({**knobs, "error": f"{type(e).__name__}: {str(e)[:120]}"})
            continue
        table.append({**knobs, "seconds": round(t, 5)})
        if t < best_t:
            best, best_t = dict(knobs), t
    if best is None:
        raise RuntimeError("autotune: every knob combination failed")
    return {"knobs": best, "seconds": round(best_t, 5), "table": table}


def save_knobs(artifact_dir, result: Dict) -> None:
    p = pathlib.Path(artifact_dir) / "knobs.json"
    p.write_text(json.dumps(result, indent=1))


def load_knobs(artifact_dir) -> Optional[Dict[str, str]]:
    """Tuned knobs from an export artifact dir (None when absent — defaults
    apply)."""
    p = pathlib.Path(artifact_dir) / "knobs.json"
    if not p.exists():
        return None
    return json.loads(p.read_text()).get("knobs")
