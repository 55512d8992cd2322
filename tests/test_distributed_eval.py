"""Virtual 2-host distributed evaluation: two real processes, a CPU
jax.distributed coordination service, scene-sharded inference, and the
cross-host partial merge on process 0 (tools/bevformer/evaluate.py
--distributed).  The multi-host analogue of the reference's
DistributedSampler + collect_results path, runnable without TPU pods.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_two_process_distributed_eval(tmp_path):
    synth = tmp_path / "synth"
    subprocess.run(
        [sys.executable, str(REPO / "tools/make_synthetic_nuscenes.py"),
         str(synth), "--frames", "6", "--cams", "2",
         "--width", "160", "--height", "96"],
        check=True, timeout=120,
    )
    infos = synth / "nuscenes_infos_synthetic.pkl"

    port = 12000 + os.getpid() % 20000
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-u", str(REPO / "tools/bevformer/evaluate.py"),
                 "micro", "--infos", str(infos), "--data-root", str(synth),
                 "--distributed", "--partial-dir", str(tmp_path / "partials")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=str(REPO),
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-2000:]}"
        outs.append(out)

    # both processes wrote partials (namespaced by coordinator address);
    # process 0 printed merged metrics
    pdir = tmp_path / "partials" / f"partials_127.0.0.1_{port}"
    assert (pdir / "eval_partial_0.pkl").exists()
    assert (pdir / "eval_partial_1.pkl").exists()
    # process 0 prints the merged metrics JSON as its last stdout line
    # (collectives also chat on stdout, e.g. Gloo connection notices)
    def last_json(o):
        for line in reversed(o.strip().splitlines()):
            try:
                m = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(m, dict) and "NDS" in m:
                return m
        return None

    parsed = [m for m in (last_json(o) for o in outs) if m is not None]
    assert len(parsed) == 1, outs
    metrics = parsed[0]
    assert "NDS" in metrics and "mAP" in metrics
    # the two shards together saw EVERY frame exactly once (no drop, no
    # duplicate): every sample token appears in exactly one partial
    import pickle

    tokens = []
    for pid in range(2):
        with open(pdir / f"eval_partial_{pid}.pkl", "rb") as f:
            part = pickle.load(f)
        assert len(part["gt"]) > 0  # both shards got scenes
        tokens += sorted({b.sample_token for b in part["gt"]})
    assert len(tokens) == 6 and len(set(tokens)) == 6, tokens
