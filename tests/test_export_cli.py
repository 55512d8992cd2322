"""Export-CLI artifact round-trips for the BEVDet and 2D families.

Reference parity: tools/bevdet/onnx2trt.py:1-207 and tools/2d/onnx2trt.py:1-107
build deployable engines; here the CLIs produce stablehlo+variables+meta
artifact dirs, and the serialized forward must reload and run (the repo's
".trt plan" analogue).  BEVFormer's CLI is covered by TestExport in
tests/test_train.py + tools/bevformer/export.py.
"""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _run(cmd):
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-4000:]
    return r


@pytest.mark.slow
class TestExportCLIs:
    def test_bevdet_export_roundtrip(self, tmp_path):
        synth = tmp_path / "synth"
        _run([
            sys.executable, str(REPO / "tools/make_synthetic_nuscenes.py"),
            str(synth), "--frames", "1", "--cams", "2",
            "--width", "128", "--height", "64",
        ])
        out = tmp_path / "bevdet_tpu"
        r = _run([
            sys.executable, str(REPO / "tools/bevdet/export.py"),
            "--model", "micro",
            "--infos", str(synth / "nuscenes_infos_synthetic.pkl"),
            "--ranks-pad", "20000",
            "--out", str(out),
        ])
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        assert set(rec["artifacts"]) >= {"model.stablehlo", "variables.msgpack", "meta.json"}

        # reload the serialized forward and run it on fresh inputs
        import jax
        import jax.numpy as jnp

        from bevformer_tensorrt_tpu.configs.bevdet import bevdet_micro
        from bevformer_tensorrt_tpu.models.detectors.bevdet import BEVDet
        from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint
        from bevformer_tensorrt_tpu.runtime.export import load_serialized

        cfg = bevdet_micro()
        meta = json.loads((out / "meta.json").read_text())
        assert meta["model"] == "bevdet_micro"
        g = load_serialized(out / "model.stablehlo")
        # variables template from a fresh init is not needed: msgpack stores
        # the full pytree
        variables = load_checkpoint(str(out / "variables.msgpack"))
        img = jnp.ones((1, cfg.num_cams, 3, cfg.input_h, cfg.input_w), jnp.float32)
        heads = g(variables, img)
        flat = [np.asarray(x) for x in jax.tree.leaves(heads)]
        assert flat and all(np.isfinite(a).all() for a in flat)

    def test_2d_export_roundtrip(self, tmp_path):
        out = tmp_path / "yolox_tpu"
        r = _run([
            sys.executable, str(REPO / "tools/2d/export.py"), "yolox_micro",
            "--batch", "2", "--out", str(out),
        ])
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        assert set(rec["artifacts"]) >= {"model.stablehlo", "variables.msgpack", "meta.json"}

        import jax
        import jax.numpy as jnp

        from bevformer_tensorrt_tpu.runtime.checkpoint import load_checkpoint
        from bevformer_tensorrt_tpu.runtime.export import load_serialized

        meta = json.loads((out / "meta.json").read_text())
        g = load_serialized(out / "model.stablehlo")
        variables = load_checkpoint(str(out / "variables.msgpack"))
        img = jnp.ones(meta["image"], jnp.float32)
        outs = g(variables, img)
        flat = [np.asarray(x) for x in jax.tree.leaves(outs)]
        assert flat and all(np.isfinite(a).all() for a in flat)


def test_autotune_select_persist_roundtrip(tmp_path):
    """runtime/autotune.py: grid sweep picks the fastest knob set, failed
    layouts are recorded (not fatal), and the persisted knobs round-trip
    into the trace-time env channel — the serialized-algo-id behavior of
    the reference plugin (multiHeadAttnPlugin.cpp:246-335)."""
    import os

    from bevformer_tensorrt_tpu.runtime.autotune import (
        DEFAULT_GRID,
        apply_knobs,
        autotune,
        load_knobs,
        save_knobs,
    )

    fake = {("1", "0"): 0.5, ("2", "0"): 0.4, ("4", "0"): 0.3,
            ("4", "1"): 0.45, ("8", "0"): 0.35, ("8", "1"): 0.6,
            ("2", "1"): 0.55}

    def bench_once(knobs):
        key = (knobs["MSDA_NP"], knobs["MSDA_TWO_PLANE"])
        if key == ("1", "1"):
            raise RuntimeError("VMEM OOM")  # a layout that fails to compile
        return fake[key]

    result = autotune(bench_once, DEFAULT_GRID)
    assert result["knobs"] == {"MSDA_NP": "4", "MSDA_TWO_PLANE": "0"}
    assert any("error" in r for r in result["table"])
    assert len(result["table"]) == len(DEFAULT_GRID)

    save_knobs(tmp_path, result)
    loaded = load_knobs(tmp_path)
    assert loaded == result["knobs"]
    apply_knobs(loaded)
    try:
        assert os.environ["MSDA_NP"] == "4"
        assert os.environ["MSDA_TWO_PLANE"] == "0"
        assert "MSDA_QBB" not in os.environ  # unset knobs are cleared
    finally:
        apply_knobs(None)
    assert load_knobs(tmp_path / "nope") is None
