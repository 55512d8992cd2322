"""Inference engine: compiled apply-fn + host-side temporal state machine.

Replaces the reference's TensorRT engine plumbing
(det2trt/utils/tensorrt.py:12-80 create_engine_context/allocate_buffers/
do_inference) and the per-frame recurrent-state loop shared by
evaluate_pth/evaluate_trt (tools/bevformer/evaluate_trt.py:82-154):

  * scene change -> use_prev_bev = 0
  * can_bus[:3] / can_bus[-1] become deltas vs the previous frame
  * prev_bev <- bev_embed (kept ON DEVICE here — the reference round-trips
    it through the host every frame; on TPU the recurrence stays in HBM and
    only the detections come back).

The compiled executable (jit or AOT-lowered) is the ".trt engine"; the JAX
persistent compilation cache plays the role of the serialized plan.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TemporalState:
    """prev_bev / prev_pos / prev_angle / scene_token carrier
    (reference prev_frame_info, third_party/bev_mmdet3d/models/detectors/
    bevformer.py:249-289)."""

    def __init__(self):
        self.prev_bev = None
        self.prev_pos = np.zeros(3, np.float32)
        self.prev_angle = np.float32(0.0)
        self.scene_token = None

    def step_can_bus(
        self, can_bus: np.ndarray, scene_token, has_prev: bool | None = None
    ) -> tuple[np.ndarray, float]:
        """Returns (delta_can_bus, use_prev_bev).

        `has_prev` overrides the `self.prev_bev is not None` check for callers
        that keep the recurrent BEV outside this object (the serving engine's
        device-resident slot pool)."""
        can_bus = np.array(can_bus, np.float32, copy=True)
        tmp_pos = can_bus[:3].copy()
        tmp_angle = np.float32(can_bus[-1])
        if has_prev is None:
            has_prev = self.prev_bev is not None
        use_prev = 1.0 if (scene_token == self.scene_token and has_prev) else 0.0
        if use_prev:
            can_bus[:3] -= self.prev_pos
            can_bus[-1] -= self.prev_angle
        else:
            can_bus[:3] = 0.0
            can_bus[-1] = 0.0
        self.prev_pos = tmp_pos
        self.prev_angle = tmp_angle
        self.scene_token = scene_token
        return can_bus, use_prev


class BEVFormerEngine:
    """Compiled per-frame inference with on-device recurrence."""

    def __init__(self, model, variables, cfg, donate_prev_bev: bool = True):
        self.cfg = cfg
        # pin params on device ONCE: a loaded checkpoint is a host-numpy
        # tree, and jit re-uploads host arguments on EVERY call — through
        # the tunneled dev backend that is seconds/frame (the reference
        # loads weights onto the GPU once at engine build, for the same
        # reason)
        self.variables = jax.device_put(variables)
        # donate prev_bev so XLA reuses its buffer for bev_embed (no extra
        # HBM copy for the recurrent state)
        self._apply = jax.jit(
            lambda v, image, prev_bev, use_prev, can_bus, l2i: model.apply(
                v, image, prev_bev, use_prev, can_bus, l2i
            ),
            donate_argnums=(2,) if donate_prev_bev else (),
        )
        self.state = TemporalState()

    def reset(self):
        self.state = TemporalState()

    def _check_cam_budget(self, lidar2img) -> None:
        """Host-side guard (no device dispatch, run once per scene): warn if
        this rig makes any camera see more visible BEV queries than the
        static compaction budget K — those queries would be silently dropped
        (the reference rebatches to the dynamic per-frame max instead,
        spatial_cross_attention.py:72)."""
        if getattr(self.cfg, "cam_budget", 1.0) >= 1.0:
            return
        import warnings

        from ..models.modules.encoder import cam_budget_overflow

        visible, overflow = cam_budget_overflow(self.cfg, np.asarray(lidar2img))
        if overflow > 0 and not getattr(self, "_cam_budget_warned", False):
            self._cam_budget_warned = True
            warnings.warn(
                f"cam_budget={self.cfg.cam_budget} drops up to {overflow} "
                f"visible BEV queries/camera on this rig (per-camera visible "
                f"counts {visible.tolist()}); re-run with cam_budget=1.0 or "
                f"raise the budget for exact parity",
                RuntimeWarning,
                stacklevel=3,
            )

    def _zero_prev(self):
        nq = self.cfg.bev_h * self.cfg.bev_w
        return jnp.zeros((nq, 1, self.cfg.embed_dims), jnp.float32)

    def infer_frame(
        self,
        image: np.ndarray,
        can_bus: np.ndarray,
        lidar2img: np.ndarray,
        scene_token: Any,
    ):
        """One frame. Returns (outputs_classes, outputs_coords) device arrays."""
        if scene_token != self.state.scene_token:
            self._check_cam_budget(lidar2img)
        delta_can_bus, use_prev = self.state.step_can_bus(can_bus, scene_token)
        prev_bev = self.state.prev_bev if self.state.prev_bev is not None else self._zero_prev()
        bev_embed, classes, coords = self._apply(
            self.variables,
            image,
            prev_bev,
            jnp.float32(use_prev),
            jnp.asarray(delta_can_bus),
            lidar2img,
        )
        self.state.prev_bev = bev_embed
        return classes, coords

    def benchmark(self, frames, warmup: int = 1) -> Dict[str, float]:
        """Mean-latency FPS, excluding warmup — the reference's convention
        (tools/bevformer/evaluate_trt.py:166-168 excludes first/last)."""
        lat = []
        for i, f in enumerate(frames):
            t0 = time.perf_counter()
            classes, coords = self.infer_frame(**f)
            jax.block_until_ready(coords)
            dt = time.perf_counter() - t0
            if i >= warmup:
                lat.append(dt)
        mean_ms = float(np.mean(lat) * 1000.0)
        return {"latency_ms": mean_ms, "fps": 1000.0 / mean_ms}
