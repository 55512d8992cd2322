"""Continuous batching of multi-camera frames across scenes.

The reference's deployed engine is strictly single-GPU, batch-1, with the
recurrent prev_bev round-tripping through the host every frame
(det2trt/utils/tensorrt.py:56, tools/bevformer/evaluate_trt.py:144).  The
TPU-native serving engine generalizes it:

  * a device-resident pool of per-scene prev_bev slots [S, nq, 1, C],
  * a host-side scheduler that picks up to B ready frames from *different*
    scenes per step (frames within a scene are sequentially dependent —
    SURVEY.md §7 hard part (c)),
  * one jitted batched step (vmap over the frame axis) that gathers the
    scenes' recurrent state from the pool, runs the model, and scatters the
    new bev_embed back — recurrence never leaves HBM,
  * dp sharding of the frame axis over a mesh when one is provided.
"""
from __future__ import annotations

import collections
import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .engine import TemporalState


@dataclasses.dataclass
class FrameRequest:
    scene_id: int
    image: np.ndarray       # [1, cams, 3, H, W]
    can_bus: np.ndarray     # [18]
    lidar2img: np.ndarray   # [1, cams, 4, 4]
    scene_token: Any = None
    tag: Any = None         # caller's correlation id


class ContinuousBatchingEngine:
    """Batched recurrent inference over a pool of scene slots."""

    def __init__(self, model, variables, cfg, max_scenes: int = 16, batch: int = 4, mesh=None):
        self.cfg = cfg
        self.variables = variables
        self.batch = batch
        self.max_scenes = max_scenes
        nq = cfg.bev_h * cfg.bev_w
        self.pool = jnp.zeros((max_scenes, nq, 1, cfg.embed_dims), jnp.float32)
        self.states: Dict[int, TemporalState] = {}
        self.queues: Dict[int, collections.deque] = collections.defaultdict(collections.deque)
        self.mesh = mesh

        def batched_step(variables, pool, slot_ids, images, use_prev, can_bus, l2i):
            prev = pool[slot_ids]  # [B, nq, 1, C]

            def one(img, pb, up, cb, li):
                return model.apply(variables, img, pb, up, cb, li)

            bev, classes, coords = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
                images, prev, use_prev, can_bus, l2i
            )
            pool = pool.at[slot_ids].set(bev)
            return pool, classes, coords

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            dp = NamedSharding(mesh, P("dp"))
            self._step = jax.jit(
                batched_step,
                donate_argnums=(1,),
                in_shardings=(rep, rep, dp, dp, dp, dp, dp),
            )
        else:
            self._step = jax.jit(batched_step, donate_argnums=(1,))

    def submit(self, req: FrameRequest) -> None:
        self.queues[req.scene_id].append(req)
        if req.scene_id not in self.states:
            assert len(self.states) < self.max_scenes, "scene pool full"
            self.states[req.scene_id] = TemporalState()

    def _ready(self) -> List[FrameRequest]:
        """One pending frame per scene, up to batch size (oldest first)."""
        out = []
        for sid, q in self.queues.items():
            if q and len(out) < self.batch:
                out.append(q.popleft())
        return out

    def step(self) -> List[Tuple[Any, np.ndarray, np.ndarray]]:
        """Run one batched step. Returns [(tag, classes, coords)] for the
        frames processed (padded lanes are dropped)."""
        reqs = self._ready()
        if not reqs:
            return []
        B = self.batch
        nq = self.cfg.bev_h * self.cfg.bev_w
        slot_ids = np.zeros(B, np.int32)
        use_prev = np.zeros(B, np.float32)
        imgs = np.zeros((B,) + reqs[0].image.shape, np.float32)
        cbs = np.zeros((B, self.cfg.can_bus_dims), np.float32)
        l2is = np.zeros((B,) + reqs[0].lidar2img.shape, np.float32)
        for i, r in enumerate(reqs):
            st = self.states[r.scene_id]
            delta_cb, up = st.step_can_bus(r.can_bus, r.scene_token or r.scene_id)
            # recurrent state lives in the device pool; mark the host state so
            # step_can_bus's "have prev" check reflects it
            st.prev_bev = True
            # first frame of a scene: pool slot holds zeros and up == 0
            slot_ids[i] = r.scene_id % self.max_scenes
            use_prev[i] = up
            imgs[i] = r.image
            cbs[i] = delta_cb
            l2is[i] = r.lidar2img
        self.pool, classes, coords = self._step(
            self.variables,
            self.pool,
            jnp.asarray(slot_ids),
            jnp.asarray(imgs),
            jnp.asarray(use_prev),
            jnp.asarray(cbs),
            jnp.asarray(l2is),
        )
        out = []
        for i, r in enumerate(reqs):
            out.append((r.tag, np.asarray(classes[i]), np.asarray(coords[i])))
        return out

    def drain(self) -> List[Tuple[Any, np.ndarray, np.ndarray]]:
        results = []
        while any(self.queues.values()):
            results += self.step()
        return results
