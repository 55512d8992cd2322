"""Continuous batching of multi-camera frames across scenes.

The reference's deployed engine is strictly single-GPU, batch-1, with the
recurrent prev_bev round-tripping through the host every frame
(det2trt/utils/tensorrt.py:56, tools/bevformer/evaluate_trt.py:144).  The
TPU-native serving engine generalizes it:

  * a device-resident pool of per-scene prev_bev slots [S+1, nq, 1, C]
    (slot S is a scratch slot that absorbs padded-lane writes),
  * an explicit scene -> slot allocation map with a free list: slots are
    claimed when a scene's first frame is scheduled and released by
    `finish_scene`; scenes beyond capacity queue until a slot frees,
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


@dataclasses.dataclass
class _SceneRecord:
    state: TemporalState
    slot: Optional[int] = None   # pool slot, claimed lazily when scheduled
    has_prev: bool = False       # slot holds a valid prev_bev


class ContinuousBatchingEngine:
    """Batched recurrent inference over a pool of scene slots."""

    def __init__(self, model, variables, cfg, max_scenes: int = 16, batch: int = 4, mesh=None):
        self.cfg = cfg
        # pin on device: a loaded checkpoint is host numpy, and jit
        # re-uploads host args every call (seconds/frame on the relay)
        self.variables = jax.device_put(variables)
        self.batch = batch
        self.max_scenes = max_scenes
        nq = cfg.bev_h * cfg.bev_w
        # slot `max_scenes` is scratch: padded lanes read zeros from and
        # scatter garbage into it without touching any live scene's state.
        self.pool = jnp.zeros((max_scenes + 1, nq, 1, cfg.embed_dims), jnp.float32)
        self.scenes: Dict[int, _SceneRecord] = {}
        self.queues: Dict[int, collections.deque] = collections.defaultdict(collections.deque)
        self._free_slots: List[int] = list(range(max_scenes))
        self.mesh = mesh

        def batched_step(variables, pool, slot_ids, images, use_prev, can_bus, l2i):
            prev = pool[slot_ids]  # [B, nq, 1, C]

            def one(img, pb, up, cb, li):
                return model.apply(variables, img, pb, up, cb, li)

            bev, classes, coords = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
                images, prev, use_prev, can_bus, l2i
            )
            # duplicate slot ids never occur for live lanes (slots are unique
            # per scene); padded lanes all target the scratch slot, where
            # scatter order doesn't matter.
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
        if req.scene_id not in self.scenes:
            self.scenes[req.scene_id] = _SceneRecord(state=TemporalState())

    def finish_scene(self, scene_id: int) -> None:
        """Release a completed scene's pool slot (call after its last frame's
        results are consumed). Pending queued frames for the scene are
        dropped."""
        rec = self.scenes.pop(scene_id, None)
        self.queues.pop(scene_id, None)
        if rec is not None and rec.slot is not None:
            self._free_slots.append(rec.slot)

    def _ready(self) -> List[FrameRequest]:
        """One pending frame per *slot-holding* scene, up to batch size.
        Scenes without a slot claim one from the free list; when none is
        free they wait (backpressure instead of state collisions)."""
        out = []
        for sid, q in self.queues.items():
            if not q or len(out) >= self.batch:
                continue
            rec = self.scenes[sid]
            if rec.slot is None:
                if not self._free_slots:
                    continue
                rec.slot = self._free_slots.pop()
            out.append(q.popleft())
        return out

    def step(self) -> List[Tuple[Any, np.ndarray, np.ndarray]]:
        """Run one batched step. Returns [(tag, classes, coords)] for the
        frames processed (padded lanes are dropped)."""
        reqs = self._ready()
        if not reqs:
            return []
        B = self.batch
        # padded lanes target the scratch slot: they read zeros and their
        # (garbage) bev write lands where no scene lives.
        slot_ids = np.full(B, self.max_scenes, np.int32)
        use_prev = np.zeros(B, np.float32)
        imgs = np.zeros((B,) + reqs[0].image.shape, np.float32)
        cbs = np.zeros((B, self.cfg.can_bus_dims), np.float32)
        l2is = np.zeros((B,) + reqs[0].lidar2img.shape, np.float32)
        for i, r in enumerate(reqs):
            rec = self.scenes[r.scene_id]
            delta_cb, up = rec.state.step_can_bus(
                r.can_bus, r.scene_token or r.scene_id, has_prev=rec.has_prev
            )
            # first frame of a scene: pool slot holds zeros and up == 0
            rec.has_prev = True
            slot_ids[i] = rec.slot
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
            got = self.step()
            if not got:
                # every queued scene is waiting on a slot — nothing can make
                # progress until finish_scene releases one.
                break
            results += got
        return results
