"""Device mesh construction and axis conventions.

The reference's distributed story is NCCL DDP only (SURVEY.md §2.6); the
TPU-native design replaces launcher+NCCL with one `jax.sharding.Mesh` and
GSPMD.  Axis conventions:

  dp — data parallel: one multi-camera frame (or a batch shard) per group.
       Rides DCN across hosts, ICI within.  Maps 1:1 to the reference's
       DistributedSampler even-split (apis/test.py:46).
  tp — tensor parallel: attention heads / FFN hidden / camera fan-out inside
       one frame.  Must ride ICI.  New capability (reference has none).

`make_mesh` factors the device count as dp×tp with tp chosen to divide the
transformer's 8 attention heads (tp ∈ {1, 2, 4, 8}).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pick_dp_tp(n_devices: int, max_tp: int = 4) -> tuple[int, int]:
    """Factor n = dp * tp with tp the largest power of two ≤ max_tp dividing n."""
    tp = 1
    while tp * 2 <= max_tp and n_devices % (tp * 2) == 0:
        tp *= 2
    return n_devices // tp, tp


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if tp is None and dp is None:
        dp, tp = pick_dp_tp(n)
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(np.asarray(devs).reshape(dp, tp), ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading axis on dp, rest replicated."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))
