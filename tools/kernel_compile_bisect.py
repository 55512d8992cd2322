"""Bisect Mosaic compile-time blowups in the A2 kernel features.

Each variant compiles a tiny grid (compile cost only; perf irrelevant).
Features toggled: SMEM scalar base, static window loop, fori tail,
corner-fuse, pltpu.roll P-sum.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, CH, P = 2, 32, 8
R = 8
S = 2
HW = 5888
n_rows = 32

rng = np.random.default_rng(0)
vt = jnp.asarray(rng.standard_normal((B, 4 * CH, HW)), jnp.float32)
idx_np = rng.integers(0, HW, (B, n_rows, 128)).astype(np.int32)
pmin_np = (idx_np // 128).min(-1).astype(np.int32)
pspan_np = ((idx_np // 128).max(-1) - pmin_np + 1).astype(np.int32)
lane = jnp.asarray(idx_np - pmin_np[..., None] * 128)
m4 = jnp.asarray(rng.random((B, n_rows, 4, 128), dtype=np.float32))
pmin = jnp.asarray(pmin_np.reshape(B, n_rows // R, R))
pspan = jnp.asarray(pspan_np.reshape(B, n_rows // R, R))


def build(variant):
    def kernel(pmin_ref, pspan_ref, lane_ref, m4_ref, vt_ref, o_ref):
        for r in range(R):
            base = pmin_ref[0, pl.program_id(1), r]
            span = pspan_ref[0, pl.program_id(1), r]
            ln = jnp.broadcast_to(lane_ref[0, r : r + 1, :], (4 * CH, 128))
            acc = jnp.zeros((4 * CH, 128), jnp.float32)
            if variant >= 1:  # static window with SMEM base
                for s in range(S):
                    panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                    l = jnp.clip(ln - s * 128, 0, 127)
                    g = jnp.take_along_axis(panel, l, axis=1)
                    acc = jnp.where((ln // 128) == s, g, acc)
            if variant >= 2:  # fori tail

                def tail(s, acc):
                    panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                    l = jnp.clip(ln - s * 128, 0, 127)
                    g = jnp.take_along_axis(panel, l, axis=1)
                    return jnp.where((ln // 128) == s, g, acc)

                acc = lax.fori_loop(S, span, tail, acc)
            if variant >= 3:  # corner fuse
                m = m4_ref[0, r]
                h = (
                    acc[0 * CH : 1 * CH] * m[0:1]
                    + acc[1 * CH : 2 * CH] * m[1:2]
                    + acc[2 * CH : 3 * CH] * m[2:3]
                    + acc[3 * CH : 4 * CH] * m[3:4]
                )
            else:
                h = acc[:CH]
            if variant >= 4:  # roll P-sum
                for k in (1, 2, 4):
                    if k < P:
                        h = h + pltpu.roll(h, 128 - k, 1)
            o_ref[0, :, r * 128 : (r + 1) * 128] = h

    @jax.jit
    def run(vt, lane, m4, pmin, pspan):
        return pl.pallas_call(
            kernel,
            grid=(B, n_rows // R),
            in_specs=[
                pl.BlockSpec((1, n_rows // R, R), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n_rows // R, R), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, 4, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * CH, HW), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, CH, R * 128), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, CH, n_rows * 128), jnp.float32),
        )(pmin, pspan, lane, m4, vt)

    return run


which = [int(x) for x in sys.argv[1:]] or [0, 1, 2, 3, 4]
for v in which:
    t0 = time.perf_counter()
    try:
        r = build(v)(vt, lane, m4, pmin, pspan)
        np.asarray(r[0, 0, 0])
        print(f"variant {v}: compiled+ran in {time.perf_counter() - t0:.1f}s", flush=True)
    except Exception as e:
        print(
            f"variant {v}: FAILED after {time.perf_counter() - t0:.1f}s "
            f"{type(e).__name__}: {str(e)[:200]}",
            flush=True,
        )
