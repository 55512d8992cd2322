"""Attribute multi_scale_deformable_attn_sorted time: table-build vs tap
prep vs kernel, at temporal-self-attn and spatial-cross-attn shapes (base).

Usage: python tools/msda_breakdown.py [temporal|cross]
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from bevformer_tensorrt_tpu.ops.msda import (
    _build_tables,
    _prep_taps,
    multi_scale_deformable_attn_sorted,
)
from bevformer_tensorrt_tpu.ops.pallas.msda_gather import msda_gather_sorted


def timeit(fn, *args, iters=5):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "temporal"
    rng = np.random.default_rng(0)
    if which == "temporal":
        bs, heads, ch, P, ppg = 2, 8, 32, 4, 1
        shapes = ((200, 200),)
        nq = 40000
        off_px = 2.0
    else:
        bs, heads, ch, P, ppg = 6, 8, 32, 8, 4
        shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
        nq = 14080
        off_px = 2.0
    L = len(shapes)
    keys = sum(h * w for h, w in shapes)

    value = jnp.asarray(rng.standard_normal((bs, keys, heads, ch)), jnp.bfloat16)
    # sorted-ish refs: row-major walk over the first level
    t = np.linspace(0, 1, nq, endpoint=False)
    H0, W0 = shapes[0]
    ys = (np.floor(t * H0) + 0.5) / H0
    xs = (t * H0 % 1.0) + 0.5 / W0
    ref = np.stack([xs, ys], -1)[None, :, None, :]
    ref = np.tile(ref, (bs, 1, 1, ppg)).astype(np.float32)
    off = (rng.standard_normal((bs, nq, heads, L * P * 2)) * off_px).astype(np.float32)
    attn = rng.standard_normal((bs, nq, heads, L * P)).astype(np.float32)
    ref, off, attn = jnp.asarray(ref), jnp.asarray(off), jnp.asarray(attn)

    full = functools.partial(
        multi_scale_deformable_attn_sorted, spatial_shapes=shapes, packed=True
    )
    t_full = timeit(jax.jit(lambda *a: full(*a)), value, ref, off, attn)
    print(f"{which}: full op {t_full:.2f} ms", flush=True)

    # ---- table build ----
    B = bs * heads

    @jax.jit
    def build_table(value):
        return _build_tables(value, shapes, True)[0]

    t_table = timeit(build_table, value)
    table = build_table(value)
    level_base = _build_tables(value, shapes, True)[1]
    print(f"{which}: table build {t_table:.2f} ms  (shape {table.shape})", flush=True)

    # ---- tap prep ----
    q_pad = (-nq) % 128
    QB = (nq + q_pad) // 128
    rows = L * P

    @jax.jit
    def prep(ref, off, attn):
        return _prep_taps(ref, off, attn, shapes, heads, level_base)

    t_prep = timeit(prep, ref, off, attn)
    lane, m4, pmin, pspan = prep(ref, off, attn)
    print(
        f"{which}: tap prep {t_prep:.2f} ms  span mean "
        f"{float(jnp.mean(pspan)):.2f} p99 {float(jnp.percentile(pspan, 99)):.0f}",
        flush=True,
    )

    # ---- kernel only (single corner group and split) ----
    for groups in (1, 2):
        cg = 4 // groups
        rpc = table.shape[1] // 4

        @jax.jit
        def kern(table, lane, m4, pmin, pspan):
            out = None
            for g in range(groups):
                tg = table[:, g * cg * rpc : (g + 1) * cg * rpc]
                p = msda_gather_sorted(
                    tg, lane, m4[..., g * cg : (g + 1) * cg, :], pmin, pspan,
                    rows=rows, ch=ch, corners=cg, packed=True,
                )
                out = p if out is None else out + p
            return out

        try:
            t_k = timeit(kern, table, lane, m4, pmin, pspan)
            taps = B * QB * rows * 128
            print(
                f"{which}: kernel groups={groups}: {t_k:.2f} ms "
                f"({taps / (t_k / 1e3) / 1e6:.0f} M taps/s)",
                flush=True,
            )
        except Exception as e:
            print(f"{which}: kernel groups={groups} FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
