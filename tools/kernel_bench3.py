"""Kernel bench round 3: where does the ~170ns/visit of the sorted gather go?

The r3 trace shows the 6 cross-attention kernels (~27 ms each, 162 ms/frame)
dominate, and int8 tables (half the gathered sublanes) buy only ~13% — so
the per-visit FIXED cost, not gather width, is the bottleneck.  span_study:
production layout = 824k visits/frame, mean span ~10.

Variants (all 4-plane bf16-packed, RG=2, cross shape ch=32):
  A  production replica (acc carry [RG*nrows,128], select per visit)
  B  blend-per-visit: unpack+corner-blend inside the loop, carry only the
     hs accumulators (8 vregs instead of 64)
  C  two panels per loop iteration (halves loop count, same gathers)
  D  no-select control (wrong results; isolates the select cost)
  E  all spans = 1 (fixed-cost floor per group)
  F  gather-only control (no slice offset arithmetic: static panel)

Usage: python tools/kernel_bench3.py [--span 10] [--iters 8]
Prints ms/kernel and derived ns/visit for each variant.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--span", type=float, default=10.0, help="mean panel span")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--B", type=int, default=48)
    ap.add_argument("--QB", type=int, default=110)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    B, QB = args.B, args.QB
    rows, ch, RG = 32, 32, 2
    corners = 4
    sub = 2          # bf16 packed
    Hs = ch // sub   # 16
    nrows = corners * Hs  # 64
    CHT = corners * ch // sub  # 64
    panels_total = 242  # ~30825 keys / 128
    HWp = panels_total * 128
    ng = rows // RG

    # synthetic table (u32 words) + taps with realistic span distribution
    table = jnp.asarray(rng.integers(0, 2**32, (B, CHT, HWp), np.uint32))
    span = np.clip(rng.poisson(args.span, (B, QB, ng)), 1, 30).astype(np.int32)
    # headroom for the widest multi-panel slice (base+span rounded up to 8)
    pmin = rng.integers(0, panels_total - 40, (B, QB, ng)).astype(np.int32)
    # lanes: absolute key within [pmin, pmin+span) panels, relative encoding
    # lane = (panel - pmin)*128 + in-panel index, stored per row
    lane_panel = rng.integers(0, span[:, :, :, None, None], (B, QB, ng, RG, 128))
    lane_idx = rng.integers(0, 128, (B, QB, ng, RG, 128))
    lane = (lane_panel * 128 + lane_idx).astype(np.int32).reshape(B, QB, rows, 128)
    lane = jnp.asarray(lane)
    m4 = jnp.asarray(rng.standard_normal((B, QB, rows, corners, 128)), jnp.bfloat16)
    pmin_j = jnp.asarray(pmin)
    span_j = jnp.asarray(span)
    alive = jnp.ones((B, QB, 1), jnp.int32)
    total_visits = int(span.sum())

    def make(kern, two_panel=False):
        return pl.pallas_call(
            kern,
            grid=(B, QB),
            in_specs=[
                pl.BlockSpec((1, QB, ng), lambda b, q: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, QB, ng), lambda b, q: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, QB, 1), lambda b, q: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, rows, 128), lambda b, q: (b, q, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rows, corners, 128), lambda b, q: (b, q, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CHT, HWp), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ch, 128), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, ch, QB * 128), jnp.float32),
        )

    def common_prolog(lane_ref, g):
        lane_g = lane_ref[0, 0, g * RG : (g + 1) * RG, :].reshape(RG, 1, 128)
        lane_mod = jnp.broadcast_to(
            (lane_g & 127).reshape(RG, 1, 1, 128), (RG, 1, corners * Hs, 128)
        ).reshape(RG * nrows, 128)
        panel_id = jnp.broadcast_to(
            (lane_g >> 7).reshape(RG, 1, 1, 128), (RG, 1, corners * Hs, 128)
        ).reshape(RG * nrows, 128)
        return lane_mod, panel_id

    def blend(acc, m4_ref, g, hs):
        planes = [
            pltpu.bitcast(acc & jnp.uint32(0xFFFF0000), jnp.float32),
            pltpu.bitcast(acc << 16, jnp.float32),
        ]
        for p in range(RG):
            m = m4_ref[0, 0, g * RG + p].reshape(corners, 128).astype(jnp.float32)
            for x in range(corners):
                r0 = (p * corners + x) * Hs
                for s in range(sub):
                    hs[s] = hs[s] + planes[s][r0 : r0 + Hs] * m[x : x + 1]
        return hs

    # ---- A: production replica -------------------------------------------
    def kern_a(pmin_ref, pspan_ref, alive_ref, lane_ref, m4_ref, vt_ref, o_ref):
        hs = [jnp.zeros((Hs, 128), jnp.float32) for _ in range(sub)]
        for g in range(ng):
            base = pmin_ref[0, 0, g]
            span = pspan_ref[0, 0, g]
            lane_mod, panel_id = common_prolog(lane_ref, g)

            def visit(s, acc):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                pb = jnp.broadcast_to(
                    panel.reshape(1, 1, corners * Hs, 128), (RG, 1, corners * Hs, 128)
                ).reshape(RG * nrows, 128)
                gat = jnp.take_along_axis(pb, lane_mod, axis=1)
                return jnp.where(panel_id == s, gat, acc)

            zero = jnp.zeros((RG * nrows, 128), vt_ref.dtype)
            acc = lax.fori_loop(0, span, visit, zero)
            hs = blend(acc, m4_ref, g, hs)
        for s in range(sub):
            o_ref[0, s * Hs : (s + 1) * Hs, :] = hs[s]

    # ---- B: blend per visit (small carry) --------------------------------
    def kern_b(pmin_ref, pspan_ref, alive_ref, lane_ref, m4_ref, vt_ref, o_ref):
        hs0 = [jnp.zeros((Hs, 128), jnp.float32) for _ in range(sub)]
        for g in range(ng):
            base = pmin_ref[0, 0, g]
            span = pspan_ref[0, 0, g]
            lane_mod, panel_id = common_prolog(lane_ref, g)
            m = m4_ref[0, 0, g * RG : (g + 1) * RG].reshape(RG * corners, 128).astype(jnp.float32)

            def visit(s, carry):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                pb = jnp.broadcast_to(
                    panel.reshape(1, 1, corners * Hs, 128), (RG, 1, corners * Hs, 128)
                ).reshape(RG * nrows, 128)
                gat = jnp.take_along_axis(pb, lane_mod, axis=1)
                gat = jnp.where(panel_id == s, gat, jnp.uint32(0))
                planes = [
                    pltpu.bitcast(gat & jnp.uint32(0xFFFF0000), jnp.float32),
                    pltpu.bitcast(gat << 16, jnp.float32),
                ]
                out = list(carry)
                for p in range(RG):
                    for x in range(corners):
                        r0 = (p * corners + x) * Hs
                        mi = p * corners + x
                        for s2 in range(sub):
                            out[s2] = out[s2] + planes[s2][r0 : r0 + Hs] * m[mi : mi + 1]
                return tuple(out)

            hs0 = list(lax.fori_loop(0, span, visit, tuple(hs0)))
        for s in range(sub):
            o_ref[0, s * Hs : (s + 1) * Hs, :] = hs0[s]

    # ---- C: two panels per iteration -------------------------------------
    def kern_c(pmin_ref, pspan_ref, alive_ref, lane_ref, m4_ref, vt_ref, o_ref):
        hs = [jnp.zeros((Hs, 128), jnp.float32) for _ in range(sub)]
        for g in range(ng):
            base = pmin_ref[0, 0, g]
            span = pspan_ref[0, 0, g]
            lane_mod, panel_id = common_prolog(lane_ref, g)

            def visit(i, acc):
                s = i * 2
                panel2 = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 256)]
                p0 = jnp.broadcast_to(
                    panel2[:, :128].reshape(1, 1, corners * Hs, 128), (RG, 1, corners * Hs, 128)
                ).reshape(RG * nrows, 128)
                p1 = jnp.broadcast_to(
                    panel2[:, 128:].reshape(1, 1, corners * Hs, 128), (RG, 1, corners * Hs, 128)
                ).reshape(RG * nrows, 128)
                g0 = jnp.take_along_axis(p0, lane_mod, axis=1)
                g1 = jnp.take_along_axis(p1, lane_mod, axis=1)
                acc = jnp.where(panel_id == s, g0, acc)
                return jnp.where(panel_id == s + 1, g1, acc)

            zero = jnp.zeros((RG * nrows, 128), vt_ref.dtype)
            acc = lax.fori_loop(0, (span + 1) // 2, visit, zero)
            hs = blend(acc, m4_ref, g, hs)
        for s in range(sub):
            o_ref[0, s * Hs : (s + 1) * Hs, :] = hs[s]

    # ---- Cn: n panels per iteration ---------------------------------------
    def make_kern_cn(NP):
        def kern(pmin_ref, pspan_ref, alive_ref, lane_ref, m4_ref, vt_ref, o_ref):
            hs = [jnp.zeros((Hs, 128), jnp.float32) for _ in range(sub)]
            for g in range(ng):
                base = pmin_ref[0, 0, g]
                span = pspan_ref[0, 0, g]
                lane_mod, panel_id = common_prolog(lane_ref, g)

                def visit(i, acc):
                    s = i * NP
                    pw = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), NP * 128)]
                    for k in range(NP):
                        pk = jnp.broadcast_to(
                            pw[:, k * 128 : (k + 1) * 128].reshape(1, 1, corners * Hs, 128),
                            (RG, 1, corners * Hs, 128),
                        ).reshape(RG * nrows, 128)
                        gk = jnp.take_along_axis(pk, lane_mod, axis=1)
                        acc = jnp.where(panel_id == s + k, gk, acc)
                    return acc

                zero = jnp.zeros((RG * nrows, 128), vt_ref.dtype)
                acc = lax.fori_loop(0, (span + NP - 1) // NP, visit, zero)
                hs = blend(acc, m4_ref, g, hs)
            for s in range(sub):
                o_ref[0, s * Hs : (s + 1) * Hs, :] = hs[s]

        return kern

    # ---- D: no-select control --------------------------------------------
    def kern_d(pmin_ref, pspan_ref, alive_ref, lane_ref, m4_ref, vt_ref, o_ref):
        hs = [jnp.zeros((Hs, 128), jnp.float32) for _ in range(sub)]
        for g in range(ng):
            base = pmin_ref[0, 0, g]
            span = pspan_ref[0, 0, g]
            lane_mod, panel_id = common_prolog(lane_ref, g)

            def visit(s, acc):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                pb = jnp.broadcast_to(
                    panel.reshape(1, 1, corners * Hs, 128), (RG, 1, corners * Hs, 128)
                ).reshape(RG * nrows, 128)
                gat = jnp.take_along_axis(pb, lane_mod, axis=1)
                return acc ^ gat  # keep the dependency, drop the select

            zero = jnp.zeros((RG * nrows, 128), vt_ref.dtype)
            acc = lax.fori_loop(0, span, visit, zero)
            hs = blend(acc, m4_ref, g, hs)
        for s in range(sub):
            o_ref[0, s * Hs : (s + 1) * Hs, :] = hs[s]

    runs = {
        "A prod": (kern_a, span_j),
        "B blend-in-loop": (kern_b, span_j),
        "C two-panel": (kern_c, span_j),
        "C4 four-panel": (make_kern_cn(4), span_j),
        "C8 eight-panel": (make_kern_cn(8), span_j),
        "D no-select": (kern_d, span_j),
        "E span1": (kern_a, jnp.ones_like(span_j)),
        "E4 span1-c4": (make_kern_cn(4), jnp.ones_like(span_j)),
    }

    def timeit(fn, *a):
        r = fn(*a)
        np.asarray(r.ravel()[0])
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            r = fn(*a)
            np.asarray(r.ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    print(f"B={B} QB={QB} rows={rows} RG={RG} ch={ch} visits={total_visits}"
          f" (mean span {args.span})", file=sys.stderr)
    floor = None
    for name, (kern, sp) in runs.items():
        f = jax.jit(make(kern))
        try:
            ms = timeit(f, pmin_j, sp, alive, lane, m4, table)
        except Exception as e:  # pragma: no cover
            print(f"{name:18s} FAILED: {type(e).__name__} {str(e)[:120]}")
            continue
        v = total_visits if sp is span_j else B * QB * ng
        ns = (ms - 28.0 * 0) * 1e6 / v  # raw; dispatch floor noted separately
        print(f"{name:18s} {ms:8.2f} ms   {ns:7.1f} ns/visit")


if __name__ == "__main__":
    main()
