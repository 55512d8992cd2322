"""Kernel bench round 2: eliminate the per-row overheads found in round 1.

Round-1 finding (kernel_bench.py): the vreg lane-gather visit ([4ch=128, 128]
take_along_axis) costs only ~116 cycles, but each tap-row pays ~1.1 us of
fixed overhead — in-kernel scalar min/max reductions + dynamic fori setup.
Round-2 variants hoist all scalar work to XLA:

  A2: per-row base panel + span precomputed by XLA, passed via SMEM;
      static unroll of S fast-path visits + @pl.when'd dynamic fori tail.
  A3: A2 with the table packed as u32 pairs of bf16 channels ([64, HW]
      u32) — half the vregs per visit; unpack via shift+bitcast after.
  A4: A2 with a raw bf16 table (tests whether Mosaic dynamic_gather takes
      bf16 data with i32 indices at all).

Also probes VMEM capacity (how big can a resident table block be).
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, *args, iters=5):
    import jax

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
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    HW = int(sys.argv[1]) if len(sys.argv) > 1 else 5888
    B, CH, P = 48, 32, 8
    R = 8
    S = 2  # static fast-path window (panels)
    n_rows = 880
    n_rows -= n_rows % R
    n_taps_total = B * n_rows * 128

    # ---------- VMEM capacity probe ----------
    def probe_kernel(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[:])

    for mb in (8, 12, 16, 24, 32, 64, 100):
        n = mb * 1024 * 1024 // (128 * 4)
        try:
            x = jnp.ones((128, n), jnp.float32)
            r = pl.pallas_call(
                probe_kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            )(x)
            np.asarray(r)
            print(f"VMEM probe {mb} MB: OK", flush=True)
        except Exception as e:
            print(f"VMEM probe {mb} MB: FAILED {type(e).__name__}", flush=True)
            break

    vt = jnp.asarray(rng.standard_normal((B, 4 * CH, HW)), jnp.float32)
    vt16 = vt.astype(jnp.bfloat16)
    # u32-packed bf16 pairs: channels (2c, 2c+1) -> one u32 (hi, lo)
    vt16_np = np.asarray(vt16).view(np.uint16).astype(np.uint32)
    vt_pack = jnp.asarray(
        (vt16_np[:, 0::2, :] << 16) | vt16_np[:, 1::2, :]
    )  # [B, 64, HW] uint32

    def make_workload(span):
        n_panels = HW // 128
        base = np.sort(rng.integers(0, max(n_panels - span, 1), (B, n_rows)), axis=1)
        jitter = rng.integers(0, span * 128, (B, n_rows, 128))
        idx = np.minimum(base[..., None] * 128 + jitter, HW - 1).astype(np.int32)
        m4 = rng.random((B, n_rows, 4, 128), dtype=np.float32)
        pmin = (idx // 128).min(-1).astype(np.int32)
        pspan = ((idx // 128).max(-1) - pmin + 1).astype(np.int32)
        lane = idx - pmin[..., None] * 128  # [B, n_rows, 128], < span*128
        pmin3 = pmin.reshape(B, n_rows // R, R)
        pspan3 = pspan.reshape(B, n_rows // R, R)
        return idx, lane, m4, pmin3, pspan3

    # ---------- A2: SMEM scalars + static window + dynamic tail ----------
    def kernel_a2(pmin_ref, pspan_ref, lane_ref, m4_ref, vt_ref, o_ref):
        for r in range(R):
            base = pmin_ref[0, pl.program_id(1), r]
            span = pspan_ref[0, pl.program_id(1), r]
            lane = jnp.broadcast_to(lane_ref[0, r : r + 1, :], (4 * CH, 128))
            acc = jnp.zeros((4 * CH, 128), jnp.float32)
            for s in range(S):  # static fast path
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                l = jnp.clip(lane - s * 128, 0, 127)
                g = jnp.take_along_axis(panel, l, axis=1)
                acc = jnp.where((lane // 128) == s, g, acc)

            def tail(s, acc):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                l = jnp.clip(lane - s * 128, 0, 127)
                g = jnp.take_along_axis(panel, l, axis=1)
                return jnp.where((lane // 128) == s, g, acc)

            acc = lax.fori_loop(S, span, tail, acc)  # no-op when span <= S
            m = m4_ref[0, r]
            h = (
                acc[0 * CH : 1 * CH] * m[0:1]
                + acc[1 * CH : 2 * CH] * m[1:2]
                + acc[2 * CH : 3 * CH] * m[2:3]
                + acc[3 * CH : 4 * CH] * m[3:4]
            )
            for k in (1, 2, 4):
                if k < P:
                    h = h + pltpu.roll(h, 128 - k, 1)
            o_ref[0, :, r * 128 : (r + 1) * 128] = h

    @jax.jit
    def run_a2(vt, lane, m4, pmin, pspan):
        return pl.pallas_call(
            kernel_a2,
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

    # ---------- A3: u32-packed bf16 pairs ----------
    def kernel_a3(pmin_ref, pspan_ref, lane_ref, m4_ref, vt_ref, o_ref):
        for r in range(R):
            base = pmin_ref[0, pl.program_id(1), r]
            span = pspan_ref[0, pl.program_id(1), r]
            lane = jnp.broadcast_to(lane_ref[0, r : r + 1, :], (2 * CH, 128))
            acc = jnp.zeros((2 * CH, 128), jnp.uint32)
            for s in range(S):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                l = jnp.clip(lane - s * 128, 0, 127)
                g = jnp.take_along_axis(panel, l, axis=1)
                acc = jnp.where((lane // 128) == s, g, acc)

            def tail(s, acc):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                l = jnp.clip(lane - s * 128, 0, 127)
                g = jnp.take_along_axis(panel, l, axis=1)
                return jnp.where((lane // 128) == s, g, acc)

            acc = lax.fori_loop(S, span, tail, acc)
            hi = pltpu.bitcast(acc & jnp.uint32(0xFFFF0000), jnp.float32)
            lo = pltpu.bitcast(acc << 16, jnp.float32)  # [2CH, 128] each
            m = m4_ref[0, r]
            # channel pairs (2c, 2c+1) interleave across hi/lo; corners are
            # blocks of CH/2 u32 rows
            H2 = CH // 2
            h = jnp.zeros((H2, 128), jnp.float32)
            hl = jnp.zeros((H2, 128), jnp.float32)
            for x in range(4):
                h = h + hi[x * H2 : (x + 1) * H2] * m[x : x + 1]
                hl = hl + lo[x * H2 : (x + 1) * H2] * m[x : x + 1]
            for k in (1, 2, 4):
                if k < P:
                    h = h + pltpu.roll(h, 128 - k, 1)
                    hl = hl + pltpu.roll(hl, 128 - k, 1)
            o_ref[0, 0:H2, r * 128 : (r + 1) * 128] = h
            o_ref[0, H2:CH, r * 128 : (r + 1) * 128] = hl

    @jax.jit
    def run_a3(vtp, lane, m4, pmin, pspan):
        return pl.pallas_call(
            kernel_a3,
            grid=(B, n_rows // R),
            in_specs=[
                pl.BlockSpec((1, n_rows // R, R), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n_rows // R, R), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, 4, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * CH, HW), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, CH, R * 128), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, CH, n_rows * 128), jnp.float32),
        )(pmin, pspan, lane, m4, vtp)

    # ---------- A4: raw bf16 table ----------
    def kernel_a4(pmin_ref, pspan_ref, lane_ref, m4_ref, vt_ref, o_ref):
        for r in range(R):
            base = pmin_ref[0, pl.program_id(1), r]
            span = pspan_ref[0, pl.program_id(1), r]
            lane = jnp.broadcast_to(lane_ref[0, r : r + 1, :], (4 * CH, 128))
            acc = jnp.zeros((4 * CH, 128), jnp.bfloat16)
            for s in range(S):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                l = jnp.clip(lane - s * 128, 0, 127)
                g = jnp.take_along_axis(panel, l, axis=1)
                acc = jnp.where((lane // 128) == s, g, acc)

            def tail(s, acc):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                l = jnp.clip(lane - s * 128, 0, 127)
                g = jnp.take_along_axis(panel, l, axis=1)
                return jnp.where((lane // 128) == s, g, acc)

            acc = lax.fori_loop(S, span, tail, acc).astype(jnp.float32)
            m = m4_ref[0, r]
            h = (
                acc[0 * CH : 1 * CH] * m[0:1]
                + acc[1 * CH : 2 * CH] * m[1:2]
                + acc[2 * CH : 3 * CH] * m[2:3]
                + acc[3 * CH : 4 * CH] * m[3:4]
            )
            for k in (1, 2, 4):
                if k < P:
                    h = h + pltpu.roll(h, 128 - k, 1)
            o_ref[0, :, r * 128 : (r + 1) * 128] = h

    @jax.jit
    def run_a4(vtb, lane, m4, pmin, pspan):
        return pl.pallas_call(
            kernel_a4,
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
        )(pmin, pspan, lane, m4, vtb)

    for span in (1, 2, 4, 8, 16):
        idx_np, lane_np, m4_np, pmin_np, pspan_np = make_workload(span)
        lane = jnp.asarray(lane_np)
        m4 = jnp.asarray(m4_np)
        pmin = jnp.asarray(pmin_np)
        pspan = jnp.asarray(pspan_np)
        for name, fn, v in (
            ("A2 smem+static f32 ", run_a2, vt),
            ("A3 packed-bf16 u32 ", run_a3, vt_pack),
            ("A4 raw bf16        ", run_a4, vt16),
        ):
            try:
                t = timeit(fn, v, lane, m4, pmin, pspan)
                print(
                    f"span={span:2d} {name}: {t:7.2f} ms  "
                    f"{n_taps_total / (t / 1e3) / 1e6:7.0f} M taps/s",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"span={span:2d} {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
