"""Microbenchmark: candidate Pallas MSDA gather kernels at controlled panel span.

The production question (NOTES_r1.md): after binning taps so each 128-tap row
touches `span` consecutive 128-key panels, which in-kernel primitive resolves
a (tap-row, panel) visit fastest on v5e?

  A0. vreg lane-gather, gather only (round-1 lane_gather shape)
  A1. A0 + in-kernel bilinear corner fuse (reshape-mult-sum) + lane-roll P-sum
  B.  one-hot MXU: per visit build a [128tap x 128key] one-hot (VPU compares)
      and matmul with the key-major panel (MXU); out-of-panel taps give zero
      rows so panel accumulation is add-only.  bf16-friendly.
  C.  wide-window single take_along_axis (window = 2048 keys anchored at the
      row's min panel) — no per-panel loop at all; rows wider than the
      window would need a fallback in production.

Also measures the per-frame binning costs: XLA argsort of per-(cam,z) ref
keys and the take_along_axis un-permute of per-z partial outputs.

Run: python tools/kernel_bench.py [HW] (default 23296 = base level-0 padded)
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


def make_workload(rng, B, n_rows, HW, span, P):
    """Sorted-ish tap indices: each 128-tap row clusters in `span` panels."""
    n_panels = HW // 128
    base = np.sort(rng.integers(0, max(n_panels - span, 1), (B, n_rows)), axis=1)
    jitter = rng.integers(0, span * 128, (B, n_rows, 128))
    idx = np.minimum(base[..., None] * 128 + jitter, HW - 1).astype(np.int32)
    m4 = rng.random((B, n_rows, 4, 128), dtype=np.float32)
    return idx, m4


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    HW = int(sys.argv[1]) if len(sys.argv) > 1 else 23296
    B, CH, P = 48, 32, 8
    R = 8               # tap rows per grid step
    n_rows = 880
    n_rows -= n_rows % R
    n_taps_total = B * n_rows * 128
    WIN = 2048

    vt = jnp.asarray(rng.standard_normal((B, 4 * CH, HW)), jnp.float32)   # A,C
    vk = jnp.asarray(rng.standard_normal((B, HW, 4 * CH)), jnp.float32)   # B f32
    vk16 = vk.astype(jnp.bfloat16)

    # ---------------- A0: vreg lane-gather only ----------------
    def kernel_a0(idx_ref, vt_ref, o_ref):
        for r in range(R):
            row = idx_ref[0, r : r + 1, :]                     # [1, 128]
            pmin = jnp.min(row) // 128
            pmax = jnp.max(row) // 128
            idx_b = jnp.broadcast_to(row, (4 * CH, 128))

            def body(p, acc):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of(p * 128, 128), 128)]
                lane = jnp.clip(idx_b - p * 128, 0, 127)
                g = jnp.take_along_axis(panel, lane, axis=1)
                return jnp.where((idx_b // 128) == p, g, acc)

            g = lax.fori_loop(pmin, pmax + 1, body, jnp.zeros((4 * CH, 128), jnp.float32))
            o_ref[0, :, r * 128 : (r + 1) * 128] = g

    @jax.jit
    def run_a0(vt, idx):
        return pl.pallas_call(
            kernel_a0,
            grid=(B, n_rows // R),
            in_specs=[
                pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * CH, HW), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 4 * CH, R * 128), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, 4 * CH, n_rows * 128), jnp.float32),
        )(idx, vt)

    # ------------- A1: + corner fuse + roll-tree P-sum -------------
    def kernel_a1(idx_ref, m4_ref, vt_ref, o_ref):
        for r in range(R):
            row = idx_ref[0, r : r + 1, :]
            pmin = jnp.min(row) // 128
            pmax = jnp.max(row) // 128
            idx_b = jnp.broadcast_to(row, (4 * CH, 128))

            def body(p, acc):
                panel = vt_ref[0, :, pl.ds(pl.multiple_of(p * 128, 128), 128)]
                lane = jnp.clip(idx_b - p * 128, 0, 127)
                g = jnp.take_along_axis(panel, lane, axis=1)
                return jnp.where((idx_b // 128) == p, g, acc)

            g = lax.fori_loop(pmin, pmax + 1, body, jnp.zeros((4 * CH, 128), jnp.float32))
            m = m4_ref[0, r]                                   # [4, 128]
            h = (
                g[0 * CH : 1 * CH] * m[0:1]
                + g[1 * CH : 2 * CH] * m[1:2]
                + g[2 * CH : 3 * CH] * m[2:3]
                + g[3 * CH : 4 * CH] * m[3:4]
            )                                                  # [CH, 128]
            # P-sum: log-tree of lane rolls; lane q*P holds the query sum,
            # other lanes hold garbage partial sums (masked out by XLA side).
            for k in (1, 2, 4):
                if k < P:
                    h = h + pltpu.roll(h, -k, 1)
            o_ref[0, :, r * 128 : (r + 1) * 128] = h

    @jax.jit
    def run_a1(vt, idx, m4):
        return pl.pallas_call(
            kernel_a1,
            grid=(B, n_rows // R),
            in_specs=[
                pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, 4, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * CH, HW), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, CH, R * 128), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, CH, n_rows * 128), jnp.float32),
        )(idx, m4, vt)

    # ---------------- B: one-hot MXU, fused ----------------
    def kernel_b(idxt_ref, m4t_ref, vk_ref, o_ref, *, dtype):
        iota = lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        for r in range(R):
            col = idxt_ref[0, 0, :, r : r + 1]                 # [128, 1] taps on sublanes
            pmin = jnp.min(col) // 128
            pmax = jnp.max(col) // 128

            def body(p, acc):
                panel = vk_ref[0, pl.ds(pl.multiple_of(p * 128, 128), 128), :]
                onehot = (col - p * 128 == iota).astype(dtype)
                return acc + jnp.dot(
                    onehot, panel.astype(dtype), preferred_element_type=jnp.float32
                )

            g = lax.fori_loop(
                pmin, pmax + 1, body, jnp.zeros((128, 4 * CH), jnp.float32)
            )  # [128tap, 4ch]
            m = m4t_ref[0, r]                                  # [128, 4]
            h = (
                g[:, 0 * CH : 1 * CH] * m[:, 0:1]
                + g[:, 1 * CH : 2 * CH] * m[:, 1:2]
                + g[:, 2 * CH : 3 * CH] * m[:, 2:3]
                + g[:, 3 * CH : 4 * CH] * m[:, 3:4]
            )                                                  # [128, CH]
            o_ref[0, r * 128 : (r + 1) * 128, :] = h

    def run_b_for(dtype):
        @jax.jit
        def run_b(vkk, idxt, m4t):
            return pl.pallas_call(
                functools.partial(kernel_b, dtype=dtype),
                grid=(B, n_rows // R),
                in_specs=[
                    pl.BlockSpec((1, 1, 128, R), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, R, 128, 4), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, HW, 4 * CH), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, R * 128, CH), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((B, n_rows * 128, CH), jnp.float32),
            )(idxt, m4t, vkk)

        return run_b

    # ---------------- C: wide-window single gather ----------------
    def kernel_c(idx_ref, m4_ref, vt_ref, o_ref):
        for r in range(R):
            row = idx_ref[0, r : r + 1, :]
            pmin = jnp.min(row) // 128
            base = pmin * 128
            idx_b = jnp.broadcast_to(row, (4 * CH, 128))
            win = vt_ref[0, :, pl.ds(pl.multiple_of(base, 128), WIN)]  # [4ch, WIN]
            lane = jnp.clip(idx_b - base, 0, WIN - 1)
            g = jnp.take_along_axis(win, lane, axis=1)
            m = m4_ref[0, r]
            h = (
                g[0 * CH : 1 * CH] * m[0:1]
                + g[1 * CH : 2 * CH] * m[1:2]
                + g[2 * CH : 3 * CH] * m[2:3]
                + g[3 * CH : 4 * CH] * m[3:4]
            )
            o_ref[0, :, r * 128 : (r + 1) * 128] = h

    @jax.jit
    def run_c(vt, idx, m4):
        return pl.pallas_call(
            kernel_c,
            grid=(B, n_rows // R),
            in_specs=[
                pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, 4, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * CH, HW), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, CH, R * 128), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, CH, n_rows * 128), jnp.float32),
        )(idx, m4, vt)

    # ---------------- XLA baseline ----------------
    @jax.jit
    def run_xla(vk, idx, m4):
        g = jnp.take_along_axis(
            vk.reshape(B, HW, 4 * CH),
            idx.reshape(B, n_rows * 128)[..., None],
            axis=1,
        )  # [B, taps, 4ch]
        h = jnp.einsum(
            "btxc,btx->btc",
            g.reshape(B, n_rows * 128, 4, CH),
            m4.transpose(0, 1, 3, 2).reshape(B, n_rows * 128, 4),
        )
        return h.reshape(B, n_rows * 128 // P, P, CH).sum(2)

    for span in (1, 2, 4, 8, 16):
        idx_np, m4_np = make_workload(rng, B, n_rows, HW, span, P)
        idx = jnp.asarray(idx_np)
        m4 = jnp.asarray(m4_np)
        idxt = jnp.asarray(
            np.ascontiguousarray(
                idx_np.reshape(B, n_rows // R, R, 128).transpose(0, 1, 3, 2)
            )
        )  # [B, n_rows//R, 128, R]
        m4t = jnp.asarray(np.ascontiguousarray(m4_np.transpose(0, 1, 3, 2)))  # [B,n_rows,128,4]

        for name, fn, args in (
            ("A0 gather-only f32", run_a0, (vt, idx)),
            ("A1 fused f32     ", run_a1, (vt, idx, m4)),
            ("B onehot-MXU f32 ", run_b_for(jnp.float32), (vk, idxt, m4t)),
            ("B onehot-MXU bf16", run_b_for(jnp.bfloat16), (vk16, idxt, m4t)),
            ("C window-2048 f32", run_c, (vt, idx, m4)),
            ("XLA take_along   ", run_xla, (vk, idx, m4)),
        ):
            if span > 1 and name.startswith("XLA"):
                continue  # span-invariant
            try:
                t = timeit(fn, *args)
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

    # ---------------- binning costs ----------------
    keys = jnp.asarray(rng.random((6, 14080), dtype=np.float32))

    @jax.jit
    def f_sort(k):
        return jnp.argsort(k, axis=1)

    t = timeit(f_sort, keys)
    print(f"argsort [6, 14080] (per-frame shared sigma): {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
