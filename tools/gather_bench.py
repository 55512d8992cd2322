"""Microbenchmark: TPU lowering of the MSDA gather in different forms.

The op gathers rows of ch=32 floats from per-(cam, head) tables
[HW~30k, 32] at ~128 taps per query x 40k queries.  This script measures
which formulation XLA/Mosaic executes at bandwidth.
"""
from __future__ import annotations

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

    rng = np.random.default_rng(0)
    B, HW, H, CH = 6, 30825, 8, 32
    NQ, TAPS = 4096, 128
    dtype = jnp.bfloat16

    v_bhwc = jnp.asarray(rng.standard_normal((B, HW, H, CH)), dtype)   # [bs, HW, heads, ch]
    v_bh_wc = jnp.asarray(rng.standard_normal((B * H, HW, CH)), dtype)  # [bs*heads, HW, ch]
    idx = jnp.asarray(rng.integers(0, HW, (B, NQ * TAPS, H)), jnp.int32)
    idx2 = jnp.asarray(rng.integers(0, HW, (B * H, NQ * TAPS)), jnp.int32)

    bytes_moved = B * NQ * TAPS * H * CH * 2 / 1e9  # GB

    @jax.jit
    def f_take_along(v, i):
        return jnp.take_along_axis(v, i[..., None], axis=1)

    t = timeit(f_take_along, v_bhwc, idx)
    print(f"take_along_axis [bs,HW,heads,ch]: {t:.1f} ms  ({bytes_moved / (t/1e3):.0f} GB/s)", flush=True)

    @jax.jit
    def f_batched_rows(v, i):
        return jnp.take_along_axis(v, i[..., None], axis=1)

    t = timeit(f_batched_rows, v_bh_wc, idx2)
    print(f"take_along_axis [bs*heads,HW,ch]: {t:.1f} ms  ({bytes_moved / (t/1e3):.0f} GB/s)", flush=True)

    @jax.jit
    def f_vmap_rows(v, i):
        return jax.vmap(lambda vt, it: vt[it])(v, i)

    t = timeit(f_vmap_rows, v_bh_wc, idx2)
    print(f"vmap v[idx] rows: {t:.1f} ms  ({bytes_moved / (t/1e3):.0f} GB/s)", flush=True)

    # chunked variant (mirrors the lax.map in the op)
    @jax.jit
    def f_chunked(v, i):
        ic = i.reshape(B * H, 4, NQ * TAPS // 4).transpose(1, 0, 2)
        return jax.lax.map(lambda ii: jnp.take_along_axis(v, ii[..., None], axis=1), ic)

    t = timeit(f_chunked, v_bh_wc, idx2)
    print(f"chunked take_along(20): {t:.1f} ms  ({bytes_moved / (t/1e3):.0f} GB/s)", flush=True)

    # pallas dynamic gather attempt
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def gk(v_ref, i_ref, o_ref):
            o_ref[:] = v_ref[:][i_ref[:]]

        QB = 8192

        @jax.jit
        def f_pallas(v, i):
            return pl.pallas_call(
                gk,
                grid=(B * H, NQ * TAPS // QB),
                in_specs=[
                    pl.BlockSpec((1, HW, CH), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, QB), lambda b, q: (b, q), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, QB, CH), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B * H, NQ * TAPS, CH), v.dtype),
            )(v, i)

        # kernel refs are [1, ...] blocks; index inside
        def gk2(v_ref, i_ref, o_ref):
            o_ref[0] = jnp.take(v_ref[0], i_ref[0], axis=0)

        @jax.jit
        def f_pallas2(v, i):
            return pl.pallas_call(
                gk2,
                grid=(B * H, NQ * TAPS // QB),
                in_specs=[
                    pl.BlockSpec((1, HW, CH), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, QB), lambda b, q: (b, q), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, QB, CH), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B * H, NQ * TAPS, CH), v.dtype),
            )(v, i)

        t = timeit(f_pallas2, v_bh_wc, idx2)
        print(f"pallas jnp.take in-kernel: {t:.1f} ms  ({bytes_moved / (t/1e3):.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"pallas gather failed: {type(e).__name__}: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
