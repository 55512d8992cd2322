"""Probe: where does _build_tables' time go (transpose / rolls / u32 pack)?"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp
from bevformer_tensorrt_tpu.ops.msda import _build_tables, _pack_bf16_halves


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
    rng = np.random.default_rng(0)
    for name, bs, heads, ch, shapes in (
        ("temporal", 2, 8, 32, ((200, 200),)),
        ("cross", 6, 8, 32, ((116, 200), (58, 100), (29, 50), (15, 25))),
    ):
        keys = sum(h * w for h, w in shapes)
        value = jnp.asarray(rng.standard_normal((bs, keys, heads, ch)), jnp.bfloat16)
        B = bs * heads

        t = timeit(jax.jit(lambda v: _build_tables(v, shapes, True)[0]), value)
        print(f"{name}: full build {t:.2f} ms")

        t = timeit(
            jax.jit(lambda v: v.transpose(0, 2, 3, 1).reshape(B, ch, keys)), value
        )
        print(f"{name}: transpose only {t:.2f} ms")

        vt = jax.jit(lambda v: v.transpose(0, 2, 3, 1).reshape(B, ch, keys))(value)

        def rolls(vt):
            outs = []
            start = 0
            for H, W in shapes:
                v = vt[:, :, start : start + H * W]
                start += H * W
                v4 = jnp.concatenate(
                    [v, jnp.roll(v, -1, 2), jnp.roll(v, -W, 2), jnp.roll(v, -(W + 1), 2)],
                    axis=1,
                )
                pad = (-(H * W)) % 128
                if pad:
                    v4 = jnp.pad(v4, ((0, 0), (0, 0), (0, pad)))
                outs.append(v4)
            return jnp.concatenate(outs, axis=-1)

        t = timeit(jax.jit(rolls), vt)
        print(f"{name}: rolls+concat (bf16) {t:.2f} ms")
        v4 = jax.jit(rolls)(vt)
        t = timeit(jax.jit(lambda v: _pack_bf16_halves(v, ch)), v4)
        print(f"{name}: u32 pack {t:.2f} ms")


if __name__ == "__main__":
    main()
