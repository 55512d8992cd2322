"""Pipeline parallelism: GPipe-style homogeneous-stage pipelining over a
mesh axis, built on shard_map + ppermute.

The reference has NO pipeline parallelism (SURVEY.md §2.6 marks it absent;
its TRT engine is strictly single-GPU) — this is TPU-native new capability,
shaped for this framework's repeated-block structure: the BEVFormer
encoder/decoder layers are HOMOGENEOUS stages (identical signatures and
activation shapes), which is exactly the GPipe sweet spot.  Each pp-mesh
device holds one contiguous group of layers' params; microbatches stream
through the stages with `ppermute` hops over ICI; the bubble is the classic
(S-1)/(M+S-1) fraction.

Works under jit/pjit, differentiable (shard_map + ppermute have
transposition rules, so jax.grad produces the reverse pipeline), and
composes with dp/tp axes on the same mesh — the scaling-book recipe with
explicit per-stage placement where GSPMD's automatic propagation would
otherwise replicate every layer's weights.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
import warnings

with warnings.catch_warnings():
    # jax 0.8 renamed shard_map with a changed signature (check_vma); the
    # experimental entry still has the stable (mesh, in_specs, out_specs,
    # check_rep) API this module uses
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(per_stage_params: list) -> Any:
    """Stack S per-stage param pytrees along a new leading stage axis.
    Shard the result's leading axis over the pp mesh axis (see
    `stage_param_sharding`) so each device holds only its stage's slice."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def stage_param_sharding(mesh: Mesh, stacked_params: Any, axis: str = "pp") -> Any:
    """NamedSharding tree placing each stage's params on its pp device."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))),
        stacked_params,
    )


def pipeline_apply(
    fn: Callable,          # (stage_params, x[, c]) -> y, same shape/dtype as x
    stacked_params: Any,   # pytree with leading stage axis [S, ...]
    x: jax.Array,          # [M, ...] microbatches (M >= 1)
    mesh: Mesh,
    axis: str = "pp",
    consts: Any = None,    # optional pytree of [M, ...] per-microbatch
                           # constants, replicated to every stage (the stage
                           # indexes its current microbatch's slice; they do
                           # NOT hop with the activations)
) -> jax.Array:
    """Run M microbatches through S homogeneous pipeline stages.

    Semantics: out[m] = fn(p[S-1], fn(p[S-2], ... fn(p[0], x[m]))) — i.e.
    exactly sequential layer application, verified by
    tests/test_parallel.py::test_pipeline_matches_sequential.

    Schedule: M + S - 1 ticks.  At tick t, stage s processes microbatch
    t - s (when 0 <= t - s < M); activations hop s -> s+1 via ppermute.
    Dead ticks compute on zeros and are masked — wasted FLOPs are the
    pipeline bubble, not a correctness concern.

    With `consts`, fn is called as fn(stage_params, x_m, consts_m) where
    consts_m is each leaf's [t - s]-th slice — side inputs that vary per
    microbatch but are identical for every stage (e.g. per-query geometry
    when microbatching the BEV-query axis, see parallel/pp_encoder.py).
    """
    S = mesh.shape[axis]
    M = x.shape[0]
    for leaf in jax.tree.leaves(consts) if consts is not None else ():
        if leaf.shape[0] != M:
            raise ValueError(
                f"pipeline_apply: consts leading axis {leaf.shape[0]} != "
                f"microbatch count {M}"
            )
    # shard_map accepts any multiple of the pp axis for the leading dim, but
    # `body` squeezes each device's block with p[0] — a k*S leading axis would
    # silently drop k-1 stages per device.  Require exactly one stage/device.
    for leaf in jax.tree.leaves(stacked_params):
        if leaf.shape[0] != S:
            raise ValueError(
                f"pipeline_apply: stacked_params leading axis {leaf.shape[0]} "
                f"!= mesh '{axis}' size {S} (one stage per device required)"
            )
    perm = [(i, (i + 1) % S) for i in range(S)]  # ring; last hop's payload unused

    def body(params_s, xs, cs):
        # params_s: this device's stage params (leading axis stripped by
        # shard_map to size 1) — squeeze it
        params_s = jax.tree.map(lambda p: p[0], params_s)
        sidx = lax.axis_index(axis)
        y_shape = xs.shape[1:]

        def tick(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped; masked when t >= M)
            x_in = lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1), 0,
                                            keepdims=False)
            inp = jnp.where(sidx == 0, x_in, state)
            if consts is None:
                y = fn(params_s, inp)
            else:
                # stage s at tick t holds microbatch t - s; fetch its consts
                # (dead ticks gather a clamped slice and are masked anyway)
                m_dev = jnp.clip(t - sidx, 0, M - 1)
                c_m = jax.tree.map(
                    lambda c: lax.dynamic_index_in_dim(c, m_dev, 0, keepdims=False),
                    cs,
                )
                y = fn(params_s, inp, c_m)
            # last stage emits microbatch t - (S-1)
            m = t - (S - 1)
            outs = lax.cond(
                (m >= 0) & (m < M),
                lambda o: lax.dynamic_update_index_in_dim(o, y, jnp.clip(m, 0, M - 1), 0),
                lambda o: o,
                outs,
            )
            state = lax.ppermute(y, axis, perm)
            return (state, outs), None

        state0 = jnp.zeros(y_shape, xs.dtype)
        outs0 = jnp.zeros((M, *y_shape), xs.dtype)
        (_, outs), _ = lax.scan(tick, (state0, outs0), jnp.arange(M + S - 1))
        # every device carries an `outs` buffer but only the LAST stage's is
        # real; psum after masking selects it (cheap: one [M, ...] all-reduce
        # at pipeline exit, the GPipe output gather)
        outs = jnp.where(sidx == S - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, axis)

    pp_spec = P(axis)
    cs = consts if consts is not None else ()
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: pp_spec, stacked_params),
            P(*([None] * x.ndim)),
            jax.tree.map(lambda c: P(*([None] * c.ndim)), cs),
        ),
        out_specs=P(*([None] * x.ndim)),
        check_rep=False,
    )(stacked_params, x, cs)
