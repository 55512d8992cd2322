"""Activation sharding constraints (sequence/context parallelism hooks).

The reference has no SP at all — its longest axis (40k BEV queries) lives on
one GPU (SURVEY.md §2.6).  Here the BEV-query axis is annotated with
`with_sharding_constraint` under an ambient mesh (`jax.set_mesh`), so the
encoder's 40k-query tensors split over the tp axis and the MSDA gathers
stay shard-local (value replicated, indices sharded).  With no ambient mesh
these are identity — single-chip paths and CPU tests are unaffected.
"""
from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def _ambient_mesh():
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        return None
    if mesh is None or getattr(mesh, "empty", True):
        return None
    return mesh


def maybe_shard(x, *spec):
    """Constrain `x` to PartitionSpec(*spec) if an ambient mesh is set and
    the named axes exist and divide the corresponding dims."""
    mesh = _ambient_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    for dim, ax in zip(x.shape, spec):
        if ax is None:
            continue
        if ax not in names or dim % mesh.shape[ax] != 0:
            return x
    try:
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except Exception:
        return x


def shard_bev_queries(x):
    """[..., nq, C] BEV-query tensors: shard nq over tp."""
    if x.ndim == 3:
        return maybe_shard(x, None, "tp", None)
    return x
