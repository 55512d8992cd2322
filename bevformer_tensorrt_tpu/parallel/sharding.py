"""Parameter partition rules: flax param tree -> NamedSharding tree.

Megatron-style tensor parallelism for the BEVFormer transformer, expressed
as path-regex -> PartitionSpec rules and resolved by GSPMD (the
scaling-book recipe: annotate leaves, let XLA insert the collectives):

  * column-parallel (shard output features):  q/k/v/value projections, FFN
    fc1 — activations become head-sharded / hidden-sharded, no comm.
  * row-parallel (shard input features): output projections, FFN fc2 — XLA
    inserts one psum per block, riding ICI.
  * everything else (backbone convs, norms, embeddings, cls/reg branches)
    replicated; the batch axis is dp.

The reference has no TP at all (SURVEY.md §2.6) — this layer is the
TPU-native differentiator.  Rules are matched against '/'-joined param
paths; first match wins.
"""
from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec for 'kernel'-like leaf). Bias handling is derived: a
# column-parallel matmul's bias shards on the same axis as the kernel's out
# dim; row-parallel biases replicate.
DEFAULT_RULES: List[Tuple[str, P]] = [
    # column-parallel: shard the output-feature dim
    (r".*(q_proj|k_proj|v_proj|value_proj)/kernel$", P(None, "tp")),
    (r".*(q_proj|k_proj|v_proj|value_proj)/bias$", P("tp")),
    (r".*ffn[^/]*/fc1/kernel$", P(None, "tp")),
    (r".*ffn[^/]*/fc1/bias$", P("tp")),
    # row-parallel: shard the input-feature dim, psum after
    (r".*(output_proj|out_proj)/kernel$", P("tp", None)),
    (r".*ffn[^/]*/fc2/kernel$", P("tp", None)),
    # default: replicated
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def spec_for_path(path: str, rules=DEFAULT_RULES) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params: Any, rules=DEFAULT_RULES) -> Any:
    """Build a NamedSharding pytree matching `params`.

    Falls back to replication when a rule's sharded dim doesn't divide the
    actual parameter dim (e.g. micro test configs)."""

    def leaf(path, x):
        spec = spec_for_path(_path_str(path), rules)
        # validate divisibility; degrade to replicated if it doesn't fit
        for dim, axis in zip(x.shape, tuple(spec) + (None,) * (x.ndim - len(spec))):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else 1
            if dim % size != 0:
                return NamedSharding(mesh, P())
        if len(spec) > x.ndim:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)
