"""Pipeline-parallel BEVFormer decoder: layer stages, FRAMES as microbatches.

The encoder pipelines over the BEV-query axis (parallel/pp_encoder.py)
because its queries are independent within a layer.  The decoder CANNOT be
microbatched that way: its self-attention couples all object queries inside
every layer.  What the decoder does have is stream-level independence — it
is a pure CONSUMER of the encoder's bev_embed (the temporal recurrence
prev_bev feeds the NEXT frame's encoder, never the decoder), so in steady-
state serving, consecutive FRAMES are independent decoder workloads.  This
module stages the 6 decoder layers (with their per-layer reg branches for
iterative box refinement) over a pp mesh axis and streams F frames through:
frame f occupies stage s while frame f+1 occupies stage s-1.

Exactly equivalent per frame to DetectionTransformerDecoder.__call__
(models/modules/decoder.py:53-91), verified by tests/test_parallel.py and
the dryrun.  The reference has no pipeline parallelism at all (single-GPU
TRT engine, SURVEY.md §2.6).

The pipeline carry packs (query, reference_points, per-layer inter_states /
inter_refs) into ONE [1, nq, D] tensor (pipeline_apply's carry is a single
array).  Stages append their layers' outputs with a roll-and-write-last
scheme, so no stage needs its global layer index: after all L layers,
slot i holds layer i's output in order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.heads.bevformer_head import RegBranch
from ..models.layers import inverse_sigmoid
from ..models.modules.decoder import DecoderLayer
from .pipeline import pipeline_apply, stack_stage_params


def _pack(query, ref, states, refs):
    # [1, nq, C], [1, nq, 3], [L, 1, nq, C], [L, 1, nq, 3] -> [1, nq, D]
    L = states.shape[0]
    parts = [query, ref]
    parts += [states[i] for i in range(L)]
    parts += [refs[i] for i in range(L)]
    return jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=-1)


def _unpack(x, C, L):
    query = x[..., :C]
    ref = x[..., C : C + 3]
    off = C + 3
    states = jnp.stack([x[..., off + i * C : off + (i + 1) * C] for i in range(L)])
    off += L * C
    refs = jnp.stack([x[..., off + i * 3 : off + (i + 1) * 3] for i in range(L)])
    return query, ref, states, refs


def decoder_pp_forward(
    cfg,
    decoder_params,   # {'layer{i}': ...} subtree
    reg_params,       # {'reg_branch{i}': ...} subtree (iterative refinement)
    query,            # [1, nq, C] initial object queries (same every frame)
    query_pos,        # [1, nq, C]
    values,           # [F, 1, bev_h*bev_w, C] one bev_embed per frame
    reference_points, # [1, nq, 3] sigmoid space (same every frame)
    mesh,
    axis: str = "pp",
):
    """Returns (inter_states [F, L, 1, nq, C], inter_refs [F, L, 1, nq, 3])."""
    C = cfg.embed_dims
    L = cfg.decoder_layers
    S = mesh.shape[axis]
    assert L % S == 0, f"decoder_layers {L} must divide into pp={S} stages"
    per_stage = L // S
    F = values.shape[0]
    nq = query.shape[1]
    ss = ((cfg.bev_h, cfg.bev_w),)

    stages = [
        stack_stage_params([
            {
                "layer": decoder_params[f"layer{s * per_stage + j}"],
                "reg": reg_params[f"reg_branch{s * per_stage + j}"],
            }
            for j in range(per_stage)
        ])
        for s in range(S)
    ]
    stacked = stack_stage_params(stages)

    layer = DecoderLayer(cfg)
    reg = RegBranch(cfg)
    dt = jnp.dtype(cfg.dtype)

    def fn(stage_params, x, c):
        q, ref, states, refs = _unpack(x, C, L)
        for j in range(per_stage):
            p_j = jax.tree.map(lambda p: p[j], stage_params)
            ref_2d = ref[..., :2].reshape(1, -1, 1, 2)
            q = layer.apply(
                {"params": p_j["layer"]},
                q.astype(dt), c["query_pos"].astype(dt), c["value"].astype(dt),
                ref_2d, ss,
            ).astype(jnp.float32)
            tmp = reg.apply({"params": p_j["reg"]}, q).astype(jnp.float32)
            ref = jax.nn.sigmoid(
                jnp.concatenate(
                    [
                        tmp[..., 0:2] + inverse_sigmoid(ref[..., 0:2]),
                        tmp[..., 4:5] + inverse_sigmoid(ref[..., 2:3]),
                    ],
                    axis=-1,
                )
            )
            # append: roll out slot 0, write this layer at the end — after
            # all L layers, slot i holds layer i (no global lid needed)
            states = jnp.roll(states, -1, axis=0).at[-1].set(q)
            refs = jnp.roll(refs, -1, axis=0).at[-1].set(ref)
        return _pack(q, ref, states, refs)

    x0 = _pack(
        query, reference_points,
        jnp.zeros((L, 1, nq, C), jnp.float32),
        jnp.zeros((L, 1, nq, 3), jnp.float32),
    )
    x = jnp.broadcast_to(x0, (F, *x0.shape))
    consts = {
        "value": values,                                   # [F, 1, nk, C]
        "query_pos": jnp.broadcast_to(query_pos, (F, *query_pos.shape)),
    }
    out = pipeline_apply(fn, stacked, x, mesh, axis=axis, consts=consts)
    _, _, states, refs = jax.vmap(lambda o: _unpack(o, C, L))(out)
    return states.astype(dt), refs
