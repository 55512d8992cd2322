"""Sorted-tap MSDA gather kernel — the TPU-native deformable-attention core.

TPU-native replacement for the per-thread bilinear gather loop of the
reference plugin (TensorRT/plugin/multi_scale_deformable_attn/
multiScaleDeformableAttnKernel.cu:643-687), designed from v5e measurements
(tools/kernel_bench{,2}.py, NOTES_r1.md):

  * XLA's row gather is index-rate bound (~46 M taps/s); Mosaic's vreg
    lane-gather (`take_along_axis` along lanes) resolves a [ch, 128]
    panel visit in ~115 cycles, so the kernel keeps per-(cam,head) value
    tables TRANSPOSED and VMEM-resident, splits keys into 128-wide panels,
    and sweeps only the panels each 128-tap row actually touches.
  * All per-row scalar work (min panel, span) is precomputed by XLA and read
    from SMEM — in-kernel cross-lane reductions and dynamic loop setup were
    the dominant overhead in earlier variants.
  * Rows are grouped by query block: row (l, p) of a block holds the taps of
    128 consecutive queries at one (level, point).  All L*P rows of a block
    accumulate into one [ch, 128] register tile -> ONE output store per
    block, and the level/point/z sums never materialize in HBM.
  * The bilinear corners are corner-packed into the table channels
    (ops/msda._corner_pack) and fused per row with per-corner weights `m4`
    (bilinear x attention weight, slot-remapped for borders).  When the
    packed table would overflow VMEM (v5e: ~16 MB scoped, double-buffered
    across the grid's table axis), the caller splits the corners into
    groups and sums the partial outputs — same taps, smaller tables.
  * The table is stored as uint32 pairs of bf16 channels — Mosaic's
    dynamic_gather needs 32-bit data, and packing halves both VMEM and the
    vregs per visit.  (A plain f32 table variant exists for interpret-mode
    tests and fp32-exactness checks.)

Exact for ANY tap distribution: the per-row [pmin, pmin+span) sweep covers
every referenced panel; sorting the queries (by projected image position)
only makes it fast, never changes results.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    pmin_ref, pspan_ref, alive_ref, lane_ref, m4_ref, vt_ref3, o_ref,
    *, rows, ch, corners, packed, row_group, emit_rows=False, q_blocks=1,
    two_plane=False, panel_width=1,
):
    """One grid step = `q_blocks` query blocks (128 queries each) of one
    (cam*head) table.

    pmin/pspan [1, QB, rows//row_group] i32 (SMEM); lane
    [1, rows, (2,) QBB*128] i32; m4 [1, rows, corners, QBB*128]; vt
    [1, CHT, HWp] (u32 pairs or f32); o [1, ch, QBB*128] f32.  lane/m4 are
    query-minor with the QB axis folded into lanes — exactly the layout the
    XLA prep produces, so no relayout sits between prep and kernel.

    `q_blocks` amortizes the per-program fixed cost (grid step + tiny
    block DMAs + output store, ~1.2 us measured at temporal shapes): dead
    blocks — ~45% of cross-attention blocks after compaction, and almost
    every block of a key-range split's off-range pass — collapse from one
    full program each to one pl.when branch inside a live program.

    `row_group` rows (points of one level, whose sampling windows overlap
    because they share a reference point) are swept TOGETHER over the union
    of their panel ranges: the per-visit fixed overhead (dynamic-slice setup,
    loop carry — measured ~110 ns vs ~15 ns per 32 gathered sublanes) is
    paid once per union panel instead of once per row panel.

    (A manually-DMA'd single-buffered table scratch was tried — it would
    double the residency budget — but Mosaic hangs compiling the
    ANY-space + persistent-scratch pattern; the corner-group split in the
    caller covers the overflow cases instead.)
    """
    qq = pl.program_id(1)

    int8 = packed == "int8"
    sub = 4 if int8 else (2 if packed else 1)  # channels per table word
    Hs = ch // sub

    def one_block(j, qb):
        # whole-block skip: write zeros, sweep nothing.
        @pl.when(alive_ref[0, qb, 0] == 0)
        def _dead():
            o_ref[0, :, pl.ds(j * 128, 128)] = jnp.zeros(
                (o_ref.shape[1], 128), o_ref.dtype
            )
        # lane/m4 arrive query-MINOR ([.., rows, .., QBp*128]) so the prep
        # never relayouts them; j picks this block's 128-lane window.

        @pl.when(alive_ref[0, qb, 0] != 0)
        def _live():
            hs = [jnp.zeros((Hs, 128), jnp.float32) for _ in range(sub)]
            _blend(
                qb, j, pmin_ref, pspan_ref, lane_ref, m4_ref, vt_ref3, o_ref,
                hs, rows=rows, ch=ch, corners=corners, packed=packed,
                row_group=row_group, emit_rows=emit_rows, two_plane=two_plane,
                panel_width=panel_width,
            )

    if q_blocks == 1:
        one_block(0, qq)  # static path (no dynamic ref indexing)
    else:
        # fori over the program's blocks keeps the Mosaic program size
        # CONSTANT in q_blocks (a python unroll multiplied the kernel body)
        def body(j, _):
            one_block(j, qq * q_blocks + j)
            return 0

        lax.fori_loop(0, q_blocks, body, 0)


def _blend(
    qb, j, pmin_ref, pspan_ref, lane_ref, m4_ref, vt_ref3, o_ref, hs,
    *, rows, ch, corners, packed, row_group, emit_rows, two_plane=False,
    panel_width=1,
):
    int8 = packed == "int8"
    sub = 4 if int8 else (2 if packed else 1)
    Hs = ch // sub
    # two_plane: the table stores only corner planes (k, k+W) — half the
    # VMEM — and each tap carries TWO lanes (key, key+1); both variants are
    # folded into ONE gather of the same total sublanes as the 4-plane
    # layout, so the per-visit cost is unchanged.  Row layout of the
    # gathered block: (p, variant a/b, plane, Hs) vs 4-plane (p, corner, Hs).
    SP = 2 if two_plane else corners      # stored planes in the table
    LV = 2 if two_plane else 1            # lane variants per tap
    nrows = LV * SP * Hs                  # gathered sublanes per tap row
    RG = row_group

    for g in range(rows // RG):
        base = pmin_ref[0, qb, g]
        span = pspan_ref[0, qb, g]
        # j may be a traced fori index (q_blocks > 1) — use pl.ds slices
        if two_plane:
            lane_g = lane_ref[
                0, g * RG : (g + 1) * RG, :, pl.ds(j * 128, 128)
            ].reshape(RG, 2, 128)
        else:
            lane_g = lane_ref[
                0, g * RG : (g + 1) * RG, pl.ds(j * 128, 128)
            ].reshape(RG, 1, 128)
        # a lane's in-panel index is lane & 127 for the panel it belongs to
        # (and don't-care elsewhere — the select masks it), so the per-visit
        # work is one compare + one gather + one select; the subtract/clip/
        # divide of earlier variants are hoisted here, once per group.
        lane_mod = jnp.broadcast_to(
            (lane_g & 127).reshape(RG, LV, 1, 128), (RG, LV, SP * Hs, 128)
        ).reshape(RG * nrows, 128)
        panel_id = jnp.broadcast_to(
            (lane_g >> 7).reshape(RG, LV, 1, 128), (RG, LV, SP * Hs, 128)
        ).reshape(RG * nrows, 128)

        NP = panel_width
        if NP == 1:
            def visit(s, acc):
                panel = vt_ref3[0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), 128)]
                pb = jnp.broadcast_to(
                    panel.reshape(1, 1, SP * Hs, 128), (RG, LV, SP * Hs, 128)
                ).reshape(RG * nrows, 128)
                gat = jnp.take_along_axis(pb, lane_mod, axis=1)
                return jnp.where(panel_id == s, gat, acc)

            zero = jnp.zeros((RG * nrows, 128), vt_ref3.dtype)
            acc = lax.fori_loop(0, span, visit, zero)
        else:
            # NP panels per loop iteration: one wide table slice, NP gathers
            # + selects — amortizes the ~70ns/iteration loop machinery
            # (kernel_bench3: 4-panel is ~1.45x the 1-panel visit rate at
            # cross-attention spans).  The caller pads the table key axis by
            # (NP-1) panels so the widest slice stays in range.
            def visit(i, acc):
                s = i * NP
                pw = vt_ref3[
                    0, :, pl.ds(pl.multiple_of((base + s) * 128, 128), NP * 128)
                ]
                for k in range(NP):
                    pk = jnp.broadcast_to(
                        pw[:, k * 128 : (k + 1) * 128].reshape(1, 1, SP * Hs, 128),
                        (RG, LV, SP * Hs, 128),
                    ).reshape(RG * nrows, 128)
                    gk = jnp.take_along_axis(pk, lane_mod, axis=1)
                    acc = jnp.where(panel_id == s + k, gk, acc)
                return acc

            zero = jnp.zeros((RG * nrows, 128), vt_ref3.dtype)
            acc = lax.fori_loop(0, (span + NP - 1) // NP, visit, zero)

        # unpack the table word into `sub` f32 channel planes:
        #   int8: byte j (msb first) = channel quarter j (sign-extended)
        #   bf16: hi/lo half = channel half
        #   f32:  identity
        if int8:
            ai = pltpu.bitcast(acc, jnp.int32)
            planes = [
                ((ai << (8 * j)) >> 24).astype(jnp.float32) for j in range(4)
            ]
        elif packed:
            planes = [
                pltpu.bitcast(acc & jnp.uint32(0xFFFF0000), jnp.float32),
                pltpu.bitcast(acc << 16, jnp.float32),
            ]
        else:
            planes = [acc]

        for p in range(RG):
            # m4 arrives bf16 on the packed paths (halves the largest prep
            # tensor's HBM traffic + VMEM block); blend math stays f32.
            m = m4_ref[0, g * RG + p, :, pl.ds(j * 128, 128)].reshape(
                corners, 128
            ).astype(jnp.float32)
            if emit_rows:
                hs = [jnp.zeros((Hs, 128), jnp.float32) for _ in range(sub)]
            for x in range(corners):
                if two_plane:
                    # corners (k, k+1, k+W, k+W+1) = (a-plane0, b-plane0,
                    # a-plane1, b-plane1)
                    r0 = ((p * LV + (x & 1)) * SP + (x >> 1)) * Hs
                else:
                    r0 = (p * corners + x) * Hs
                for s in range(sub):
                    hs[s] = hs[s] + planes[s][r0 : r0 + Hs] * m[x : x + 1]
            if emit_rows:
                r = (g * RG + p) * ch
                for s in range(sub):
                    o_ref[
                        0, r + s * Hs : r + (s + 1) * Hs, pl.ds(j * 128, 128)
                    ] = hs[s].astype(o_ref.dtype)

    if not emit_rows:
        for s in range(sub):
            o_ref[0, s * Hs : (s + 1) * Hs, pl.ds(j * 128, 128)] = hs[s].astype(
                o_ref.dtype
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows", "ch", "corners", "packed", "interpret", "row_group",
        "emit_rows", "tap_share", "out_dtype", "q_blocks", "two_plane",
        "panel_width", "tail_padded", "keep_pad",
    ),
)
def msda_gather_sorted(
    table: jax.Array,   # [B, CHT, HWp] — u32 ch-pairs (packed) or f32
    lane: jax.Array,    # [Bt, rows, (2,) QB*128] i32: key - group pmin*128
    m4: jax.Array,      # [Bt, rows, corners, QB*128] corner wts (x attn)
    pmin: jax.Array,    # [Bt, QB, rows//row_group] i32 first panel per group
    pspan: jax.Array,   # [Bt, QB, rows//row_group] i32 union panel count
    rows: int,
    ch: int,
    corners: int = 4,
    packed: bool = True,
    interpret: bool = False,
    row_group: int = 1,
    emit_rows: bool = False,
    tap_share: int = 1,
    out_dtype=jnp.float32,
    alive: jax.Array | None = None,  # [Bt, QB] i32; 0 = all-zero block (skip)
    q_blocks: int = 1,  # query blocks per program (amortizes program cost)
    two_plane: bool = False,  # table stores (k, k+W) only; lane has 2 variants
    panel_width: int = 1,  # panels per sweep iteration (4 for wide-span rows)
    tail_padded: bool = False,  # caller pre-padded (panel_width-1) tail
    # panels into the table build (ops/msda._roll_pad_levels tail_panels) —
    # skips the whole-table re-pad here (measured 1.15 ms/build at base)
    keep_pad: bool = False,  # return the q_blocks-padded output
    # [B, out_ch, ceil(QB/QBB)*QBB*128] — callers that feed a GEMM slice the
    # (much smaller) GEMM output instead; the tail-slice here was an 85 MB
    # copy per DCN call (11 ms/frame at base, trace 2026-08-20)
) -> jax.Array:
    """Returns [B, ch, QB*128] f32.

    two_plane=True: the table stores corner planes (k, k+W) only (HALF the
    VMEM — often the difference between one kernel call and a key-range
    split) and `lane` carries both lane variants (key, key+1) as
    [Bt, QB, rows, 2, 128]; the visit gathers both variants from the
    2-plane panel in one take_along_axis of the same total sublanes.

    out[b, :, q] = sum over the block's rows r and corners x of
      m4[b, qb, r, x, q%128] * table_channels[x*ch + :, key].

    Channel layout when packed: the table pairs each corner block's channel
    halves (k, k + ch/2) as (hi, lo) u32 halves (ops/msda._pack_bf16_halves),
    so the kernel's hi/lo accumulators are channels [0, ch/2) and [ch/2, ch)
    directly — the output needs no un-interleave.

    emit_rows=True writes each row's corner-blended sample to its own output
    channel block instead of summing rows: out [B, rows*ch, QB*128] — the
    channel-major im2col used by the Pallas DCNv2 path (ops/dcn.py), where a
    per-tap GEMM against the conv weights follows.

    tap_share=G: lane/m4/pmin/pspan carry Bt = B // G entries; G consecutive
    grid b indices (channel groups of one image) share entry b // G — the
    caller avoids materializing G broadcast copies of the tap tensors.
    """
    if panel_width > 1 and two_plane:
        panel_width = 1  # two-plane keeps the single-panel sweep (A/B path)
    if panel_width > 1 and not tail_padded:
        # headroom so the widest NP-panel slice never leaves the table
        table = jnp.pad(table, ((0, 0), (0, 0), (0, (panel_width - 1) * 128)))
    B, CHT, HWp = table.shape
    Lq = lane.shape[-1]
    QB = Lq // 128
    ng = rows // row_group
    Bt = B // tap_share
    assert HWp % 128 == 0 and Lq % 128 == 0
    assert rows % row_group == 0
    assert B % tap_share == 0
    lane_shape = (Bt, rows, 2, Lq) if two_plane else (Bt, rows, Lq)
    assert lane.shape == lane_shape, (lane.shape, lane_shape)
    assert m4.shape == (Bt, rows, corners, Lq), m4.shape
    assert pmin.shape == (Bt, QB, ng) and pspan.shape == (Bt, QB, ng)
    sub = 4 if packed == "int8" else (2 if packed else 1)
    stored = 2 if two_plane else corners
    assert CHT == stored * ch // sub, (CHT, corners, ch, packed, two_plane)
    G = tap_share
    out_ch = rows * ch if emit_rows else ch
    if alive is None:
        alive = jnp.ones((Bt, QB), jnp.int32)
    assert alive.shape == (Bt, QB)

    QBB = max(1, min(q_blocks, QB))
    qb_pad = (-QB) % QBB
    if qb_pad:
        # pad to a whole number of programs with dead blocks (alive=0 writes
        # zeros; pspan never read); output tail sliced off below
        lpad = ((0, 0),) * (lane.ndim - 1) + ((0, qb_pad * 128),)
        lane = jnp.pad(lane, lpad)
        m4 = jnp.pad(m4, ((0, 0), (0, 0), (0, 0), (0, qb_pad * 128)))
        pmin = jnp.pad(pmin, ((0, 0), (0, qb_pad), (0, 0)))
        pspan = jnp.pad(pspan, ((0, 0), (0, qb_pad), (0, 0)))
        alive = jnp.pad(alive, ((0, 0), (0, qb_pad)))
    QBp = QB + qb_pad
    alive3 = alive.astype(jnp.int32).reshape(Bt, QBp, 1)

    lane_spec = (
        pl.BlockSpec(
            (1, rows, 2, QBB * 128),
            lambda b, q: (b // G, 0, 0, q),
            memory_space=pltpu.VMEM,
        )
        if two_plane
        else pl.BlockSpec(
            (1, rows, QBB * 128),
            lambda b, q: (b // G, 0, q),
            memory_space=pltpu.VMEM,
        )
    )
    # MSDA_DIMSEM=arbitrary forces Mosaic to treat both grid axes as
    # sequential (no cross-program pipelining assumptions) — a debugging
    # lever for the BENCH_r04 in-model kernel-fault investigation
    import os as _os

    cparams = None
    if _os.environ.get("MSDA_DIMSEM") == "arbitrary":
        cparams = pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.ARBITRARY,
                pltpu.GridDimensionSemantics.ARBITRARY,
            )
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, ch=ch, corners=corners, packed=packed,
            row_group=row_group, emit_rows=emit_rows, q_blocks=QBB,
            two_plane=two_plane, panel_width=panel_width,
        ),
        compiler_params=cparams,
        grid=(B, QBp // QBB),
        in_specs=[
            pl.BlockSpec(
                (1, QBp, ng), lambda b, q: (b // G, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, QBp, ng), lambda b, q: (b // G, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, QBp, 1), lambda b, q: (b // G, 0, 0), memory_space=pltpu.SMEM
            ),
            lane_spec,
            pl.BlockSpec(
                (1, rows, corners, QBB * 128),
                lambda b, q: (b // G, 0, 0, q),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, CHT, HWp), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_ch, QBB * 128), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, out_ch, QBp * 128), out_dtype),
        interpret=interpret,
    )(pmin, pspan, alive3, lane, m4, table)
    return out if (keep_pad or not qb_pad) else out[:, :, : QB * 128]
