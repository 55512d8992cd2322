"""Span study: measure the sorted-kernel panel visits the REAL model
geometry produces for spatial cross-attention, for different row orderings
(pt-major vs z-major) and row_group sizes.  Guides the union-sweep grouping.

Usage: python tools/span_study.py [--off-px F]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--off-px", type=float, default=2.0,
                    help="sampling-offset stddev in pixels (trained nets: 1-4)")
    args = ap.parse_args()

    from bevformer_tensorrt_tpu.configs import bevformer as cfgs
    from bevformer_tensorrt_tpu.models.modules.encoder import (
        get_reference_points_3d, point_sampling,
    )
    from tools.geometry_analysis import nuscenes_like_rig

    cfg = cfgs.bevformer_base()
    nq = cfg.bev_h * cfg.bev_w
    rig = nuscenes_like_rig(cfg.img_w, cfg.img_h)[: cfg.num_cams]
    l2i = jnp.asarray(rig.reshape(1, cfg.num_cams, 4, 4).astype(np.float32))
    ref3d = jnp.asarray(
        get_reference_points_3d(cfg.bev_h, cfg.bev_w, cfg.num_points_in_pillar)
    )
    ref_cam, bev_mask = point_sampling(
        ref3d, cfg.pc_range, l2i, (cfg.img_h, cfg.img_w), cfg.num_cams
    )
    # compaction identical to the model: top-K by mask, sorted to BEV order
    cams = cfg.num_cams
    K = min(nq, -(-int(nq * cfg.cam_budget) // 128) * 128)
    mask_flat = np.asarray(bev_mask).reshape(cams, nq)
    ppg = cfg.num_points_in_pillar
    rpc = np.asarray(ref_cam)  # [cams, nq, ppg*2]
    topi = np.argsort(-mask_flat, axis=1, kind="stable")[:, :K]
    topi = np.sort(topi, axis=1)  # BEV order (as the encoder does)
    topv = np.take_along_axis(mask_flat, topi, axis=1)
    ref_c = np.take_along_axis(rpc, topi[..., None], axis=1)  # [cams, K, ppg*2]
    ref_c = np.where((topv > 0)[..., None], ref_c, 2.0)

    H_, L, P = cfg.num_heads, cfg.num_levels, cfg.num_points_cross
    shapes = []
    h, w = cfg.img_h // 8, cfg.img_w // 8
    for _ in range(L):
        shapes.append((h, w))
        h, w = -(-h // 2), -(-w // 2)
    rng = np.random.default_rng(0)
    off = rng.standard_normal((cams, K, H_, L * P * 2)).astype(np.float32) * args.off_px

    level_base = []
    panels = 0
    for (Hh, Ww) in shapes:
        level_base.append(panels)
        panels += -(-Hh * Ww // 128)

    q_pad = (-K) % 128
    QB = (K + q_pad) // 128
    B = cams * H_

    # keys per (cam, head, level, p, q) with p order = (pt, z) [model order]
    ref_r = ref_c.reshape(cams, K, ppg, 2)
    offr = off.reshape(cams, K, H_, L, P // ppg, ppg, 2)
    keys = np.zeros((cams, H_, L, P // ppg, ppg, K), np.int64)
    # straightforward loop construction (numpy, clarity over speed)
    for lvl, (Hh, Ww) in enumerate(shapes):
        for pt in range(P // ppg):
            for z in range(ppg):
                x = (ref_r[:, :, z, 0][:, None, :] + offr[:, :, :, lvl, pt, z, 0].transpose(0, 2, 1) / Ww) * Ww - 0.5
                y = (ref_r[:, :, z, 1][:, None, :] + offr[:, :, :, lvl, pt, z, 1].transpose(0, 2, 1) / Hh) * Hh - 0.5
                bx = np.clip(np.floor(x).astype(np.int64), 0, Ww - 2)
                by = np.clip(np.floor(y).astype(np.int64), 0, Hh - 2)
                keys[:, :, lvl, pt, z] = (by * Ww + bx) + level_base[lvl] * 128

    if q_pad:
        pad_key = keys[..., -1:].repeat(q_pad, -1)
        keys = np.concatenate([keys, pad_key], -1)

    panel = keys // 128  # [cams, H, L, pt, z, Kp]

    def visits(order, RG):
        # order: 'pt' = rows (L, pt, z); 'z' = rows (L, z, pt)
        p = panel if order == "pt" else panel.transpose(0, 1, 2, 4, 3, 5)
        p = p.reshape(cams, H_, L * P, QB, 128)
        rows = L * P
        pg = p.reshape(cams, H_, rows // RG, RG, QB, 128)
        span = pg.max(axis=(3, 5)) - pg.min(axis=(3, 5)) + 1  # [cams,H,ng,QB]
        return float(span.sum()), float(span.mean())

    print(f"off_px={args.off_px} K={K} QB={QB} B={B} rows={L*P}")
    for order in ("pt", "z"):
        for RG in (1, 2, 4, 8):
            tot, mean = visits(order, RG)
            est_ms = tot * (110 + RG * 64 / 32 * 15) / 1e6
            print(
                f"order={order} RG={RG}: total visits {tot/1e3:.0f}k "
                f"mean span {mean:.2f} est kernel {est_ms:.1f} ms"
            )

    # ---- image-order query sort: sort each camera's compacted queries by
    # their mean projected level-0 key instead of BEV index --------------
    Hh0, Ww0 = shapes[0]
    vis = (ref_r[..., 0] >= 0) & (ref_r[..., 0] <= 1) & (ref_r[..., 1] >= 0) & (ref_r[..., 1] <= 1)
    wsum = np.maximum(vis.sum(-1), 1)
    mx = (ref_r[..., 0] * vis).sum(-1) / wsum
    my = (ref_r[..., 1] * vis).sum(-1) / wsum
    sk = (
        np.clip((my * Hh0).astype(np.int64), 0, Hh0 - 1) * Ww0
        + np.clip((mx * Ww0).astype(np.int64), 0, Ww0 - 1)
    )
    sk = np.where(topv > 0, sk, 1 << 40)  # invisible padding last
    order_ix = np.argsort(sk, axis=1, kind="stable")  # [cams, Kp? K]
    keys_im = np.take_along_axis(
        keys.reshape(cams, H_ * L * (P // ppg) * ppg, K + q_pad)[:, :, :K],
        order_ix[:, None, :], axis=2,
    )
    if q_pad:
        keys_im = np.concatenate([keys_im, keys_im[..., -1:].repeat(q_pad, -1)], -1)
    panel_bev = panel
    panel = (keys_im // 128).reshape(cams, H_, L, P // ppg, ppg, K + q_pad)
    for order in ("pt", "z"):
        for RG in (1, 2, 4, 8):
            tot, mean = visits(order, RG)
            est_ms = tot * (110 + RG * 64 / 32 * 15) / 1e6
            print(
                f"IMG-sort order={order} RG={RG}: total visits {tot/1e3:.0f}k "
                f"mean span {mean:.2f} est kernel {est_ms:.1f} ms"
            )
    panel = panel_bev


if __name__ == "__main__":
    main()
