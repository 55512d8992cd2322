"""Golden tests: fused multi-scale deformable attention vs a torch oracle.

The oracle reproduces the plugin contract
(TensorRT/plugin/multi_scale_deformable_attn, python side
det2trt/models/functions/multi_scale_deformable_attn.py:62-115): softmax of
raw logits over (levels x points), sampling locations = ref + off/(w,h),
bilinear zero-padded align_corners=False gather per level, weighted sum.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bevformer_tensorrt_tpu.ops import multi_scale_deformable_attn


def torch_msda_oracle(value, spatial_shapes, reference_points, sampling_offsets, attention_weights):
    """Unfused torch implementation of the same contract (fp64 for tight deltas)."""
    value = torch.from_numpy(value).double()
    ref = torch.from_numpy(reference_points).double()
    off = torch.from_numpy(sampling_offsets).double()
    w = torch.from_numpy(attention_weights).double()

    bs, num_keys, heads, ch = value.shape
    num_q = ref.shape[1]
    L = len(spatial_shapes)
    P = w.shape[-1] // L
    ppg = ref.shape[-1] // 2

    w = w.reshape(bs, num_q, heads, L * P).softmax(-1).reshape(bs, num_q, heads, L, P)
    off = off.reshape(bs, num_q, heads, L, P // ppg, ppg, 2)
    norm = torch.tensor([[wd, ht] for (ht, wd) in spatial_shapes]).double()
    loc = ref.reshape(bs, num_q, 1, 1, 1, ppg, 2) + off / norm.reshape(1, 1, 1, L, 1, 1, 2)
    loc = loc.reshape(bs, num_q, heads, L, P, 2)

    out = torch.zeros(bs, num_q, heads, ch).double()
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W].reshape(bs, H, W, heads, ch)
        start += H * W
        v = v.permute(0, 3, 4, 1, 2).reshape(bs * heads, ch, H, W)
        grid = 2 * loc[:, :, :, lvl] - 1  # [bs, q, heads, P, 2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(bs * heads, num_q, P, 2)
        samp = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
        samp = samp.reshape(bs, heads, ch, num_q, P)
        wl = w[:, :, :, lvl].permute(0, 2, 1, 3)  # [bs, heads, q, P]
        out += (samp * wl[:, :, None]).sum(-1).permute(0, 3, 1, 2)
    return out.reshape(bs, num_q, heads * ch).numpy()


@pytest.mark.parametrize("ppg", [1, 4])
def test_msda_matches_oracle(rng, ppg):
    bs, heads, ch = 2, 8, 32
    spatial_shapes = ((12, 20), (6, 10), (3, 5))
    L = len(spatial_shapes)
    P = 2 * ppg  # points per level
    num_keys = sum(h * w for h, w in spatial_shapes)
    num_q = 50

    value = rng.standard_normal((bs, num_keys, heads, ch)).astype(np.float32)
    ref = rng.uniform(0.05, 0.95, (bs, num_q, 1, ppg * 2)).astype(np.float32)
    off = (rng.standard_normal((bs, num_q, heads, L * P * 2)) * 2).astype(np.float32)
    weights = rng.standard_normal((bs, num_q, heads, L * P)).astype(np.float32)

    ours = multi_scale_deformable_attn(value, ref, off, weights, spatial_shapes)
    ref_out = torch_msda_oracle(value, spatial_shapes, ref, off, weights)
    mad = np.mean(np.abs(np.asarray(ours, np.float64) - ref_out))
    assert mad < 1e-5, mad


def test_msda_out_of_bounds_zero(rng):
    """Samples far outside every level must contribute zero."""
    bs, heads, ch = 1, 2, 4
    spatial_shapes = ((8, 8),)
    value = rng.standard_normal((bs, 64, heads, ch)).astype(np.float32)
    ref = np.full((bs, 3, 1, 2), 5.0, np.float32)  # way outside [0, 1]
    off = np.zeros((bs, 3, heads, 4 * 2), np.float32)
    weights = np.zeros((bs, 3, heads, 4), np.float32)
    out = multi_scale_deformable_attn(value, ref, off, weights, spatial_shapes)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_msda_chunked_matches_unchunked(rng):
    """The memory-bounded lax.map path must be bit-identical in fp32."""
    from bevformer_tensorrt_tpu.ops import multi_scale_deformable_attn_reference

    spatial_shapes = ((12, 20), (6, 10))
    num_keys = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((2, num_keys, 8, 32)).astype(np.float32)
    ref = rng.uniform(0.05, 0.95, (2, 50, 1, 2)).astype(np.float32)
    off = (rng.standard_normal((2, 50, 8, 2 * 4 * 2)) * 2).astype(np.float32)
    weights = rng.standard_normal((2, 50, 8, 2 * 4)).astype(np.float32)
    a = multi_scale_deformable_attn(value, ref, off, weights, spatial_shapes, q_chunk=16)
    b = multi_scale_deformable_attn_reference(value, ref, off, weights, spatial_shapes)
    assert np.abs(np.asarray(a) - np.asarray(b)).mean() < 1e-6


def test_msda_bf16_within_fp16_delta(rng):
    """bf16 value path stays inside the reference's fp16 plugin delta (0.01)."""
    import jax.numpy as jnp

    spatial_shapes = ((12, 20),)
    value = rng.standard_normal((1, 240, 8, 32)).astype(np.float32)
    ref = rng.uniform(0.05, 0.95, (1, 50, 1, 2)).astype(np.float32)
    off = (rng.standard_normal((1, 50, 8, 8)) * 2).astype(np.float32)
    weights = rng.standard_normal((1, 50, 8, 4)).astype(np.float32)
    a = multi_scale_deformable_attn(
        value.astype(jnp.bfloat16), ref, off, weights, spatial_shapes
    )
    b = multi_scale_deformable_attn(value, ref, off, weights, spatial_shapes)
    assert np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).mean() < 0.01


def test_msda_boundary_taps_exact(rng):
    """Corner-packed gather must stay exact for taps at/over image borders
    (the clamped-window slot remap)."""
    from bevformer_tensorrt_tpu.ops import multi_scale_deformable_attn_reference

    spatial_shapes = ((9, 13),)
    value = rng.standard_normal((1, 117, 4, 8)).astype(np.float32)
    # refs exactly on edges, just inside, just outside
    edge = np.array(
        [[0.0, 0.0], [1.0, 1.0], [0.001, 0.999], [-0.05, 0.5], [1.05, 0.5],
         [0.5, -0.05], [0.5, 1.05], [0.03, 0.03]],
        np.float32,
    )
    ref = edge.reshape(1, -1, 1, 2)
    off = (rng.standard_normal((1, 8, 4, 2 * 2)) * 1.5).astype(np.float32)
    weights = rng.standard_normal((1, 8, 4, 2)).astype(np.float32)
    a = multi_scale_deformable_attn(value, ref, off, weights, spatial_shapes)
    b = multi_scale_deformable_attn_reference(value, ref, off, weights, spatial_shapes)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5


def test_msda_default_chunk_at_scale(rng):
    """Default q_chunk (2048) with num_q above it — the base-scale code path
    (num_q = 5000 > 2048 forces padding + the lax.map chunk loop at the
    production chunk size, which the toy q_chunk=16 test never reaches)."""
    spatial_shapes = ((29, 50), (15, 25))
    num_keys = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((1, num_keys, 4, 16)).astype(np.float32)
    ref = rng.uniform(0.05, 0.95, (1, 5000, 1, 2)).astype(np.float32)
    off = (rng.standard_normal((1, 5000, 4, 2 * 4 * 2)) * 2).astype(np.float32)
    weights = rng.standard_normal((1, 5000, 4, 2 * 4)).astype(np.float32)
    a = multi_scale_deformable_attn(value, ref, off, weights, spatial_shapes)
    b = torch_msda_oracle(value, spatial_shapes, ref, off, weights)
    assert np.abs(np.asarray(a, np.float64) - b).mean() < 1e-5


def test_sorted_qm_vjp_matches_jnp_grad(rng):
    """VERDICT r2 item 5: jax.grad through the sorted path (custom_vjp —
    Pallas forward, XLA backward) must match jax.grad through the jnp path
    on the same q-minor operands (interpret mode off-TPU)."""
    import jax
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.ops import (
        multi_scale_deformable_attn_sorted_qm_diff,
    )
    from bevformer_tensorrt_tpu.ops.msda import _qm_to_qmajor

    bs, heads, ch = 2, 4, 32
    spatial_shapes = ((12, 20), (6, 10))
    L = len(spatial_shapes)
    ppg = 2
    P = 2 * ppg
    num_keys = sum(h * w for h, w in spatial_shapes)
    num_q = 64

    value_t = jnp.asarray(rng.standard_normal((bs, heads * ch, num_keys)), jnp.float32)
    ref_t = jnp.asarray(rng.uniform(0.05, 0.95, (bs, ppg, 2, num_q)), jnp.float32)
    off_t = jnp.asarray(rng.standard_normal((bs, heads * L * P * 2, num_q)) * 2, jnp.float32)
    attn_t = jnp.asarray(rng.standard_normal((bs, heads * L * P, num_q)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((bs, num_q, heads * ch)), jnp.float32)

    def loss_sorted(v, r, o, a):
        out = multi_scale_deformable_attn_sorted_qm_diff(
            v, r, o, a, spatial_shapes, heads, packed=False, out_dtype=jnp.float32
        )
        return (out * cot).sum()

    def loss_jnp(v, r, o, a):
        value, rp, so, aw = _qm_to_qmajor(v, r, o, a, spatial_shapes, heads)
        out = multi_scale_deformable_attn(value, rp, so, aw, spatial_shapes)
        return (out * cot).sum()

    # forward parity first (fp32 tables are tap-exact; elementwise — the
    # scalar losses differ by fp32 summation order)
    out_s = multi_scale_deformable_attn_sorted_qm_diff(
        value_t, ref_t, off_t, attn_t, spatial_shapes, heads,
        packed=False, out_dtype=jnp.float32,
    )
    v_, rp_, so_, aw_ = _qm_to_qmajor(
        value_t, ref_t, off_t, attn_t, spatial_shapes, heads
    )
    out_j = multi_scale_deformable_attn(v_, rp_, so_, aw_, spatial_shapes)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_j), rtol=2e-5, atol=2e-6)
    gs = jax.grad(loss_sorted, argnums=(0, 1, 2, 3))(value_t, ref_t, off_t, attn_t)
    gj = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(value_t, ref_t, off_t, attn_t)
    for name, a, b in zip(("value", "ref", "off", "attn"), gs, gj):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_sorted_model_grad_runs(rng):
    """jax.grad through a micro BEVFormer with msda_impl='sorted_f32' is
    finite and close to the jnp path's gradient (in-model VJP wiring)."""
    import jax
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer

    cfgs = {
        "jnp": bevformer_micro(encoder_layers=1, decoder_layers=1, msda_impl="jnp"),
        "sorted": bevformer_micro(
            encoder_layers=1, decoder_layers=1, msda_impl="sorted_f32"
        ),
    }
    nq = cfgs["jnp"].bev_h * cfgs["jnp"].bev_w
    cfg = cfgs["jnp"]
    image = jnp.asarray(
        rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)), jnp.float32
    )
    prev = jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32)
    can_bus = jnp.zeros(cfg.can_bus_dims, jnp.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (1, cfg.num_cams, 1, 1))
    l2i[..., 0, 0] = l2i[..., 1, 1] = cfg.img_w / 2
    l2i = jnp.asarray(l2i)

    model_j = BEVFormer(cfgs["jnp"])
    variables = model_j.init(jax.random.PRNGKey(0), image, prev, jnp.float32(1.0), can_bus, l2i)

    grads = {}
    for name, c in cfgs.items():
        m = BEVFormer(c)

        def loss(params):
            _, classes, _ = m.apply(
                {**variables, "params": params}, image, prev, jnp.float32(1.0),
                can_bus, l2i,
            )
            return (classes.astype(jnp.float32) ** 2).sum()

        grads[name] = jax.grad(loss)(variables["params"])
    flat_j = jax.tree.leaves(grads["jnp"])
    flat_s = jax.tree.leaves(grads["sorted"])
    for a, b in zip(flat_j, flat_s):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-5)


def test_sorted_model_grad_with_active_compaction(rng):
    """Gradient parity sorted_f32-vs-jnp with the camera compaction ACTIVE
    (K < nq) — the tiny/base configuration the micro-shaped grad test never
    reaches (micro has K == nq, a pure permutation).  Guards the top-K
    gather + output scatter backward of the compacted cross-attention."""
    import jax
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
    from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer

    mk = lambda impl: bevformer_micro(
        encoder_layers=1, decoder_layers=1, bev_h=16, bev_w=16,
        cam_budget=0.35, msda_impl=impl, rotate_center=(8, 8),
    )
    cfgs = {"jnp": mk("jnp"), "sorted": mk("sorted_f32")}
    cfg = cfgs["jnp"]
    nq = cfg.bev_h * cfg.bev_w
    assert min(nq, max(128, -(-int(nq * cfg.cam_budget) // 128) * 128)) < nq

    image = jnp.asarray(
        rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)), jnp.float32
    )
    prev = jnp.asarray(rng.standard_normal((nq, 1, cfg.embed_dims)) * 0.1, jnp.float32)
    can_bus = jnp.zeros(cfg.can_bus_dims, jnp.float32)
    from test_full_model_parity import micro_rig

    l2i = jnp.asarray(micro_rig(cfg, rng))

    model_j = BEVFormer(cfgs["jnp"])
    variables = model_j.init(
        jax.random.PRNGKey(0), image, prev, jnp.float32(1.0), can_bus, l2i
    )

    grads = {}
    for name, c in cfgs.items():
        m = BEVFormer(c)

        def loss(params):
            _, classes, coords = m.apply(
                {**variables, "params": params}, image, prev, jnp.float32(1.0),
                can_bus, l2i,
            )
            return (classes.astype(jnp.float32) ** 2).sum() + (
                coords.astype(jnp.float32) ** 2
            ).sum()

        grads[name] = jax.grad(loss)(variables["params"])
    flat_j = jax.tree.leaves(grads["jnp"])
    flat_s = jax.tree.leaves(grads["sorted"])
    for a, b in zip(flat_j, flat_s):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-5)
