"""Pallas kernel golden tests (interpret mode on CPU; Mosaic on TPU).

Mirrors the reference's plugin unit-test pattern (SURVEY.md §4: jnp oracle
vs kernel, mean-abs-diff bounds per precision)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bevformer_tensorrt_tpu.ops.attention import qkv
from bevformer_tensorrt_tpu.ops.pallas.flash_attn import flash_attention
from bevformer_tensorrt_tpu.ops.pallas.int8_matmul import (
    int8_matmul,
    int8_matmul_reference,
)


class TestFlashAttention:
    @pytest.mark.parametrize(
        "B,Lq,Lk,d",
        [(8, 900, 900, 32), (2, 256, 512, 64), (1, 100, 37, 32), (4, 64, 2048, 32)],
    )
    def test_matches_oracle_fp32(self, rng, B, Lq, Lk, d):
        q = rng.standard_normal((B, Lq, d)).astype(np.float32)
        k = rng.standard_normal((B, Lk, d)).astype(np.float32)
        v = rng.standard_normal((B, Lk, d)).astype(np.float32)
        ref = np.asarray(qkv(q, k, v))
        out = np.asarray(flash_attention(q, k, v, interpret=True))
        assert np.abs(out - ref).mean() < 1e-5

    def test_bf16_within_fp16_delta(self, rng):
        q = rng.standard_normal((2, 128, 32)).astype(np.float32)
        k = rng.standard_normal((2, 128, 32)).astype(np.float32)
        v = rng.standard_normal((2, 128, 32)).astype(np.float32)
        ref = np.asarray(qkv(q, k, v))
        out = np.asarray(
            flash_attention(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                interpret=True,
            )
        ).astype(np.float32)
        assert np.abs(out - ref).mean() < 0.01  # reference fp16 delta

    def test_extreme_logits_stable(self, rng):
        """Online softmax must not overflow with large logit magnitudes."""
        q = (rng.standard_normal((1, 64, 32)) * 30).astype(np.float32)
        k = (rng.standard_normal((1, 64, 32)) * 30).astype(np.float32)
        v = rng.standard_normal((1, 64, 32)).astype(np.float32)
        out = np.asarray(flash_attention(q, k, v, interpret=True))
        ref = np.asarray(qkv(q, k, v))
        assert np.all(np.isfinite(out))
        assert np.abs(out - ref).mean() < 1e-4


class TestInt8Matmul:
    @pytest.mark.parametrize("M,K,N", [(300, 200, 150), (256, 512, 256), (17, 33, 65)])
    def test_exact_int_accumulation(self, rng, M, K, N):
        x = rng.integers(-127, 128, (M, K)).astype(np.int8)
        w = rng.integers(-127, 128, (K, N)).astype(np.int8)
        sx = jnp.float32(0.02)
        sw = jnp.asarray(rng.uniform(0.001, 0.05, N), jnp.float32)
        a = np.asarray(int8_matmul(x, w, sx, sw, interpret=True))
        b = np.asarray(int8_matmul_reference(x, w, sx, sw))
        # int32 accumulation is exact; only dequant rounding differs
        assert np.abs(a - b).max() < 1e-3


class TestLaneGather:
    """Lane-binned gather (the round-2 MSDA gather building block):
    interpret-mode exactness for coherent and random index patterns."""

    def test_matches_take_along_axis(self, rng):
        from bevformer_tensorrt_tpu.ops.pallas.lane_gather import lane_gather

        B, ch, HW, NT = 2, 32, 512, 1024
        vt = rng.standard_normal((B, ch, HW)).astype(np.float32)
        for pattern in ("coherent", "random"):
            if pattern == "coherent":
                idx = np.sort(rng.integers(0, HW, (B, NT)), axis=1).astype(np.int32)
            else:
                idx = rng.integers(0, HW, (B, NT)).astype(np.int32)
            out = np.asarray(lane_gather(jnp.asarray(vt), jnp.asarray(idx), interpret=True))
            ref = np.take_along_axis(vt, idx[:, None, :].repeat(ch, 1), axis=2)
            np.testing.assert_allclose(out, ref, atol=1e-6, err_msg=pattern)

    def test_bf16(self, rng):
        from bevformer_tensorrt_tpu.ops.pallas.lane_gather import lane_gather

        B, ch, HW, NT = 1, 16, 256, 1024
        vt = rng.standard_normal((B, ch, HW)).astype(np.float32)
        idx = rng.integers(0, HW, (B, NT)).astype(np.int32)
        out = np.asarray(
            lane_gather(jnp.asarray(vt, jnp.bfloat16), jnp.asarray(idx), interpret=True),
            np.float32,
        )
        ref = np.take_along_axis(vt, idx[:, None, :].repeat(ch, 1), axis=2)
        assert np.abs(out - ref).max() < 0.02
