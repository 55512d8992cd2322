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


class TestMSDASorted:
    """Sorted-tap MSDA kernel (ops/pallas/msda_gather + the
    multi_scale_deformable_attn_sorted wrapper): interpret-mode exactness vs
    the fp32 oracle, for multi-level, z-anchor, and unpadded-query cases."""

    def _rand_case(self, rng, bs, nq, heads, ch, shapes, P, ppg=1):
        keys = sum(h * w for h, w in shapes)
        L = len(shapes)
        value = rng.standard_normal((bs, keys, heads, ch)).astype(np.float32)
        ref = rng.random((bs, nq, 1, ppg * 2)).astype(np.float32)
        off = (rng.standard_normal((bs, nq, heads, L * P * 2)) * 2).astype(np.float32)
        attn = rng.standard_normal((bs, nq, heads, L * P)).astype(np.float32)
        return value, ref, off, attn

    @pytest.mark.parametrize("packed", [False, True, "int8"])
    def test_matches_oracle(self, rng, packed):
        from bevformer_tensorrt_tpu.ops import (
            multi_scale_deformable_attn_reference,
            multi_scale_deformable_attn_sorted,
        )

        shapes = ((12, 20), (6, 10))
        value, ref, off, attn = self._rand_case(rng, 2, 256, 4, 8, shapes, P=4)
        want = np.asarray(
            multi_scale_deformable_attn_reference(value, ref, off, attn, shapes)
        )
        got = np.asarray(
            multi_scale_deformable_attn_sorted(
                value, ref, off, attn, shapes, packed=packed, interpret=True
            )
        )
        # packed=True stores the table in bf16; 'int8' quantizes the value
        # payload with a per-(b, head) dynamic scale (amax/127)
        tol = {False: 1e-5, True: 2e-2, "int8": 8e-2}[packed]
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    @pytest.mark.parametrize("ppg", [1, 2])
    def test_qminor_entry_matches_qmajor(self, rng, ppg):
        """The query-minor entry (value channel-minor, projections q-minor)
        must agree with the q-major wrapper — identical core math, inputs
        transposed by the caller instead of internally."""
        from bevformer_tensorrt_tpu.ops import (
            multi_scale_deformable_attn_sorted,
            multi_scale_deformable_attn_sorted_qm,
        )

        shapes = ((12, 20), (6, 10))
        heads, ch, P = 4, 8, 4
        value, ref, off, attn = self._rand_case(
            rng, 2, 256, heads, ch, shapes, P=P, ppg=ppg
        )
        want = np.asarray(
            multi_scale_deformable_attn_sorted(
                value, ref, off, attn, shapes, packed=False, interpret=True
            )
        )
        bs, nq = ref.shape[:2]
        L = len(shapes)
        value_t = value.transpose(0, 2, 3, 1).reshape(bs, heads * ch, -1)
        ref_t = ref.reshape(bs, nq, ppg, 2).transpose(0, 2, 3, 1)
        off_t = off.transpose(0, 2, 3, 1).reshape(bs, heads * L * P * 2, nq)
        attn_t = attn.transpose(0, 2, 3, 1).reshape(bs, heads * L * P, nq)
        got = np.asarray(
            multi_scale_deformable_attn_sorted_qm(
                value_t, ref_t, off_t, attn_t, shapes, num_heads=heads,
                packed=False, interpret=True, out_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_q_block_padding(self, rng):
        """QB not a multiple of q_blocks: the wrapper pads with dead blocks
        (nq=1200 -> QB=10, q_blocks=8 -> 2 programs of 8 with 6 padded) and
        slices the tail — must still match the reference exactly."""
        from bevformer_tensorrt_tpu.ops import (
            multi_scale_deformable_attn_reference,
            multi_scale_deformable_attn_sorted,
        )

        shapes = ((12, 20), (6, 10))
        value, ref, off, attn = self._rand_case(
            rng, 1, 1200, 2, 8, shapes, P=4, ppg=1
        )
        got = np.asarray(
            multi_scale_deformable_attn_sorted(
                value, ref, off, attn, shapes, packed=False, interpret=True
            )
        )
        want = np.asarray(
            multi_scale_deformable_attn_reference(value, ref, off, attn, shapes)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("groups", [2, 3])
    def test_key_group_split(self, rng, groups):
        """VMEM-overflow fallback: splitting the table into key (panel)
        ranges and summing partials must be exact vs the unsplit call —
        including groups whose panel window straddles a range boundary."""
        from bevformer_tensorrt_tpu.ops import (
            multi_scale_deformable_attn_reference,
            multi_scale_deformable_attn_sorted,
        )

        shapes = ((12, 20), (6, 10))
        value, ref, off, attn = self._rand_case(rng, 1, 128, 2, 8, shapes, P=4)
        want = np.asarray(
            multi_scale_deformable_attn_reference(value, ref, off, attn, shapes)
        )
        got = np.asarray(
            multi_scale_deformable_attn_sorted(
                value, ref, off, attn, shapes, packed=False, interpret=True,
                key_groups=groups,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_z_anchors_and_unpadded_queries(self, rng):
        from bevformer_tensorrt_tpu.ops import (
            multi_scale_deformable_attn_reference,
            multi_scale_deformable_attn_sorted,
        )

        shapes = ((8, 16),)
        # nq=100 (not a multiple of 128), ppg=2 z-anchors, P=4 -> 2 pts/z
        value, ref, off, attn = self._rand_case(
            rng, 1, 100, 2, 16, shapes, P=4, ppg=2
        )
        want = np.asarray(
            multi_scale_deformable_attn_reference(value, ref, off, attn, shapes)
        )
        got = np.asarray(
            multi_scale_deformable_attn_sorted(
                value, ref, off, attn, shapes, packed=False, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestFlashAttnInt8:
    def test_matches_fp_reference(self, rng):
        """int8 flash attention (both matmuls int8, f32 online softmax,
        dynamic per-tensor scales) tracks the fp path within the int8
        quantization envelope — the reference's int8 flash-MHA tier."""
        import jax.numpy as jnp

        from bevformer_tensorrt_tpu.ops.pallas import (
            flash_attention,
            flash_attention_int8,
        )

        B, q_len, kv_len, d = 4, 96, 130, 32
        q = jnp.asarray(rng.standard_normal((B, q_len, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, kv_len, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, kv_len, d)), jnp.float32)
        want = np.asarray(
            flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
        )
        got = np.asarray(
            flash_attention_int8(q, k, v, block_q=64, block_k=64, interpret=True)
        )
        err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
        assert err < 0.03, err


def test_flash_attention_diff_grad_matches_qkv(rng):
    """custom_vjp flash wrapper: jax.grad == grad of the jnp qkv math
    (the decoder trains through flash MHA on TPU — VERDICT r2 item 5
    pattern, found by the tiny accuracy-cycle train on axon)."""
    import jax
    import jax.numpy as jnp

    from bevformer_tensorrt_tpu.ops.attention import flash_attention_diff, qkv

    B, L, d = 4, 128, 32
    q = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)

    def loss_flash(q, k, v):
        from bevformer_tensorrt_tpu.ops.pallas.flash_attn import flash_attention

        # interpret mode off-TPU is handled inside the kernel module
        return (flash_attention_diff(q, k, v) * cot).sum()

    def loss_ref(q, k, v):
        return (qkv(q, k, v) * cot).sum()

    np.testing.assert_allclose(
        float(loss_flash(q, k, v)), float(loss_ref(q, k, v)), rtol=1e-4
    )
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
