"""Parallel layer tests on the 8-virtual-CPU-device mesh: mesh factoring,
partition-rule resolution, sharded-vs-single-device numerical equivalence,
and the dryrun_multichip driver entry."""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bevformer_tensorrt_tpu.parallel import (
    make_mesh,
    pick_dp_tp,
    param_shardings,
    spec_for_path,
)


class TestMesh:
    def test_pick_dp_tp(self):
        assert pick_dp_tp(8) == (2, 4)
        assert pick_dp_tp(4) == (1, 4)
        assert pick_dp_tp(2) == (1, 2)
        assert pick_dp_tp(1) == (1, 1)
        assert pick_dp_tp(6) == (3, 2)

    def test_make_mesh(self, cpu_mesh_devices):
        mesh = make_mesh(cpu_mesh_devices)
        assert mesh.shape == {"dp": 2, "tp": 4}
        mesh2 = make_mesh(cpu_mesh_devices, dp=4)
        assert mesh2.shape == {"dp": 4, "tp": 2}


class TestRules:
    def test_spec_resolution(self):
        assert spec_for_path("head/transformer/decoder/layer0/self_attn/q_proj/kernel") == P(None, "tp")
        assert spec_for_path("head/x/ffn/fc1/kernel") == P(None, "tp")
        assert spec_for_path("head/x/ffn/fc2/kernel") == P("tp", None)
        assert spec_for_path("x/output_proj/kernel") == P("tp", None)
        assert spec_for_path("img_backbone/stage0_block0/conv1/kernel") == P()
        assert spec_for_path("x/ffn/fc2/bias") == P()

    def test_param_shardings_divisibility_fallback(self, cpu_mesh_devices):
        mesh = make_mesh(cpu_mesh_devices)  # tp=4
        params = {"ffn": {"fc1": {"kernel": jnp.zeros((8, 6))}}}  # 6 % 4 != 0
        sh = param_shardings(mesh, params)
        assert sh["ffn"]["fc1"]["kernel"].spec == P()
        params2 = {"ffn": {"fc1": {"kernel": jnp.zeros((8, 8))}}}
        sh2 = param_shardings(mesh, params2)
        assert sh2["ffn"]["fc1"]["kernel"].spec == P(None, "tp")


class TestShardedEquivalence:
    def test_tp_matmul_chain_matches_single_device(self, cpu_mesh_devices, rng):
        """Column-parallel fc1 -> row-parallel fc2 under GSPMD must equal the
        unsharded computation (the psum XLA inserts is exact for fp32)."""
        mesh = make_mesh(cpu_mesh_devices)
        x = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)

        def f(x, w1, w2):
            return jnp.maximum(x @ w1, 0.0) @ w2

        ref = f(x, w1, w2)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "tp")))
        w2s = jax.device_put(w2, NamedSharding(mesh, P("tp", None)))
        out = jax.jit(f)(xs, w1s, w2s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
class TestDryrun:
    def test_dryrun_multichip_8(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
