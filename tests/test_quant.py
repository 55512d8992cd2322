"""Tests for the quantization subsystem: observers, fake-quant, QDQ modes,
end-to-end calibration on a toy flax model."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevformer_tensorrt_tpu.quant import (
    QDQ,
    CalibrationResult,
    calibrate,
    compute_scale,
    dequantize,
    fake_quant,
    per_channel_scale,
    quantize,
    update_amax,
    update_histogram,
)
from bevformer_tensorrt_tpu.quant.observers import NUM_BINS


def test_quantize_roundtrip(rng):
    x = rng.standard_normal((64, 64)).astype(np.float32) * 3
    scale = np.float32(np.abs(x).max() / 127.0)
    q = quantize(x, scale)
    assert q.dtype == jnp.int8
    xr = dequantize(q, scale)
    assert np.max(np.abs(np.asarray(xr) - x)) <= scale / 2 + 1e-6


def test_fake_quant_ste_gradient(rng):
    x = jnp.asarray([0.1, -0.5, 200.0])  # last value clips at scale*127
    scale = jnp.float32(0.1)
    g = jax.grad(lambda t: jnp.sum(fake_quant(t, scale)))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 0.0])


def test_per_channel_scale(rng):
    w = rng.standard_normal((8, 3, 3, 4)).astype(np.float32)
    s = np.asarray(per_channel_scale(w, axis=0))
    assert s.shape == (8, 1, 1, 1)
    np.testing.assert_allclose(
        s[:, 0, 0, 0], np.abs(w).max(axis=(1, 2, 3)) / 127.0, rtol=1e-6
    )


def test_compute_scale_max():
    assert compute_scale(12.7, None, method="max") == pytest.approx(0.1)


def test_compute_scale_percentile(rng):
    # histogram heavily concentrated at low bins; 99.99 percentile should
    # clip far below amax
    hist = np.zeros(NUM_BINS)
    hist[:100] = 1e6
    hist[-1] = 1  # one outlier at amax
    s_pct = compute_scale(1.0, hist, method="percentile", percentile=99.99)
    s_max = compute_scale(1.0, hist, method="max")
    assert s_pct < s_max * 0.2


def test_compute_scale_entropy_clips_outliers(rng):
    # gaussian-ish histogram with an outlier tail: entropy scale < max scale
    x = np.abs(rng.standard_normal(200_000)) * 0.1
    x = np.concatenate([x, [10.0]])
    amax = x.max()
    hist, _ = np.histogram(x, bins=NUM_BINS, range=(0, amax))
    s_ent = compute_scale(amax, hist.astype(np.float64), method="entropy")
    s_max = compute_scale(amax, None, method="max")
    assert s_ent < s_max * 0.5


class ToyModel(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = QDQ(name="qdq_in")(x)
        x = nn.Dense(16, name="fc1")(x)
        x = nn.relu(x)
        x = QDQ(name="qdq_mid")(x)
        x = nn.Dense(4, name="fc2")(x)
        return x


def test_calibrate_end_to_end(rng):
    model = ToyModel()
    x0 = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    params = {"params": variables["params"]}

    batches = [jnp.asarray(rng.standard_normal((512, 32)) * 2, jnp.float32) for _ in range(4)]

    def apply_fn(v, batch, mutable):
        _, mutated = model.apply(v, batch, mutable=mutable)
        return mutated

    for method in ("max", "percentile", "entropy"):
        quant_vars, result = calibrate(apply_fn, params, batches, method=method)
        assert set(result.scales) == {"qdq_in", "qdq_mid"}
        assert all(s > 0 for s in result.scales.values())

        # quantized apply runs and stays close to fp for benign ranges
        y_fp = model.apply(params, batches[0])
        y_q = model.apply({**params, **quant_vars}, batches[0])
        rel = np.abs(np.asarray(y_q - y_fp)).mean() / (np.abs(np.asarray(y_fp)).mean() + 1e-9)
        assert rel < 0.1, (method, rel)


def test_calibration_result_roundtrip(tmp_path):
    r = CalibrationResult(scales={"a/b": 0.5, "c": 0.25}, method="entropy")
    p = str(tmp_path / "scales.npz")
    r.save(p)
    r2 = CalibrationResult.load(p)
    assert r2.method == "entropy"
    assert r2.scales == r.scales


def test_observer_updates():
    amax = jnp.zeros(())
    amax = update_amax(amax, jnp.asarray([-3.0, 2.0]))
    assert float(amax) == 3.0
    hist = jnp.zeros((NUM_BINS,))
    hist = update_histogram(hist, jnp.asarray([0.0, 1.4999, 2.999]), jnp.asarray(3.0))
    assert float(hist.sum()) == 3.0
    assert float(hist[0]) == 1.0  # 0.0 -> bin 0
    assert float(hist[NUM_BINS - 1]) == 1.0  # 2.999 -> last bin


class TestInt8EndToEnd:
    def test_micro_model_int8_forward_matches_qdq(self, rng):
        """Full micro model: calibrate -> int8 execution vs QDQ simulation.
        The int8 path replaces every QDense/QConv matmul with an actual
        int8 MXU op; outputs must track the fake-quant simulation."""
        import jax
        import jax.numpy as jnp
        from flax import traverse_util

        from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
        from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer

        def build(quant):
            cfg = bevformer_micro(encoder_layers=1, decoder_layers=1, quant=quant)
            return BEVFormer(cfg), cfg

        model_q, cfg = build(True)
        nq = cfg.bev_h * cfg.bev_w
        args = (
            jnp.asarray(
                rng.standard_normal((1, cfg.num_cams, 3, cfg.img_h, cfg.img_w)), jnp.float32
            ),
            jnp.zeros((nq, 1, cfg.embed_dims), jnp.float32),
            jnp.float32(0.0),
            jnp.zeros(cfg.can_bus_dims, jnp.float32),
            jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, cfg.num_cams, 1, 1))),
        )
        variables = jax.jit(model_q.init)(jax.random.PRNGKey(0), *args)
        # one-batch max calibration
        _, mut = model_q.apply(variables, *args, mutable=["amax_stats"])
        flat = traverse_util.flatten_dict(mut["amax_stats"])
        scales = {
            p[:-1] + ("scale",): jnp.maximum(v, 1e-6) / 127.0 for p, v in flat.items()
        }
        quant_col = {"quant": traverse_util.unflatten_dict(scales)}

        out_qdq = model_q.apply({**variables, **quant_col}, *args)
        model_i8, _ = build("int8")
        out_i8 = model_i8.apply({**variables, **quant_col}, *args)

        coords_qdq = np.asarray(out_qdq[2])
        coords_i8 = np.asarray(out_i8[2])
        assert np.all(np.isfinite(coords_i8))
        # int accumulation is exact; small drift from requantized epilogues
        assert np.abs(coords_i8 - coords_qdq).mean() < 0.05


class TestQDenseQMinor:
    """QDense(q_minor=True) contracts the second-minor axis and emits
    features second-minor: y_qm == transpose(y_qmajor) for every quant mode
    (same parameters, same calibration scales)."""

    @pytest.mark.parametrize("quant", [False, True, "int8"])
    def test_matches_qmajor(self, rng, quant):
        import jax
        import jax.numpy as jnp
        from flax import traverse_util

        from bevformer_tensorrt_tpu.models.layers import QDense

        x = jnp.asarray(rng.standard_normal((3, 40, 16)), jnp.float32)
        xt = x.transpose(0, 2, 1)
        m = QDense(24, quant=quant)
        variables = m.init(jax.random.PRNGKey(0), x)
        if quant:
            # calibrate: one amax pass, then attach scales
            _, mut = m.apply(variables, x, mutable=["amax_stats"])
            flat = traverse_util.flatten_dict(
                jax.tree.map(lambda a: jnp.maximum(a, 1e-6) / 127.0, mut["amax_stats"])
            )
            flat = {p[:-1] + ("scale",): v for p, v in flat.items()}
            variables = {**variables, "quant": traverse_util.unflatten_dict(flat)}
        y = m.apply(variables, x)
        yt = m.apply(variables, xt, q_minor=True)
        np.testing.assert_allclose(
            np.asarray(yt.transpose(0, 2, 1)), np.asarray(y), rtol=1e-5, atol=1e-5
        )
        # q_minor='out': q-MAJOR input, q-minor output — same params
        yo = m.apply(variables, x, q_minor="out")
        np.testing.assert_allclose(
            np.asarray(yo.transpose(0, 2, 1)), np.asarray(y), rtol=1e-5, atol=1e-5
        )


def test_int8_without_scales_raises(rng):
    """quant='int8' with no calibrated scales must fail loudly at trace
    time (not silently run fake-quant/fp) — init and calibration passes
    stay allowed."""
    import jax
    import jax.numpy as jnp
    import pytest

    from bevformer_tensorrt_tpu.models.layers import QDense

    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    m = QDense(4, quant="int8")
    variables = m.init(jax.random.PRNGKey(0), x)  # init: allowed
    _, _ = m.apply(variables, x, mutable=["amax_stats"])  # calibration: allowed
    with pytest.raises(ValueError, match="calibrated activation scales"):
        m.apply(variables, x)


def test_fold_int8_weights_matches_derived(rng):
    """Folded int8 weights (deploy path) must reproduce the per-forward
    derived quantization bit-exactly, for dense and conv."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from bevformer_tensorrt_tpu.models.layers import QConv, QDense
    from bevformer_tensorrt_tpu.quant.fold import fold_int8_weights

    def calib(m, x):
        variables = m.init(jax.random.PRNGKey(0), x)
        _, mut = m.apply(variables, x, mutable=["amax_stats"])
        flat = traverse_util.flatten_dict(
            jax.tree.map(lambda a: jnp.maximum(a, 1e-6) / 127.0, mut["amax_stats"])
        )
        flat = {p[:-1] + ("scale",): v for p, v in flat.items()}
        return {**variables, "quant": traverse_util.unflatten_dict(flat)}

    x = jnp.asarray(rng.standard_normal((2, 24, 16)), jnp.float32)
    m = QDense(8, quant="int8")
    v = calib(m, x)
    vf = fold_int8_weights(v)
    assert vf["quant"]["wq"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(m.apply(vf, x)), np.asarray(m.apply(v, x)))

    xc = jnp.asarray(rng.standard_normal((1, 8, 10, 6)), jnp.float32)
    mc = QConv(4, (3, 3), quant="int8")
    vc = calib(mc, xc)
    vcf = fold_int8_weights(vc)
    np.testing.assert_array_equal(np.asarray(mc.apply(vcf, xc)), np.asarray(mc.apply(vc, xc)))


# ---------------------------------------------------------------------------
# Entropy-calibration oracle diff (VERDICT r1 item 7): a faithful test-only
# port of pytorch-quantization's HistogramCalibrator entropy amax search
# (tools/pytorch-quantization calib/histogram.py::_compute_amax_entropy, the
# same TRT-style KL threshold search the reference's QDQ path uses via
# calibrator_qdq.py).  Both searches run on SHARED histograms of the same
# tensors; the chosen clip thresholds must agree closely.
def _oracle_amax_entropy(hist, bin_edges, num_bits=8, stride=1, start_bin=128):
    bins = hist.astype(np.float64).copy()
    bins[0] = bins[1]  # the oracle's first-bin smoothing
    nbins = 1 << (num_bits - 1)  # 128 for signed int8
    stop = len(bins)
    divergences, arguments = [], []
    for i in range(start_bin, stop + 1, stride):
        space = np.linspace(0, i, num=nbins + 1)
        digitized = np.digitize(np.arange(i), space) - 1
        digitized[bins[:i] == 0] = -1
        new_counts = np.zeros(nbins)
        group_n = np.zeros(nbins)
        for idx, d in enumerate(digitized):
            if d != -1:
                new_counts[d] += bins[idx]
                group_n[d] += 1
        with np.errstate(invalid="ignore"):
            avg = np.where(group_n > 0, new_counts / np.maximum(group_n, 1), 0.0)
        new_density = np.where(digitized != -1, avg[np.clip(digitized, 0, None)], 0.0)
        ref_density = bins[:i].copy()
        ref_density[-1] += bins[i:].sum()
        p = ref_density / max(ref_density.sum(), 1e-12)
        q = new_density / max(new_density.sum(), 1e-12)
        m = p > 0
        kl = float(np.sum(p[m] * np.log(p[m] / np.where(q[m] > 0, q[m], 1e-12))))
        divergences.append(kl)
        arguments.append(i)
    divergences = np.asarray(divergences)
    last_argmin = len(divergences) - 1 - int(np.argmin(divergences[::-1]))
    return bin_edges[arguments[last_argmin]]


@pytest.mark.parametrize(
    "dist",
    ["gauss", "gauss_outliers", "laplace"],
)
def test_entropy_scale_matches_pytorch_quantization_oracle(rng, dist):
    n = 200_000
    if dist == "gauss":
        x = rng.standard_normal(n)
    elif dist == "gauss_outliers":
        x = rng.standard_normal(n)
        x[:40] *= 40.0  # heavy outlier tail: entropy must clip far below amax
    else:
        x = rng.laplace(size=n)
    ax = np.abs(x).astype(np.float32)
    amax = float(ax.max())
    width = amax / NUM_BINS
    hist, edges = np.histogram(ax, bins=NUM_BINS, range=(0.0, amax))

    ours_clip = compute_scale(amax, hist.astype(np.float64), method="entropy") * 127.0
    oracle_clip = _oracle_amax_entropy(hist, edges[1:], stride=1)

    # stride-8 scan + (i+0.5) center vs the oracle's stride-1 edge pick:
    # thresholds must agree within one coarse step (~8 bins) or 15% rel.
    rel = abs(ours_clip - oracle_clip) / oracle_clip
    assert rel < 0.15 or abs(ours_clip - oracle_clip) <= 9 * width, (
        dist, ours_clip, oracle_clip, rel
    )
    if dist == "gauss_outliers":
        # both must clip the outlier tail hard
        assert ours_clip < 0.5 * amax and oracle_clip < 0.5 * amax


class TestMixedPrecisionPolicy:
    """quant/policy.py: per-site exclusion (the reference's INT8+FP16
    dual-flag per-layer fallback, det2trt/convert/onnx2tensorrt.py:49-54)."""

    def test_pattern_matching(self):
        from bevformer_tensorrt_tpu.quant.policy import (
            effective_quant,
            quant_excluded,
            set_quant_exclude,
        )

        set_quant_exclude(("decoder", "*reference_points*", "layers_0/ffn"))
        try:
            assert quant_excluded(("pts_bbox_head", "transformer", "decoder", "x"))
            assert quant_excluded(("a", "reference_points"))
            assert quant_excluded(("enc", "layers_0", "ffn", "fc1"))
            assert not quant_excluded(("enc", "layers_1", "ffn", "fc1"))
            assert effective_quant("int8", ("decoder", "q_proj")) is False
            assert effective_quant("int8", ("encoder", "q_proj")) == "int8"
            assert effective_quant(False, ("decoder",)) is False
        finally:
            set_quant_exclude(())

    def test_policy_sidecar_roundtrip(self, tmp_path):
        from bevformer_tensorrt_tpu.quant.policy import load_policy, save_policy

        art = tmp_path / "scales.msgpack"
        art.write_bytes(b"")
        save_policy(art, exclude=("decoder", "flash"), method="entropy")
        assert load_policy(art) == ("decoder", "flash")
        assert load_policy(tmp_path / "other.msgpack") == ()

    def test_qdense_exclusion_runs_fp(self, rng):
        """An excluded QDense must ignore its calibrated scale entirely —
        bit-identical to the plain fp layer."""
        from bevformer_tensorrt_tpu.models.layers import QDense
        from bevformer_tensorrt_tpu.quant.policy import set_quant_exclude

        class Wrap(nn.Module):
            quant: bool | str = False

            @nn.compact
            def __call__(self, x):
                return QDense(8, quant=self.quant, name="proj")(x)

        x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        dense_q = Wrap(quant="int8")
        dense_fp = Wrap(quant=False)
        v = dense_fp.init(jax.random.PRNGKey(0), x)
        vq = {**v, "quant": {"proj": {"qdq_in": {"scale": jnp.float32(0.05)}}}}
        set_quant_exclude(("proj",))
        try:
            y_ex = dense_q.apply(vq, x)
        finally:
            set_quant_exclude(())
        y_fp = dense_fp.apply(v, x)
        np.testing.assert_array_equal(np.asarray(y_ex), np.asarray(y_fp))
        # and without exclusion the int8 path actually quantizes
        y_q = dense_q.apply(vq, x)
        assert np.max(np.abs(np.asarray(y_q) - np.asarray(y_fp))) > 0

    def test_detector_config_exclusion_changes_output(self, rng):
        """quant_exclude is honored through the full detector: excluding the
        decoder changes the quantized output and leaves fp untouched."""
        from bevformer_tensorrt_tpu.configs.bevformer import bevformer_micro
        from bevformer_tensorrt_tpu.models.detectors.bevformer import BEVFormer
        from flax import traverse_util

        cfg_q = bevformer_micro(quant=True, msda_impl="jnp")
        m = BEVFormer(cfg_q)
        nq = cfg_q.bev_h * cfg_q.bev_w
        args = (
            jnp.asarray(
                rng.standard_normal(
                    (1, cfg_q.num_cams, 3, cfg_q.img_h, cfg_q.img_w)
                ).astype(np.float32)
            ),
            jnp.zeros((nq, 1, cfg_q.embed_dims), jnp.float32),
            jnp.float32(0.0),
            jnp.zeros(cfg_q.can_bus_dims, jnp.float32),
            jnp.asarray(rng.standard_normal((1, cfg_q.num_cams, 4, 4)).astype(np.float32)),
        )
        v = m.init(jax.random.PRNGKey(0), *args)
        _, mut = m.apply(v, *args, mutable=["amax_stats"])
        flat = traverse_util.flatten_dict(mut["amax_stats"])
        scales = {
            p[:-1] + ("scale",): jnp.maximum(x, 1e-6) / 127.0 for p, x in flat.items()
        }
        qv = {**v, "quant": traverse_util.unflatten_dict(scales)}
        out_all = m.apply(qv, *args)

        cfg_ex = bevformer_micro(
            quant=True, msda_impl="jnp", quant_exclude=("decoder",)
        )
        out_ex = BEVFormer(cfg_ex).apply(qv, *args)

        cfg_fp = bevformer_micro(quant=False, msda_impl="jnp")
        out_fp = BEVFormer(cfg_fp).apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]}, *args
        )

        d_all = float(jnp.max(jnp.abs(out_all[2] - out_fp[2])))
        d_ex = float(jnp.max(jnp.abs(out_ex[2] - out_fp[2])))
        assert d_all > 0 and d_ex > 0
        assert d_ex != d_all  # exclusion changed the quantized graph
