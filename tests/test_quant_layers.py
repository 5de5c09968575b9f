"""Tests for QuantScheme resolution and quantized layers (all families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax
import flax.linen as nn

from dlmc_quant_tpu.quant.config import scheme_from_dict
from dlmc_quant_tpu.quant.layers import QConv, QDense, calibrate


def w8a8_scheme(qtype=None, wt_type="minmax_channel", in_type="minmax_tensor",
                **extra):
    d = {
        "quantization_type": qtype,
        "weight": {"enable": True, "type": wt_type,
                   "args": {"n_bits": 8, "signed": True}},
        "input": {"enable": True, "type": in_type,
                  "args": {"n_bits": 8, "signed": False}},
    }
    d.update(extra)
    return scheme_from_dict(d)


class TestSchemeResolution:
    def test_default_resolves(self):
        s = w8a8_scheme()
        cfg = s.resolve("block1.conv1")
        assert cfg is not None and cfg.weight.n_bits == 8

    def test_exclude_regex(self):
        s = w8a8_scheme(exclude_layers=[".*head.*", "conv_stem"])
        assert s.resolve("head.fc") is None
        assert s.resolve("conv_stem") is None
        assert s.resolve("block1.conv1") is not None

    def test_override_merge(self):
        s = w8a8_scheme(override_options=[
            {"layers": [".*linear.*"],
             "options": {"weight": {"args": {"n_bits": 4}}}}])
        cfg = s.resolve("stage3.linear")
        assert cfg.weight.n_bits == 4
        assert cfg.weight.signed is True  # untouched field preserved
        assert cfg.input.n_bits == 8
        assert s.resolve("stage3.conv").weight.n_bits == 8

    def test_null_section_is_fp32(self):
        assert scheme_from_dict(None) is None

    def test_scheme_hashable(self):
        hash(w8a8_scheme())


def _init_and_calibrate(model, x, key=0, n_batches=1):
    variables = model.init(jax.random.PRNGKey(key), x)
    return calibrate(model, variables, [x] * n_batches)


class TestLSQFamily:
    def test_conv_calibrated_close_to_fp(self):
        scheme = w8a8_scheme()
        model = QConv(features=8, kernel_size=(3, 3), scheme=scheme)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
        variables = _init_and_calibrate(model, x)
        y_q = model.apply(variables, x, qmode="eval")
        y_fp = model.apply(variables, x, qmode="fp")
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.05, rel

    def test_uncalibrated_scale_is_one(self):
        model = QConv(features=4, scheme=w8a8_scheme())
        x = jnp.ones((1, 4, 4, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        assert v["params"]["wt_scale"].shape == (4,)  # per-channel
        np.testing.assert_array_equal(np.asarray(v["params"]["wt_scale"]), 1.0)

    def test_per_channel_scale_shape_after_calibration(self):
        model = QConv(features=6, scheme=w8a8_scheme())
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
        v = _init_and_calibrate(model, x)
        s = np.asarray(v["params"]["wt_scale"])
        assert s.shape == (6,)
        # matches per-output-channel absmax / 127 of the HWIO kernel
        k = np.asarray(v["params"]["kernel"])
        expect = np.abs(k).reshape(-1, 6).max(0) / 127
        np.testing.assert_allclose(s, expect, rtol=1e-5)

    def test_no_scheme_is_plain_conv(self):
        model = QConv(features=4, scheme=None)
        x = jnp.ones((1, 4, 4, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        assert "wt_scale" not in v["params"]

    def test_dense(self):
        model = QDense(features=10, scheme=w8a8_scheme())
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 32))
        v = _init_and_calibrate(model, x)
        y_q = model.apply(v, x, qmode="eval")
        y_fp = model.apply(v, x, qmode="fp")
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.05

    def test_lsq_gradients_flow_to_scales(self):
        model = QDense(features=4, scheme=w8a8_scheme(wt_type="LSQ",
                                                      in_type="LSQ"))
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 16))
        v = _init_and_calibrate(model, x)

        def loss(params):
            y = model.apply({**v, "params": params}, x, qmode="train")
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(v["params"])
        assert float(jnp.abs(g["wt_scale"])) > 0
        assert float(jnp.abs(g["in_scale"])) > 0

    def test_output_recon_weight_observer(self):
        model = QDense(features=4,
                       scheme=w8a8_scheme(wt_type="l2norm_output"))
        x = jax.random.normal(jax.random.PRNGKey(5), (16, 8))
        v = _init_and_calibrate(model, x)
        assert float(v["params"]["wt_scale"]) > 0
        y_q = model.apply(v, x, qmode="eval")
        y_fp = model.apply(v, x, qmode="fp")
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.1

    def test_fsptq_output_recon_weight_observer(self):
        # '*output*' observers must dispatch from the FSPTQ family too
        # (ref: modules/base.py:106-129 fnmatch applies to every family)
        model = QDense(features=4,
                       scheme=w8a8_scheme(qtype="FSPTQ",
                                          wt_type="l2norm_output_channel"))
        x = jax.random.normal(jax.random.PRNGKey(5), (16, 8))
        v = _init_and_calibrate(model, x)
        assert v["params"]["wt_scale"].shape == (4,)
        assert float(jnp.min(v["params"]["wt_scale"])) > 0
        y_q = model.apply(v, x, qmode="eval")
        y_fp = model.apply(v, x, qmode="fp")
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.1

    def test_multibatch_observe(self):
        model = QDense(features=4, scheme=w8a8_scheme())
        k = jax.random.PRNGKey(6)
        batches = [jax.random.normal(jax.random.fold_in(k, i), (8, 16)) + i
                   for i in range(3)]
        v = model.init(jax.random.PRNGKey(0), batches[0])
        v = calibrate(model, v, batches, observe_passes=3)
        # input scale must cover the range of ALL batches, not just batch 0
        all_x = jnp.concatenate(batches)
        span = float(jnp.max(all_x) - jnp.min(all_x))
        np.testing.assert_allclose(float(v["params"]["in_scale"]) * 255,
                                   span, rtol=1e-4)


class TestPathResolution:
    class Net(nn.Module):
        scheme: object = None

        @nn.compact
        def __call__(self, x, qmode="eval"):
            x = QConv(features=4, name="conv_stem", scheme=self.scheme)(
                x, qmode=qmode)
            x = QConv(features=8, name="conv1", scheme=self.scheme)(
                x, qmode=qmode)
            return x

    def test_exclude_by_path(self):
        scheme = w8a8_scheme(exclude_layers=["conv_stem"])
        model = self.Net(scheme=scheme)
        x = jnp.ones((1, 8, 8, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        assert "wt_scale" not in v["params"]["conv_stem"]
        assert "wt_scale" in v["params"]["conv1"]


class TestRootQFamily:
    def test_calibrate_sets_bounds(self):
        scheme = w8a8_scheme(qtype="RootQ", momentum=0.01)
        model = QConv(features=4, scheme=scheme)
        x = jax.random.uniform(jax.random.PRNGKey(7), (2, 6, 6, 3)) * 4
        v = _init_and_calibrate(model, x)
        w = v["params"]["kernel"]
        expect = float(2 * jnp.mean(jnp.abs(w)) * jnp.sqrt(127.0))
        np.testing.assert_allclose(float(v["params"]["wt_upper"]), expect,
                                   rtol=1e-5)
        np.testing.assert_allclose(float(v["params"]["wt_lower"]), -expect,
                                   rtol=1e-5)
        span = float(jnp.max(x) - jnp.min(x))
        np.testing.assert_allclose(float(v["params"]["in_scale"]) * 255,
                                   span, rtol=1e-4)

    def test_train_updates_ema_and_grads_flow(self):
        scheme = w8a8_scheme(qtype="RootQ", momentum=0.1)
        model = QConv(features=4, scheme=scheme)
        x = jax.random.uniform(jax.random.PRNGKey(8), (2, 6, 6, 3)) * 2
        v = _init_and_calibrate(model, x)
        run0 = float(v["qstate"]["wt_run_upper"])

        def loss(params, qstate):
            y, upd = model.apply({"params": params, "qstate": qstate}, x,
                                 qmode="train", mutable=["qstate"])
            return jnp.sum(y ** 2), upd["qstate"]

        (l, new_qstate), g = jax.value_and_grad(loss, has_aux=True)(
            v["params"], v["qstate"])
        for p in ("wt_upper", "wt_lower", "wt_alpha", "in_scale"):
            assert np.isfinite(float(g[p])), p
        assert float(g["wt_alpha"]) != 0
        # EMA blend moved running bound toward the (perturbed) param
        perturbed = {**v["params"], "wt_upper": v["params"]["wt_upper"] + 1.0}
        _, qs2 = loss(perturbed, v["qstate"])
        assert float(qs2["wt_run_upper"]) > run0

    def test_eval_uses_running_stats(self):
        scheme = w8a8_scheme(qtype="RootQ")
        model = QConv(features=4, scheme=scheme)
        x = jax.random.uniform(jax.random.PRNGKey(9), (2, 6, 6, 3))
        v = _init_and_calibrate(model, x)
        y1 = model.apply(v, x, qmode="eval")
        y2 = model.apply(v, x, qmode="eval")
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


class TestFSPTQFamily:
    def test_round_mode_close_to_fp(self):
        scheme = w8a8_scheme(qtype="FSPTQ")
        model = QConv(features=8, scheme=scheme)
        x = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 4))
        v = _init_and_calibrate(model, x)
        y_q = model.apply(v, x, qmode="eval")
        y_fp = model.apply(v, x, qmode="fp")
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.05
        assert "org_weight" in v["qstate"]

    def test_adaround_init_reproduces_round(self):
        d = {
            "quantization_type": "FSPTQ",
            "weight": {"enable": True, "type": "minmax_channel",
                       "recon_type": "adaround",
                       "args": {"n_bits": 8, "signed": True}},
            "input": {"enable": False},
        }
        scheme = scheme_from_dict(d)
        model = QDense(features=8, scheme=scheme)
        x = jax.random.normal(jax.random.PRNGKey(11), (4, 16))
        v = _init_and_calibrate(model, x)
        # at init, soft targets ≈ fractional remainder, so train-mode output
        # ≈ plain fake-quant reconstruction of the weight
        y_train = model.apply(v, x, qmode="train")
        y_fp = model.apply(v, x, qmode="fp")
        rel = float(jnp.linalg.norm(y_train - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.05

    def test_adaround_alpha_gradient(self):
        d = {
            "quantization_type": "FSPTQ",
            "weight": {"enable": True, "type": "minmax_channel",
                       "recon_type": "adaround",
                       "args": {"n_bits": 4, "signed": True}},
            "input": {"enable": False},
        }
        model = QDense(features=4, scheme=scheme_from_dict(d))
        x = jax.random.normal(jax.random.PRNGKey(12), (4, 8))
        v = _init_and_calibrate(model, x)
        # note: at init floor(w/s)+soft_target == w/s exactly, so a
        # reconstruction loss vs FP is at its global minimum (zero grad);
        # use a generic loss to check gradient plumbing instead
        def loss(params):
            y = model.apply({**v, "params": params}, x, qmode="train")
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(v["params"])
        assert float(jnp.sum(jnp.abs(g["alpha"]))) > 0


class TestCalibrationJitCache:
    """calibrate() must not re-trace per call (QAT periodic
    recalibration runs it every update_qparams_period steps)."""

    def test_second_calibrate_reuses_jits(self):
        from dlmc_quant_tpu.quant.layers import (_calibration_fns,
                                                 calibrate)
        d = {
            "quantization_type": "FSPTQ",
            "weight": {"enable": True, "type": "minmax_channel",
                       "args": {"n_bits": 8, "signed": True}},
            "input": {"enable": True, "type": "minmax_tensor",
                      "args": {"n_bits": 8, "signed": False}},
        }
        model = QDense(features=4, scheme=scheme_from_dict(d))
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        v = flax.core.unfreeze(model.init(jax.random.PRNGKey(1), x))

        obs1, cal1 = _calibration_fns(model, ())
        # first calibrate adds org_weight to qstate (new pytree
        # structure) -> one extra legitimate trace; steady state is
        # reached from the second call on
        v = calibrate(model, v, [x], observe_passes=1)
        v = calibrate(model, v, [x], observe_passes=1)
        n_traces = cal1._cache_size()
        v = calibrate(model, v, [x], observe_passes=1)
        obs2, cal2 = _calibration_fns(model, ())
        assert obs1 is obs2 and cal1 is cal2     # same jitted fns
        assert cal1._cache_size() == n_traces    # no new trace
