"""Tests for the extended model zoo: MobileNetV2, MobileOne (+fusion),
GhostNet, EfficientNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.models import get_model, list_models
from dlmc_quant_tpu.models.mobileone import MobileOne, mobileone_fuse


class TestMobileNetV2:
    def test_cifar_shapes(self):
        m = get_model("cifar_mobilenet_v2", num_classes=10)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 10)

    def test_imagenet_param_count(self):
        m = get_model("mobilenet_v2", num_classes=1000)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
        assert 3.0e6 < n < 4.0e6, n  # MBv2-1.0 ≈ 3.5M

    def test_profit_variant_registered(self):
        assert "profit_mobilenet_v2" in list_models()


class TestMobileOne:
    def _tiny(self, **kw):
        return MobileOne(num_blocks=(1, 1, 1, 1),
                         width_multipliers=(0.25, 0.25, 0.25, 0.25),
                         num_classes=10, **kw)

    def test_forward(self):
        m = self._tiny()
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 10)

    def test_fusion_exact(self):
        m = self._tiny(num_conv_branches=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(2), x)
        _, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        v = {**v, "batch_stats": upd["batch_stats"]}
        y0 = m.apply(v, x)
        dm, dv = mobileone_fuse(m, v, x)
        y1 = dm.apply(dv, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-3, atol=1e-4)

    def test_s1_registered(self):
        assert "MobileOne_S1" in list_models()


class TestGhostNet:
    def test_forward_and_params(self):
        m = get_model("ghostnet", num_classes=1000)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 1000)
        n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
        assert 4e6 < n < 6.5e6, n  # GhostNet-1.0 ≈ 5.2M


class TestEfficientNet:
    def test_b0_cifar(self):
        m = get_model("cifar_efficientnetb0", num_classes=10)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 10)

    def test_b0_param_count(self):
        m = get_model("efficientnetb0", num_classes=1000)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
        assert 4.5e6 < n < 6e6, n  # EffNet-B0 ≈ 5.3M

    def test_all_variants_registered(self):
        names = list_models()
        for v in "b0 b1 b2 b3 b4 b5 b6 b7".split():
            assert f"cifar_efficientnet{v}" in names


class TestQuantizedExtraModels:
    def test_mbv2_quantized_eval(self):
        from dlmc_quant_tpu.quant.config import scheme_from_dict
        from dlmc_quant_tpu.quant.layers import calibrate
        scheme = scheme_from_dict({
            "weight": {"enable": True, "type": "minmax_channel",
                       "args": {"n_bits": 8, "signed": True}},
            "input": {"enable": True, "type": "minmax_tensor",
                      "args": {"n_bits": 8, "signed": False}},
        })
        m = get_model("cifar_mobilenet_v2", num_classes=10, scheme=scheme,
                      width_mult=0.35)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(1), x)
        v = calibrate(m, v, [x])
        y_q = m.apply(v, x, qmode="eval")
        y_fp = m.apply(v, x, qmode="fp")
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.2, rel
