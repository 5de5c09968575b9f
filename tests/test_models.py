"""Model zoo tests: shapes, registry, RepVGG fusion equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.models import get_model, list_models
from dlmc_quant_tpu.models.fuse import fuse_repvgg_block, repvgg_fuse
from dlmc_quant_tpu.models.repvgg import RepVGG
from dlmc_quant_tpu.quant.config import scheme_from_dict


class TestRegistry:
    def test_lists_models(self):
        names = list_models()
        assert "RepVGG_A0" in names
        assert "cifar_resnet20" in names

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown model"):
            get_model("nope")


class TestCifarResNet:
    def test_resnet20_shapes(self):
        m = get_model("cifar_resnet20", num_classes=10)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (2, 10)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
        # ~0.27M params for resnet20 (option-A shortcuts)
        assert 0.2e6 < n_params < 0.35e6, n_params

    def test_resnet18_shapes(self):
        m = get_model("cifar_resnet18", num_classes=100)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 100)

    def test_imagenet_resnet50_shapes(self):
        m = get_model("resnet50", num_classes=1000)
        x = jnp.ones((1, 64, 64, 3))  # small spatial, same param count
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (1, 1000)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
        # torchvision resnet50 has ~25.6M params
        assert 24e6 < n_params < 27e6, n_params

    def test_train_mode_updates_bn(self):
        m = get_model("cifar_resnet20")
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        _, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        before = v["batch_stats"]["bn1"]["mean"]
        after = upd["batch_stats"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestRepVGG:
    def _tiny(self, **kw):
        return RepVGG(num_blocks=(1, 1, 1, 1),
                      width_multiplier=(0.25, 0.25, 0.25, 0.25),
                      num_classes=10, **kw)

    def test_forward_shape(self):
        m = self._tiny()
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 10)

    def test_a0_param_count(self):
        m = get_model("RepVGG_A0", num_classes=1000)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
        # RepVGG-A0 train-form ≈ 9.1M params (8.3M deploy)
        assert 8.5e6 < n < 10e6, n

    def test_block_fusion_exact(self):
        """Fused single conv must reproduce the 3-branch output exactly."""
        m = self._tiny()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        # perturb BN stats so the test isn't trivially-zero means
        v = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jax.random.normal(
                jax.random.PRNGKey(3), p.shape), v)
        v["batch_stats"] = jax.tree_util.tree_map(
            lambda p: jnp.abs(p), v["batch_stats"])  # keep var positive
        y_train_form = m.apply(v, x)
        deploy_m, deploy_v = repvgg_fuse(m, v, x)
        y_deploy = deploy_m.apply(deploy_v, x)
        np.testing.assert_allclose(np.asarray(y_deploy),
                                   np.asarray(y_train_form),
                                   rtol=1e-3, atol=1e-4)

    def test_fusion_grouped(self):
        m = RepVGG(num_blocks=(1, 2, 1, 1),
                   width_multiplier=(0.25, 0.25, 0.25, 0.25),
                   override_groups_map={2: 2}, num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(v, x)
        dm, dv = repvgg_fuse(m, v, x)
        y1 = dm.apply(dv, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-3, atol=1e-4)

    def test_fusion_with_se(self):
        m = RepVGG(num_blocks=(1, 1, 1, 1),
                   width_multiplier=(0.25, 0.25, 0.25, 0.25),
                   use_se=True, num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(v, x)
        dm, dv = repvgg_fuse(m, v, x)
        np.testing.assert_allclose(np.asarray(dm.apply(dv, x)),
                                   np.asarray(y0), rtol=1e-3, atol=1e-4)

    def test_quantized_deploy_model(self):
        scheme = scheme_from_dict({
            "quantization_type": "FSPTQ",
            "weight": {"enable": True, "type": "minmax_channel",
                       "args": {"n_bits": 8, "signed": True}},
            "input": {"enable": True, "type": "minmax_tensor",
                      "args": {"n_bits": 8, "signed": False}},
        })
        m = self._tiny()
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        dm, dv = repvgg_fuse(m, v, x)
        qm = dataclasses.replace(dm, scheme=scheme)
        qv = qm.init(jax.random.PRNGKey(0), x)
        # graft fused weights into the quantized model's tree
        import flax
        flatq = flax.traverse_util.flatten_dict(qv["params"])
        flatd = flax.traverse_util.flatten_dict(dv["params"])
        for k, val in flatd.items():
            flatq[k] = val
        qv["params"] = flax.traverse_util.unflatten_dict(flatq)

        from dlmc_quant_tpu.quant.layers import calibrate
        qv = calibrate(qm, qv, [x])
        y_q = qm.apply(qv, x, qmode="eval")
        y_fp = dm.apply(dv, x)
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 0.1, rel
