"""Tests for aux subsystems: MACs counter, compute-graph tracer,
generic merge_bn."""

import jax
import jax.numpy as jnp
import numpy as np

from dlmc_quant_tpu.models import get_model
from dlmc_quant_tpu.models.fuse import merge_bn
from dlmc_quant_tpu.utils.count_ops import count_ops, get_compute_graph


class TestCountOps:
    def test_resnet20_macs(self):
        m = get_model("cifar_resnet20", num_classes=10)
        counts = count_ops(m, jnp.ones((1, 32, 32, 3)))
        # resnet20 ≈ 41M MACs on 32x32
        assert 30e6 < counts["total"] < 50e6, counts["total"]
        assert "conv1" in counts
        # stem: 16 out channels, 3x3x3 kernel, 32x32 output
        assert counts["conv1"] == 32 * 32 * 16 * 9 * 3

    def test_no_flops_spent(self):
        # runs under eval_shape — must work without devices doing math
        m = get_model("cifar_resnet20")
        counts = count_ops(m, jnp.ones((128, 32, 32, 3)))
        assert counts["total"] > 1e9  # scales with batch


class TestComputeGraph:
    def test_sequential_chain(self):
        m = get_model("cifar_resnet20")
        g = get_compute_graph(m, jnp.ones((1, 32, 32, 3)), style="top")
        # stem conv feeds its BN
        assert "bn1" in g.get("conv1", [])
        gb = get_compute_graph(m, jnp.ones((1, 32, 32, 3)), style="bottom")
        assert "conv1" in gb.get("bn1", [])


class TestMergeBN:
    def test_fold_preserves_outputs(self):
        m = get_model("cifar_resnet20", num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(1), x)
        _, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        v = {**v, "batch_stats": upd["batch_stats"]}
        y0 = m.apply(v, x)
        v2 = merge_bn(m, v, x)
        y1 = m.apply(v2, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-4, atol=1e-5)
        # kernels actually changed (γ/σ absorbed)
        k0 = np.asarray(v["params"]["conv1"]["kernel"])
        k1 = np.asarray(v2["params"]["conv1"]["kernel"])
        assert not np.allclose(k0, k1)
        # BN neutralized to a bias-add
        np.testing.assert_allclose(
            np.asarray(v2["params"]["bn1"]["scale"]), 1.0)
