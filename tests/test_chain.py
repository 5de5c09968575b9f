"""Chained int8-resident deploy mode (qmode='intc', quant/chain.py).

The fold must reproduce the 2-step boundary (f32 epilogue + ReLU +
act_to_int8) exactly when float arithmetic is exact (power-of-two
affines), and stay within quantization noise on arbitrary scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.models import get_model
from dlmc_quant_tpu.quant.chain import (DeferredEpilogue, fold_quantize,
                                        materialize, qrelu)
from dlmc_quant_tpu.quant.config import scheme_from_dict
from dlmc_quant_tpu.quant.deploy import act_to_int8, prepare_deploy
from dlmc_quant_tpu.quant.layers import calibrate


def _scheme():
    return scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "args": {"n_bits": 8, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
    })


class TestFoldQuantize:
    def test_exact_vs_two_step_pow2(self):
        """Power-of-2 affines make f32 exact: fold == epilogue+relu+quant
        bit-for-bit (including the ReLU-into-clamp lower bound)."""
        key = jax.random.PRNGKey(0)
        acc = jax.random.randint(key, (64, 32), -(2 ** 20), 2 ** 20,
                                 jnp.int32)
        ps = jnp.full((1, 32), 2.0 ** -12)
        pb = jnp.arange(32, dtype=jnp.float32).reshape(1, 32) * 0.25 - 4.0
        s_x, o_x = jnp.float32(2.0 ** -4), jnp.float32(-2.0)
        inv_s, qb = 1.0 / s_x, -o_x / s_x - 128.0

        for relu in (True, False):
            d = DeferredEpilogue(acc, ps, pb, relu=relu)
            got = fold_quantize(d, inv_s, qb, -128, 127)
            y = acc.astype(jnp.float32) * ps + pb
            if relu:
                y = jnp.maximum(y, 0.0)
            want, _ = act_to_int8(y, s_x, o_x, 0, 255,
                                  inv_s_x=inv_s, qbias=qb)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_relu_lower_bound_is_zero_code(self):
        """Everything negative lands on the consumer's code for real 0."""
        acc = jnp.full((4, 8), -(2 ** 18), jnp.int32)
        d = DeferredEpilogue(acc, jnp.full((1, 8), 2.0 ** -10),
                             jnp.zeros((1, 8)), relu=True)
        s_x, o_x = jnp.float32(2.0 ** -5), jnp.float32(0.0)
        got = fold_quantize(d, 1.0 / s_x, -o_x / s_x - 128.0, -128, 127)
        assert int(jnp.max(got)) == int(jnp.min(got)) == -128  # code of 0

    def test_qrelu_materialize(self):
        x = jnp.array([[-1.0, 2.0]])
        assert jnp.allclose(qrelu(x), jnp.array([[0.0, 2.0]]))
        d = DeferredEpilogue(jnp.array([[-4, 4]], jnp.int32),
                             jnp.float32(0.5), jnp.float32(1.0))
        assert not d.relu and qrelu(d).relu
        np.testing.assert_allclose(np.asarray(materialize(d)),
                                   [[-1.0, 3.0]])
        np.testing.assert_allclose(np.asarray(materialize(qrelu(d))),
                                   [[0.0, 3.0]])
        assert d.shape == (1, 2) and d.ndim == 2


class TestChainedModels:
    @pytest.mark.parametrize("name", ["RepVGG_A0", "mobileone_s0"])
    def test_intc_matches_int(self, name):
        model = get_model(name, num_classes=10, scheme=_scheme(),
                          deploy=True)
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
        v = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        v = calibrate(model, v, [x])
        v = prepare_deploy(model, v, sample_input=x)
        y_int = model.apply(v, x, qmode="int")
        y_c = model.apply(v, x, qmode="intc")
        assert y_c.shape == y_int.shape
        rel = float(jnp.linalg.norm(y_c - y_int)
                    / (jnp.linalg.norm(y_int) + 1e-9))
        assert rel < 2e-2   # ±1-code fp-reassociation flips only

    def test_intc_on_trainform_falls_back(self):
        """Non-deploy blocks map intc -> int (no wrapper leaks)."""
        model = get_model("RepVGG_A0", num_classes=10, scheme=_scheme(),
                          deploy=False)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        v = jax.jit(model.init)(jax.random.PRNGKey(1), x)
        v = calibrate(model, v, [x])
        v = prepare_deploy(model, v, sample_input=x)
        y = model.apply(v, x, qmode="intc")
        assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))


class TestResNetDeploy:
    def test_fold_exact_and_intc_runs(self):
        """resnet_deploy: BN-free deploy twin matches the train-form
        eval forward; the intc int path runs and tracks it."""
        import flax
        from dlmc_quant_tpu.models.fuse import resnet_deploy

        model = get_model("cifar_resnet20", num_classes=10,
                          scheme=_scheme())
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
        v = flax.core.unfreeze(jax.jit(model.init)(jax.random.PRNGKey(1), x))
        # make BN stats non-trivial so the fold is actually exercised
        v["batch_stats"] = jax.tree_util.tree_map(
            lambda a: a + 0.3 * jax.random.uniform(
                jax.random.PRNGKey(2), a.shape), v["batch_stats"])

        dmodel, dv = resnet_deploy(model, v)
        y_train = model.apply(v, x, qmode="fp")
        y_dep = dmodel.apply(dv, x, qmode="fp")
        np.testing.assert_allclose(np.asarray(y_dep), np.asarray(y_train),
                                   rtol=2e-4, atol=2e-5)
        assert "batch_stats" not in dv

        dv = calibrate(dmodel, dv, [x])
        dv = prepare_deploy(dmodel, dv, sample_input=x)
        y_int = dmodel.apply(dv, x, qmode="int")
        y_c = dmodel.apply(dv, x, qmode="intc")
        rel = float(jnp.linalg.norm(y_c - y_int)
                    / (jnp.linalg.norm(y_int) + 1e-9))
        assert y_c.shape == (4, 10) and rel < 2e-2

    def test_residual_chain_stays_int8(self):
        """A deploy-form block emits QuantizedTensor codes in intc —
        the residual boundary itself is int8-resident, and a consumer
        conv adapts its epilogue to the incoming grid (colsum path)."""
        import flax
        from dlmc_quant_tpu.models.resnet_cifar import BasicBlock
        from dlmc_quant_tpu.quant.chain import QuantizedTensor

        blk = BasicBlock(16, deploy=True, scheme=_scheme())
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 16))
        v = flax.core.unfreeze(blk.init(jax.random.PRNGKey(1), x))
        v = calibrate(blk, v, [x])
        v = prepare_deploy(blk, v, sample_input=x)
        out = blk.apply(v, x, qmode="intc")
        assert isinstance(out, QuantizedTensor)
        assert out.q.dtype == jnp.int8
        # codes dequantize to ~ the f32 int-path output
        ref = blk.apply(v, x, qmode="int")
        got = materialize(out)
        err = float(jnp.max(jnp.abs(got - ref)))
        step = float(out.scale)
        assert err <= 1.5 * step     # within one code of the grid

    def test_bottleneck_intc_matches_int(self):
        """Bottleneck (downsample conv shortcut) chained vs plain int."""
        import flax
        from dlmc_quant_tpu.models.fuse import resnet_deploy

        model = get_model("cifar_resnet50", num_classes=10,
                          scheme=_scheme())
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        v = flax.core.unfreeze(jax.jit(model.init)(jax.random.PRNGKey(1), x))
        dmodel, dv = resnet_deploy(model, v)
        dv = calibrate(dmodel, dv, [x])
        dv = prepare_deploy(dmodel, dv, sample_input=x)
        y_int = dmodel.apply(dv, x, qmode="int")
        y_c = dmodel.apply(dv, x, qmode="intc")
        rel = float(jnp.linalg.norm(y_c - y_int)
                    / (jnp.linalg.norm(y_int) + 1e-9))
        assert y_c.shape == (2, 10) and rel < 5e-2

    def test_mobilenet_deploy_fold_and_intc(self):
        """MobileNetV2 deploy twin: BN fold exact in fp; the chained
        int path (ReLU6 fold + linear-bottleneck residual QBlockOutput)
        tracks plain int."""
        import flax
        from dlmc_quant_tpu.models.fuse import mobilenet_deploy

        model = get_model("cifar_mobilenet_v2", num_classes=10,
                          width_mult=0.5, scheme=_scheme())
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        v = flax.core.unfreeze(jax.jit(model.init)(jax.random.PRNGKey(1), x))
        v["batch_stats"] = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jax.random.uniform(
                jax.random.PRNGKey(2), a.shape), v["batch_stats"])

        dmodel, dv = mobilenet_deploy(model, v)
        np.testing.assert_allclose(
            np.asarray(dmodel.apply(dv, x, qmode="fp")),
            np.asarray(model.apply(v, x, qmode="fp")),
            rtol=2e-4, atol=2e-5)
        assert "batch_stats" not in dv

        dv = calibrate(dmodel, dv, [x])
        from dlmc_quant_tpu.quant.deploy import prepare_deploy as prep
        dv = prep(dmodel, dv, sample_input=x)
        # intc re-samples the same quantization noise as int (block
        # outputs land on their own grids), so compare each against the
        # fp teacher: the chained path must be no noisier than plain int
        y_fp = dmodel.apply(dv, x, qmode="fp")
        y_int = dmodel.apply(dv, x, qmode="int")
        y_c = dmodel.apply(dv, x, qmode="intc")
        nfp = jnp.linalg.norm(y_fp) + 1e-9
        rel_int = float(jnp.linalg.norm(y_int - y_fp) / nfp)
        rel_c = float(jnp.linalg.norm(y_c - y_fp) / nfp)
        assert y_c.shape == (2, 10)
        assert rel_c < max(1.5 * rel_int, 0.02), (rel_c, rel_int)

    @pytest.mark.parametrize("name,conv,kw", [
        ("ghostnet", "ghostnet_deploy", {"width": 0.5}),
        ("cifar_efficientnetb0", "efficientnet_deploy", {}),
    ])
    def test_ghostnet_efficientnet_deploy(self, name, conv, kw):
        """BN-folded deploy twins for the rest of the zoo: fp-exact
        conversion and a working int path (chained where activations
        allow, plain int elsewhere)."""
        import flax
        from dlmc_quant_tpu.models import fuse as fusemod

        model = get_model(name, num_classes=10, scheme=_scheme(), **kw)
        size = 64 if name == "ghostnet" else 32
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, size, size, 3))
        v = flax.core.unfreeze(jax.jit(model.init)(jax.random.PRNGKey(1), x))
        v["batch_stats"] = jax.tree_util.tree_map(
            lambda a: a + 0.1 * jax.random.uniform(
                jax.random.PRNGKey(2), a.shape), v["batch_stats"])

        dmodel, dv = getattr(fusemod, conv)(model, v, example_input=x[:1])
        np.testing.assert_allclose(
            np.asarray(dmodel.apply(dv, x, qmode="fp")),
            np.asarray(model.apply(v, x, qmode="fp")),
            rtol=2e-3, atol=3e-5)
        assert "batch_stats" not in dv

        dv = calibrate(dmodel, dv, [x])
        dv = prepare_deploy(dmodel, dv, sample_input=x)
        y_fp = dmodel.apply(dv, x, qmode="fp")
        y_int = dmodel.apply(dv, x, qmode="int")
        y_c = dmodel.apply(dv, x, qmode="intc")
        nfp = jnp.linalg.norm(y_fp) + 1e-9
        rel_int = float(jnp.linalg.norm(y_int - y_fp) / nfp)
        rel_c = float(jnp.linalg.norm(y_c - y_fp) / nfp)
        assert y_c.shape == (2, 10)
        assert rel_c < max(1.5 * rel_int, 0.02), (rel_c, rel_int)

    def test_imagenet_stem_qmaxpool_chain(self):
        """The 7×7/s2 + maxpool stem stays on the chain: pooling the
        int32 accumulator commutes with the epilogue (chain.qmaxpool),
        so block1 folds relu+quantize instead of materializing f32."""
        import flax
        from dlmc_quant_tpu.models.fuse import resnet_deploy

        model = get_model("resnet18", num_classes=10, scheme=_scheme())
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        v = flax.core.unfreeze(jax.jit(model.init)(jax.random.PRNGKey(1), x))
        dmodel, dv = resnet_deploy(model, v, example_input=x[:1])
        dv = calibrate(dmodel, dv, [x])
        dv = prepare_deploy(dmodel, dv, sample_input=x)
        y_fp = dmodel.apply(dv, x, qmode="fp")
        y_int = dmodel.apply(dv, x, qmode="int")
        y_c = dmodel.apply(dv, x, qmode="intc")
        nfp = jnp.linalg.norm(y_fp) + 1e-9
        rel_int = float(jnp.linalg.norm(y_int - y_fp) / nfp)
        rel_c = float(jnp.linalg.norm(y_c - y_fp) / nfp)
        assert y_c.shape == (2, 10)
        assert rel_c < max(1.5 * rel_int, 0.02), (rel_c, rel_int)

    def test_qrelu6_fold_matches_eager(self):
        """ReLU6 upper clamp folded into the quantize == clamp-then-
        quantize, bit-for-bit on power-of-2 affines."""
        from dlmc_quant_tpu.quant.chain import qrelu6

        acc = jax.random.randint(jax.random.PRNGKey(3), (32, 16),
                                 -(2 ** 16), 2 ** 16, jnp.int32)
        ps = jnp.full((1, 16), 2.0 ** -12)
        pb = jnp.zeros((1, 16))
        d = qrelu6(DeferredEpilogue(acc, ps, pb))
        assert d.relu and d.clamp_hi == 6.0
        s_x, o_x = jnp.float32(2.0 ** -6), jnp.float32(0.0)
        inv_s, qb = 1.0 / s_x, -o_x / s_x - 128.0
        got = fold_quantize(d, inv_s, qb, -128, 127)
        y = jnp.minimum(jnp.maximum(
            acc.astype(jnp.float32) * ps + pb, 0.0), 6.0)
        want, _ = act_to_int8(y, s_x, o_x, 0, 255, inv_s_x=inv_s, qbias=qb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bottleneck_variant(self):
        import flax
        from dlmc_quant_tpu.models.fuse import resnet_deploy
        model = get_model("cifar_resnet50", num_classes=10,
                          scheme=_scheme())
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        v = flax.core.unfreeze(jax.jit(model.init)(jax.random.PRNGKey(1), x))
        dmodel, dv = resnet_deploy(model, v)
        np.testing.assert_allclose(
            np.asarray(dmodel.apply(dv, x, qmode="fp")),
            np.asarray(model.apply(v, x, qmode="fp")), rtol=2e-4, atol=2e-5)
