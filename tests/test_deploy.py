"""Integer-execution (deploy) path tests: int8 forward must match the
fake-quant eval path bit-for-nearly-bit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.quant.config import scheme_from_dict
from dlmc_quant_tpu.quant.deploy import prepare_deploy
from dlmc_quant_tpu.quant.layers import QConv, QDense, calibrate


def scheme(qtype=None, w_bits=8, a_bits=8, a_enable=True, recon=None):
    return scheme_from_dict({
        "quantization_type": qtype,
        "weight": {"enable": True, "type": "minmax_channel",
                   "recon_type": recon,
                   "args": {"n_bits": w_bits, "signed": True}},
        "input": {"enable": a_enable, "type": "minmax_tensor",
                  "args": {"n_bits": a_bits, "signed": False}},
    })


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-9))


def _setup(model, x):
    v = model.init(jax.random.PRNGKey(0), x)
    v = calibrate(model, v, [x])
    v = prepare_deploy(model, v, sample_input=x)
    return v


class TestIntConv:
    def test_int8_matches_fakequant(self):
        m = QConv(features=16, kernel_size=(3, 3), scheme=scheme())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1),
                                          (2, 8, 8, 8)))
        v = _setup(m, x)
        y_int = m.apply(v, x, qmode="int")
        y_fq = m.apply(v, x, qmode="eval")
        assert _rel(y_int, y_fq) < 2e-2, _rel(y_int, y_fq)
        assert "w_int" in v["qint"]
        assert v["qint"]["w_int"].dtype == jnp.int8

    def test_stride2_same_padding(self):
        m = QConv(features=8, kernel_size=(3, 3), strides=(2, 2),
                  scheme=scheme())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(2),
                                          (2, 9, 9, 4)))
        v = _setup(m, x)
        y_int = m.apply(v, x, qmode="int")
        y_fq = m.apply(v, x, qmode="eval")
        assert y_int.shape == y_fq.shape
        assert _rel(y_int, y_fq) < 2e-2

    def test_grouped(self):
        m = QConv(features=8, kernel_size=(3, 3), feature_group_count=2,
                  scheme=scheme())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(3),
                                          (2, 8, 8, 8)))
        v = _setup(m, x)
        assert _rel(m.apply(v, x, qmode="int"),
                    m.apply(v, x, qmode="eval")) < 2e-2

    def test_negative_inputs_with_offset(self):
        """Unsigned act observer with a negative min → nonzero offset and
        zero-point padding must still match."""
        m = QConv(features=8, kernel_size=(3, 3), scheme=scheme())
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4)) - 0.3
        v = _setup(m, x)
        assert _rel(m.apply(v, x, qmode="int"),
                    m.apply(v, x, qmode="eval")) < 2e-2

    def test_weight_only_w4(self):
        m = QConv(features=8, scheme=scheme(w_bits=4, a_enable=False))
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4))
        v = _setup(m, x)
        y_int = m.apply(v, x, qmode="int")
        y_fq = m.apply(v, x, qmode="eval")
        # bf16 compute → looser tolerance
        assert _rel(y_int, y_fq) < 3e-2
        assert "in_scale" not in v["qint"]

    def test_rootq_deploy(self):
        m = QConv(features=8, scheme=scheme(qtype="RootQ"))
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(6),
                                          (2, 8, 8, 4)))
        v = _setup(m, x)
        assert _rel(m.apply(v, x, qmode="int"),
                    m.apply(v, x, qmode="eval")) < 3e-2

    def test_fsptq_deploy(self):
        m = QConv(features=8, scheme=scheme(qtype="FSPTQ"))
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(7),
                                          (2, 8, 8, 4)))
        v = _setup(m, x)
        assert _rel(m.apply(v, x, qmode="int"),
                    m.apply(v, x, qmode="eval")) < 2e-2

    def test_fsptq_adaround_deploy_uses_learned_rounding(self):
        m = QConv(features=8, scheme=scheme(qtype="FSPTQ", recon="adaround"))
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(8),
                                          (2, 8, 8, 4)))
        v = _setup(m, x)
        # eval fake-quant uses floor + (alpha>=0); int path must match it
        assert _rel(m.apply(v, x, qmode="int"),
                    m.apply(v, x, qmode="eval")) < 2e-2


class TestIntDense:
    def test_int8_matches(self):
        m = QDense(features=16, scheme=scheme())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(9), (4, 32)))
        v = _setup(m, x)
        assert _rel(m.apply(v, x, qmode="int"),
                    m.apply(v, x, qmode="eval")) < 2e-2

    def test_int_output_dtype_and_jit(self):
        m = QDense(features=8, scheme=scheme())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(10), (4, 16)))
        v = _setup(m, x)
        f = jax.jit(lambda v, x: m.apply(v, x, qmode="int"))
        y = f(v, x)
        assert y.dtype == jnp.float32


class TestModelLevelDeploy:
    def test_fused_repvgg_int8_model(self):
        from dlmc_quant_tpu.models.fuse import repvgg_fuse
        from dlmc_quant_tpu.models.repvgg import RepVGG
        import flax

        m = RepVGG(num_blocks=(1, 1, 1, 1),
                   width_multiplier=(0.25, 0.25, 0.25, 0.25),
                   num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(11), (4, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(12), x)
        dm, dv = repvgg_fuse(m, v, x)
        qm = dataclasses.replace(dm, scheme=scheme(qtype="FSPTQ"))
        qv = qm.init(jax.random.PRNGKey(0), x)
        flatq = flax.traverse_util.flatten_dict(qv["params"])
        for k, val in flax.traverse_util.flatten_dict(dv["params"]).items():
            flatq[k] = val
        qv = {**qv, "params": flax.traverse_util.unflatten_dict(flatq)}
        qv = calibrate(qm, qv, [x])
        qv = prepare_deploy(qm, qv, sample_input=x)
        y_int = qm.apply(qv, x, qmode="int")
        y_fq = qm.apply(qv, x, qmode="eval")
        assert _rel(y_int, y_fq) < 5e-2, _rel(y_int, y_fq)


class TestInt4Packing:
    def test_pack_roundtrip(self):
        from dlmc_quant_tpu.quant.deploy import pack_int4, unpack_int4
        import jax.numpy as jnp
        w = jax.random.randint(jax.random.PRNGKey(0), (9, 4, 8), -8, 8,
                               dtype=jnp.int8)
        p = pack_int4(w)
        assert p.shape == (5, 4, 8) and p.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(unpack_int4(p, 9)),
                                      np.asarray(w))

    def test_w4_weight_only_uses_halved_storage(self):
        from dlmc_quant_tpu.quant.deploy import int4_native_supported
        m = QConv(features=8, scheme=scheme(w_bits=4, a_enable=False))
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4))
        v = _setup(m, x)
        assert "w_int" not in v["qint"]
        if int4_native_supported():
            assert v["qint"]["w_i4"].dtype == jnp.int4
        else:
            # packed int4 halves dim0 (kernel H=3 → 2 bytes)
            assert v["qint"]["w_int4"].shape[0] == 2
        y_int = m.apply(v, x, qmode="int")
        y_fq = m.apply(v, x, qmode="eval")
        assert _rel(y_int, y_fq) < 3e-2

    def test_w4a8_full_int_path(self):
        m = QConv(features=8, scheme=scheme(w_bits=4, a_bits=8))
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(6),
                                          (2, 8, 8, 4)))
        v = _setup(m, x)
        assert _rel(m.apply(v, x, qmode="int"),
                    m.apply(v, x, qmode="eval")) < 3e-2


class TestInt4:
    """True int4 execution (VERDICT r2 #6): weights stored as native S4
    dtype (XLA packs two-per-byte in device memory) and contracted
    directly by QDense's mixed s8×s4 dot."""

    def test_native_int4_dense_contraction(self):
        from dlmc_quant_tpu.quant.deploy import int4_native_supported
        if not int4_native_supported():
            pytest.skip("backend lacks native int4 dot")
        m = QDense(features=16, scheme=scheme(w_bits=4, a_bits=8))
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(7), (4, 32)))
        v = _setup(m, x)
        assert v["qint"]["w_i4"].dtype == jnp.int4
        y_int = jax.jit(lambda v, x: m.apply(v, x, qmode="int"))(v, x)
        assert _rel(y_int, m.apply(v, x, qmode="eval")) < 3e-2

    def test_native_matches_packed_fallback(self, monkeypatch):
        """Native S4 and nibble-packed paths produce identical ints."""
        from dlmc_quant_tpu.quant import deploy as dp
        if not dp.int4_native_supported():
            pytest.skip("backend lacks native int4 dot")
        m = QConv(features=8, scheme=scheme(w_bits=4, a_bits=8))
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(8),
                                          (2, 8, 8, 4)))
        v_nat = _setup(m, x)
        monkeypatch.setenv("DLMCQ_NATIVE_INT4", "0")
        try:
            v_pk = _setup(m, x)
            assert "w_int4" in v_pk["qint"] and "w_i4" not in v_pk["qint"]
            y_pk = m.apply(v_pk, x, qmode="int")
        finally:
            monkeypatch.delenv("DLMCQ_NATIVE_INT4", raising=False)
            dp.reset_int4_probe()
        y_nat = m.apply(v_nat, x, qmode="int")
        np.testing.assert_allclose(np.asarray(y_nat), np.asarray(y_pk),
                                   rtol=0, atol=1e-5)


class TestS2DStem:
    def test_s2d_conv_exact_vs_general(self):
        """3x3/s2 stem via space-to-depth matches the padded VALID conv
        accumulator bit-for-bit (layers._s2d_conv)."""
        import jax.numpy as jnp
        from dlmc_quant_tpu.quant.layers import _s2d_conv
        x_i8 = jax.random.randint(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                  -128, 128, dtype=jnp.int8)
        w_int = jax.random.randint(jax.random.PRNGKey(1), (3, 3, 3, 48),
                                   -127, 128, dtype=jnp.int8)
        pv = jnp.int8(-5)
        acc = _s2d_conv(x_i8, w_int, pv)
        xp = jnp.pad(x_i8, ((0, 0), (0, 1), (0, 1), (0, 0)),
                     constant_values=pv)
        ref = jax.lax.conv_general_dilated(
            xp, w_int, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref))

    def test_stem_qconv_int_matches_eval(self, monkeypatch):
        """QConv on the stem shape routes through s2d (opt-in flag) and
        stays close to fake-quant eval."""
        from dlmc_quant_tpu.quant import deploy as dp
        monkeypatch.setattr(dp, "USE_S2D_STEM", True)
        m = QConv(features=16, strides=(2, 2),
                  scheme=scheme(w_bits=8, a_bits=8))
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(2),
                                          (2, 16, 16, 3)))
        v = _setup(m, x)
        y_int = m.apply(v, x, qmode="int")
        assert y_int.shape == (2, 8, 8, 16)
        assert _rel(y_int, m.apply(v, x, qmode="eval")) < 3e-2
