"""Parallelism tests on the 8-virtual-device CPU mesh: sharding rules,
data-parallel equivalence, tensor-sharded serving, continuous batching."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlmc_quant_tpu.models import get_model
from dlmc_quant_tpu.parallel.mesh import make_mesh, shard_batch
from dlmc_quant_tpu.parallel.serving import (
    InferenceEngine, measure_throughput,
)
from dlmc_quant_tpu.parallel.sharding_rules import param_pspec, shard_params
from dlmc_quant_tpu.quant.config import scheme_from_dict
from dlmc_quant_tpu.quant.deploy import prepare_deploy
from dlmc_quant_tpu.quant.layers import calibrate


def _w8a8():
    return scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "args": {"n_bits": 8, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
    })


class TestShardingRules:
    def test_pspec_inference(self):
        assert param_pspec(np.zeros((3, 3, 4, 16)), 2) == \
            P(None, None, None, "model")
        assert param_pspec(np.zeros((16,)), 2) == P("model")
        assert param_pspec(np.zeros((3,)), 2) == P()  # not divisible
        assert param_pspec(np.zeros(()), 2) == P()

    def test_shard_params_places(self):
        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        tree = {"k": jnp.ones((3, 3, 4, 16)), "b": jnp.ones((16,))}
        out = shard_params(tree, mesh)
        assert "model" in str(out["k"].sharding.spec)


class TestDataParallelEquivalence:
    def test_sharded_forward_matches_single_device(self):
        mesh = make_mesh(8)
        m = get_model("cifar_resnet20", num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(1), x)
        y_ref = m.apply(v, x)
        xb, = shard_batch((jnp.asarray(x),), mesh)
        y_sh = jax.jit(lambda v, x: m.apply(v, x))(v, xb)
        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                                   rtol=2e-4, atol=1e-5)


class TestTensorShardedInference:
    @pytest.fixture(scope="class")
    def int8_model(self):
        m = get_model("cifar_resnet20", num_classes=10, scheme=_w8a8())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (8, 32, 32, 3)))
        v = m.init(jax.random.PRNGKey(1), x)
        v = calibrate(m, v, [x])
        v = prepare_deploy(m, v, sample_input=x)
        return m, v, x

    def test_model_sharded_int8_matches_replicated(self, int8_model):
        """Sharded and replicated int8 forwards agree up to quantization
        boundary noise: the activation quantize `round(x*a + b)` can land
        on exact ties, and the two compilations may contract the FMA
        differently, flipping single codes.  Assert class decisions and
        logits within a small absolute band instead of fp-equality."""
        m, v, x = int8_model
        y_ref = np.asarray(m.apply(v, x, qmode="int"))
        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        v_sh = shard_params(v, mesh)
        y_sh = np.asarray(
            jax.jit(lambda v, x: m.apply(v, x, qmode="int"))(v_sh, x))
        np.testing.assert_array_equal(y_sh.argmax(-1), y_ref.argmax(-1))
        band = 0.05 * np.abs(y_ref).max() + 1e-4
        np.testing.assert_allclose(y_sh, y_ref, atol=band, rtol=0)


class TestServing:
    def test_engine_forward_pads(self):
        m = get_model("cifar_resnet20", num_classes=10, scheme=_w8a8())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (8, 32, 32, 3)))
        v = m.init(jax.random.PRNGKey(1), x)
        v = calibrate(m, v, [x])
        v = prepare_deploy(m, v, sample_input=x)
        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        eng = InferenceEngine(m, v, mesh, batch_size=8, qmode="int")
        out = eng.forward(np.asarray(x[:5]))
        assert out.shape == (5, 10)

    def test_continuous_batching_resolves_futures(self):
        m = get_model("cifar_resnet20", num_classes=10, scheme=_w8a8())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (8, 32, 32, 3)))
        v = m.init(jax.random.PRNGKey(1), x)
        v = calibrate(m, v, [x])
        v = prepare_deploy(m, v, sample_input=x)
        eng = InferenceEngine(m, v, mesh=None, batch_size=8, qmode="int",
                              max_wait_ms=20)
        eng.warmup((32, 32, 3))
        eng.start()
        try:
            futs = [eng.submit(np.asarray(x[i:i + 2]))
                    for i in range(0, 8, 2)]
            outs = [f.result(timeout=120) for f in futs]
        finally:
            eng.stop()
        assert all(o.shape == (2, 10) for o in outs)
        # batched together, not run one-by-one
        assert eng.stats["batches"] <= 2
        # results must equal the direct forward
        direct = np.asarray(eng.forward(np.asarray(x)))
        np.testing.assert_allclose(np.concatenate(outs), direct[:8],
                                   rtol=1e-4, atol=1e-5)

    def test_throughput_measure_runs(self):
        m = get_model("cifar_resnet20", num_classes=10)
        x = jnp.ones((4, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        eng = InferenceEngine(m, v, mesh=None, batch_size=4, qmode="fp")
        ips = measure_throughput(eng, (32, 32, 3), n_batches=3)
        assert ips > 0

    def test_oversize_and_overflow_requests(self):
        """Requests that exceed the device batch are chunked; a request
        that would overflow the current batch is deferred whole, never
        truncated."""
        m = get_model("cifar_resnet20", num_classes=10, scheme=_w8a8())
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (16, 32, 32, 3)))
        v = m.init(jax.random.PRNGKey(1), x)
        v = calibrate(m, v, [x[:8]])
        v = prepare_deploy(m, v, sample_input=x[:8])
        eng = InferenceEngine(m, v, mesh=None, batch_size=8, qmode="int",
                              max_wait_ms=10)
        eng.warmup((32, 32, 3))
        eng.start()
        try:
            f_big = eng.submit(np.asarray(x[:12]))       # > batch_size
            f_mix = [eng.submit(np.asarray(x[12 + i:12 + i + 2]))
                     for i in range(0, 4, 2)]            # overflow packing
            big = f_big.result(timeout=120)
            mix = [f.result(timeout=120) for f in f_mix]
        finally:
            eng.stop()
        assert big.shape == (12, 10)
        assert all(o.shape == (2, 10) for o in mix)
        direct = np.asarray(eng.forward(np.asarray(x[:8])))
        np.testing.assert_allclose(big[:8], direct, rtol=1e-4, atol=1e-5)

    def test_lockstep_unequal_streams_no_deadlock(self):
        """Lockstep protocol: two engines over the shared 8-device mesh
        fed *unequal* request streams both step unconditionally (empty
        steps padded), resolve every future, and exit at a consensus
        step index — the invariant that keeps multi-host collective
        forwards paired (serving.py module docstring)."""
        m = get_model("cifar_resnet20", num_classes=10)
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (12, 32, 32, 3)))
        v = m.init(jax.random.PRNGKey(1), x)
        mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
        engines = [InferenceEngine(m, v, mesh, batch_size=4, qmode="fp",
                                   lockstep=True, tick_ms=5,
                                   consensus_every=4)
                   for _ in range(2)]
        for e in engines:
            e.warmup((32, 32, 3))
            e.start()
        try:
            # engine 0 gets a heavy stream, engine 1 a single request
            futs0 = [engines[0].submit(np.asarray(x[i:i + 3]))
                     for i in range(0, 9, 3)]
            futs1 = [engines[1].submit(np.asarray(x[:2]))]
            outs0 = [f.result(timeout=120) for f in futs0]
            outs1 = [f.result(timeout=120) for f in futs1]
        finally:
            for e in engines:
                e.stop()
        assert all(o.shape == (3, 10) for o in outs0)
        assert outs1[0].shape == (2, 10)
        for e in engines:
            # consensus exit only happens at multiples of consensus_every
            assert e.steps % e.consensus_every == 0 and e.steps > 0
        # the light engine padded empty steps rather than blocking
        assert engines[1].stats["pad_waste"] > 0
        direct = np.asarray(engines[0].forward(np.asarray(x[:3])))
        np.testing.assert_allclose(outs0[0], direct, rtol=1e-4, atol=1e-5)
