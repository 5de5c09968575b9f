"""Tests for calibration observers: golden values, convergence, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.ops import observers as obs
from dlmc_quant_tpu.ops.numerics import emulate_quantize, get_qrange


def _quant_sse(x, scale, offset, signed, n_bits):
    qmin, qmax = get_qrange(signed, n_bits)
    return float(jnp.sum((emulate_quantize(x, scale, offset, qmin, qmax) - x) ** 2))


class TestMinMax:
    def test_signed_golden(self):
        x = jnp.array([-2.0, 1.0, 0.5])
        s, o = obs.minmax_tensor(x, 8, True)
        np.testing.assert_allclose(float(s), 2.0 / 127, rtol=1e-6)
        assert float(o) == 0.0

    def test_unsigned_golden(self):
        x = jnp.array([0.5, 1.0, 3.5])
        s, o = obs.minmax_tensor(x, 8, False)
        np.testing.assert_allclose(float(s), 3.0 / 255, rtol=1e-6)
        np.testing.assert_allclose(float(o), 0.5, rtol=1e-6)

    def test_unsigned_no_offset(self):
        x = jnp.array([0.5, 1.0, 3.5])
        s, o = obs.minmax_tensor(x, 8, False, allow_offset=False)
        np.testing.assert_allclose(float(s), 3.5 / 255, rtol=1e-6)
        assert float(o) == 0.0

    def test_channel_shapes(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (16, 3, 3, 3))
        s, o = obs.minmax_channel(w, 8, True, ch_axis=0)
        assert s.shape == (16, 1, 1, 1)
        # each channel scale = absmax of that channel / 127
        expect = np.abs(np.asarray(w)).reshape(16, -1).max(1) / 127
        np.testing.assert_allclose(np.asarray(s).ravel(), expect, rtol=1e-5)

    def test_channel_axis1(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 5, 5))
        s, o = obs.minmax_channel(x, 8, False, ch_axis=1)
        assert s.shape == (1, 8, 1, 1)

    def test_pixel_shapes(self):
        w = jax.random.normal(jax.random.PRNGKey(2), (16, 8, 3, 3))
        s, o = obs.minmax_pixel(w, 8, True)
        assert s.shape == (1, 1, 3, 3)


class TestSearchObservers:
    def test_l2loss_beats_minmax_on_outliers(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4096,))
        x = x.at[0].set(50.0)  # gross outlier
        s_mm, o_mm = obs.minmax_tensor(x, 4, True)
        s_gl, o_gl = obs.l2loss_tensor(x, 4, True)
        assert (_quant_sse(x, s_gl, o_gl, True, 4)
                < _quant_sse(x, s_mm, o_mm, True, 4))

    def test_l2loss_unsigned(self):
        x = jax.random.uniform(jax.random.PRNGKey(3), (2048,)) * 4
        x = x.at[0].set(100.0)
        s, o = obs.l2loss_tensor(x, 8, False)
        s0, o0 = obs.minmax_tensor(x, 8, False)
        assert (_quant_sse(x, s, o, False, 8)
                <= _quant_sse(x, s0, o0, False, 8) * (1 + 1e-5))

    def test_l2norm_improves_or_matches_minmax(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (4096,))
        s_mm, _ = obs.minmax_tensor(x, 4, True)
        s_fp, o = obs.l2norm_tensor(x, 4, True)
        # fixed point should reduce reconstruction error vs plain minmax
        assert (_quant_sse(x, s_fp, o, True, 4)
                <= _quant_sse(x, s_mm, 0.0, True, 4) + 1e-6)

    def test_l2loss_channel_beats_minmax_channel(self):
        key = jax.random.PRNGKey(5)
        w = jax.random.normal(key, (8, 64))
        w = w.at[0, 0].set(30.0)
        s_mm, o_mm = obs.minmax_channel(w, 4, True)
        s_gl, o_gl = obs.l2loss_channel(w, 4, True)
        assert (_quant_sse(w, s_gl, o_gl, True, 4)
                < _quant_sse(w, s_mm, o_mm, True, 4))

    def test_l2norm_channel_shapes_and_quality(self):
        w = jax.random.normal(jax.random.PRNGKey(6), (12, 3, 3, 3))
        s, o = obs.l2norm_channel(w, 4, True)
        assert s.shape == (12, 1, 1, 1)
        s_mm, o_mm = obs.minmax_channel(w, 4, True)
        assert (_quant_sse(w, s, o, True, 4)
                <= _quant_sse(w, s_mm, o_mm, True, 4) + 1e-6)

    def test_l2norm_pixel(self):
        w = jax.random.normal(jax.random.PRNGKey(7), (16, 8, 3, 3))
        s, o = obs.l2norm_pixel(w, 4, True)
        assert s.shape == (1, 1, 3, 3)
        assert np.all(np.asarray(s) > 0)

    def test_percentile_clips_outlier(self):
        x = jax.random.normal(jax.random.PRNGKey(8), (10000,))
        x = x.at[0].set(1000.0)
        s_p, _ = obs.percentile_tensor(x, 8, True, pct=99.9)
        s_mm, _ = obs.minmax_tensor(x, 8, True)
        assert float(s_p) < float(s_mm) / 10


class TestOutputObservers:
    def _forward(self, x, w):
        return x @ w.T  # dense: (B, I) @ (O, I).T

    def test_l2norm_output_quality(self):
        key = jax.random.PRNGKey(9)
        x = jax.random.normal(key, (32, 64))
        w = jax.random.normal(jax.random.PRNGKey(10), (16, 64))
        s, o = obs.l2norm_output(x, w, self._forward, 4, True)
        out = self._forward(x, w)

        def out_err(scale):
            qmin, qmax = get_qrange(True, 4)
            wq = emulate_quantize(w, scale, 0.0, qmin, qmax)
            return float(jnp.sum((self._forward(x, wq) - out) ** 2))

        s_mm, _ = obs.minmax_tensor(w, 4, True)
        assert out_err(s) <= out_err(s_mm) * 1.05

    def test_l2norm_output_channel(self):
        x = jax.random.normal(jax.random.PRNGKey(11), (32, 64))
        w = jax.random.normal(jax.random.PRNGKey(12), (16, 64))
        s, o = obs.l2norm_output_channel(x, w, self._forward, 4, True)
        assert s.shape == (16, 1)
        out = self._forward(x, w)
        qmin, qmax = get_qrange(True, 4)
        wq = emulate_quantize(w, s, o, qmin, qmax)
        s_mm, o_mm = obs.minmax_channel(w, 4, True)
        w_mm = emulate_quantize(w, s_mm, o_mm, qmin, qmax)
        err = float(jnp.sum((self._forward(x, wq) - out) ** 2))
        err_mm = float(jnp.sum((self._forward(x, w_mm) - out) ** 2))
        assert err <= err_mm * 1.05


class TestDispatch:
    def test_registry_grammar(self):
        x = jax.random.normal(jax.random.PRNGKey(13), (8, 8))
        s, o = obs.get_qparams_tensor(x, "minmax_tensor", n_bits=8, signed=True)
        assert s.shape == ()

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="unknown observer"):
            obs.get_qparams_tensor(jnp.ones(3), "bogus", n_bits=8, signed=True)

    def test_is_output_observer(self):
        assert obs.is_output_observer("l2norm_output")
        assert obs.is_output_observer("l2norm_output_channel")
        assert not obs.is_output_observer("minmax_tensor")


class TestStreaming:
    def test_multibatch_minmax_equals_full(self):
        key = jax.random.PRNGKey(14)
        batches = jax.random.normal(key, (5, 16, 8))
        st = obs.streaming_init(())
        for b in batches:
            st = obs.streaming_update(st, b)
        s, o = obs.streaming_finalize(st, "minmax_tensor", 8, True)
        s_full, _ = obs.minmax_tensor(batches.reshape(-1, 8), 8, True)
        np.testing.assert_allclose(float(s), float(s_full), rtol=1e-6)

    def test_streaming_in_scan(self):
        batches = jax.random.normal(jax.random.PRNGKey(15), (4, 8, 8))

        def step(st, b):
            return obs.streaming_update(st, b), None

        st, _ = jax.lax.scan(step, obs.streaming_init(()), batches)
        s, o = obs.streaming_finalize(st, "minmax_tensor", 8, False)
        assert float(s) > 0

    def test_per_channel_streaming(self):
        batches = jax.random.normal(jax.random.PRNGKey(16), (3, 4, 6, 5, 5))
        st = obs.streaming_init((6,))
        for b in batches:
            st = obs.streaming_update(st, b, ch_axis=1)
        s, o = obs.streaming_finalize(st, "minmax_channel", 8, True)
        assert s.shape == (6,)


class TestJit:
    def test_observers_jit(self):
        x = jax.random.normal(jax.random.PRNGKey(17), (64, 32))

        @jax.jit
        def f(x):
            s1, _ = obs.minmax_tensor(x, 8, True)
            s2, _ = obs.l2loss_tensor(x, 8, True)
            s3, _ = obs.l2norm_tensor(x, 8, True)
            return s1 + s2 + s3

        assert np.isfinite(float(f(x)))
