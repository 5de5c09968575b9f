"""Golden-value tests for the quantization numerics core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.ops import numerics as nm
from dlmc_quant_tpu.ops import rootq_math as rq


class TestQRange:
    def test_signed_symmetric(self):
        assert nm.get_qrange(True, 8) == (-127, 127)
        assert nm.get_qrange(True, 4) == (-7, 7)
        assert nm.get_qrange(True, 2) == (-1, 1)

    def test_unsigned(self):
        assert nm.get_qrange(False, 8) == (0, 255)
        assert nm.get_qrange(False, 4) == (0, 15)


class TestAffine:
    def test_quantize_golden(self):
        x = jnp.array([-1.0, -0.5, 0.0, 0.26, 1.0, 10.0])
        q = nm.quantize(x, scale=0.5, offset=0.0, qmin=-7, qmax=7)
        np.testing.assert_array_equal(np.asarray(q), [-2, -1, 0, 1, 2, 7])

    def test_roundtrip_exact_on_grid(self):
        scale, offset = 0.25, 0.1
        grid = jnp.arange(-7, 8) * scale + offset
        out = nm.emulate_quantize(grid, scale, offset, -7, 7)
        np.testing.assert_allclose(np.asarray(out), np.asarray(grid), atol=1e-6)

    def test_emulate_error_bound(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1024,))
        scale = 3.0 / 127
        out = nm.emulate_quantize(x, scale, 0.0, -127, 127)
        err = jnp.abs(out - jnp.clip(x, -127 * scale, 127 * scale))
        assert float(jnp.max(err)) <= scale / 2 + 1e-6


class TestSTE:
    def test_round_pass_value_and_grad(self):
        x = jnp.array([0.4, 0.6, -1.2])
        np.testing.assert_array_equal(np.asarray(nm.round_pass(x)), [0.0, 1.0, -1.0])
        g = jax.grad(lambda v: jnp.sum(nm.round_pass(v)))(x)
        np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 1.0])

    def test_floor_pass(self):
        x = jnp.array([0.9, -0.1])
        np.testing.assert_array_equal(np.asarray(nm.floor_pass(x)), [0.0, -1.0])
        g = jax.grad(lambda v: jnp.sum(nm.floor_pass(v)))(x)
        np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0])

    def test_grad_scale(self):
        x = jnp.array(2.0)
        assert float(nm.grad_scale(x, 0.125)) == 2.0
        assert float(jax.grad(lambda v: nm.grad_scale(v, 0.125))(x)) == 0.125


class TestLSQ:
    def test_fake_quant_forward(self):
        x = jnp.array([-2.0, -0.26, 0.0, 0.26, 2.0])
        out = nm.lsq_fake_quant(x, scale=0.5, offset=0.0, qmin=-3, qmax=3,
                                g=1.0)
        np.testing.assert_allclose(np.asarray(out), [-1.5, -0.5, 0.0, 0.5, 1.5])

    def test_autodiff_matches_explicit_lsq_backward(self):
        """The inline STE composition must reproduce FunLSQ's hand gradient."""
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (64,))
        scale = jnp.array(0.1)
        qmin, qmax, g = -7, 7, 0.05

        def inline(x, s):
            return jnp.sum(nm.lsq_fake_quant(x, s, 0.0, qmin, qmax, g) ** 2)

        def explicit(x, s):
            return jnp.sum(nm.lsq_q(x, s, qmin, qmax, g) ** 2)

        gx1, gs1 = jax.grad(inline, argnums=(0, 1))(x, scale)
        gx2, gs2 = jax.grad(explicit, argnums=(0, 1))(x, scale)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-5)
        np.testing.assert_allclose(float(gs1), float(gs2), rtol=1e-4)

    def test_uniform_q_clip_aware_grad(self):
        x = jnp.array([-10.0, 0.2, 10.0])
        g = jax.grad(
            lambda v: jnp.sum(nm.uniform_q(v, jnp.array(0.5), jnp.array(0.0),
                                           -7, 7)))(x)
        np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0, 0.0])

    def test_init_scale(self):
        x = jnp.ones((4, 4))
        s = nm.lsq_init_scale(x, qmax=4)
        np.testing.assert_allclose(float(s), 1.0)


class TestRootQ:
    def test_clipping_values_and_bound_grads(self):
        x = jnp.array([-3.0, 0.0, 3.0])
        out = rq.clipping(x, 1.0, -1.0)
        np.testing.assert_array_equal(np.asarray(out), [-1.0, 0.0, 1.0])
        gu = jax.grad(lambda u: jnp.sum(rq.clipping(x, u, -1.0)))(jnp.array(1.0))
        gl = jax.grad(lambda l: jnp.sum(rq.clipping(x, 1.0, l)))(jnp.array(-1.0))
        assert float(gu) == 1.0  # one element clipped at the top
        assert float(gl) == 1.0  # one element clipped at the bottom

    def test_phi_sign_and_range(self):
        delta = 0.5
        mi = jnp.array(0.0)
        x = jnp.array([-0.2, -0.01, 0.01, 0.2])
        y = rq.phi(x, mi, jnp.array(0.5), delta)
        assert np.all(np.sign(np.asarray(y)) == [-1, -1, 1, 1])
        # |phi| ~ (2/delta |d|)^alpha <= ~1 at the bin edge
        assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-2

    def test_sgn_identity_grad(self):
        x = jnp.array([-0.3, 0.4])
        np.testing.assert_array_equal(np.asarray(rq.sgn(x)), [-1.0, 1.0])
        g = jax.grad(lambda v: jnp.sum(rq.sgn(v)))(x)
        np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0])

    def test_weight_fake_quant_lands_on_grid(self):
        key = jax.random.PRNGKey(2)
        w = jax.random.normal(key, (256,))
        upper, lower = jnp.array(1.0), jnp.array(-1.0)
        qmin, qmax = nm.get_qrange(True, 4)
        wq = rq.rootq_weight_fake_quant(w, upper, lower, jnp.array(0.25),
                                        qmin, qmax)
        delta = (1.0 - (-1.0)) / (qmax - qmin)
        # every output must sit on a bin edge: (w - lower)/delta integral
        k = np.asarray((wq - lower) / delta)
        np.testing.assert_allclose(k, np.round(k), atol=1e-4)
        assert float(jnp.max(wq)) <= 1.0 + 1e-5
        assert float(jnp.min(wq)) >= -1.0 - 1e-5

    def test_weight_fake_quant_rounds_to_nearest_edge_mostly(self):
        # phi+sgn should agree with nearest-rounding for points away from
        # bin midpoints
        lower, upper = -1.0, 1.0
        qmin, qmax = -7, 7
        delta = (upper - lower) / (qmax - qmin)
        w = jnp.array([lower + 0.1 * delta, lower + 0.9 * delta,
                       lower + 3.2 * delta])
        wq = rq.rootq_weight_fake_quant(w, jnp.array(upper), jnp.array(lower),
                                        jnp.array(0.25), qmin, qmax)
        expect = lower + delta * np.array([0.0, 1.0, 3.0])
        np.testing.assert_allclose(np.asarray(wq), expect, atol=1e-4)

    def test_act_fake_quant(self):
        x = jnp.array([-1.0, 0.3, 5.0])
        out = rq.rootq_act_fake_quant(x, scale=0.5, qmax=3)
        np.testing.assert_allclose(np.asarray(out), [0.0, 0.5, 1.5])

    def test_alpha_receives_gradient(self):
        key = jax.random.PRNGKey(3)
        w = jax.random.normal(key, (64,))

        def loss(alpha):
            wq = rq.rootq_weight_fake_quant(w, jnp.array(1.0), jnp.array(-1.0),
                                            alpha, -7, 7)
            return jnp.sum(wq ** 2)

        g = jax.grad(loss)(jnp.array(0.25))
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestJitCompat:
    def test_everything_jits(self):
        @jax.jit
        def f(x, s):
            a = nm.lsq_fake_quant(x, s, 0.0, -127, 127, 0.01)
            b = rq.rootq_weight_fake_quant(x, jnp.array(1.0), jnp.array(-1.0),
                                           jnp.array(0.25), -7, 7)
            return a + b

        out = f(jnp.ones((8, 8)), jnp.array(0.1))
        assert out.shape == (8, 8)
