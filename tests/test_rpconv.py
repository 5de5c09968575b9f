"""Interpret-mode correctness tests for the row-major dx-grouped int8
conv kernel (ops/pallas/rpconv.py) — the deploy-path engine for
stride-1 3x3 stacks.  Real-rate measurement lives in
tools/test_rpconv_tpu.py (needs the chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlmc_quant_tpu.ops.pallas.rpconv import (
    from_rm, hwio_to_dxg, int8_conv3x3_rm, rm_geometry, rm_mask, to_rm,
)


def _ref(x_codes, w_int, a, b, relu, zp):
    xp = jnp.pad(x_codes, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=jnp.asarray(zp, jnp.int8))
    acc = jax.lax.conv_general_dilated(
        xp, w_int, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a.reshape(1, 1, 1, -1) \
        + b.reshape(1, 1, 1, -1)
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


def _run(n, h, w, c, o, relu=True, bm=128, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.randint(k1, (n, h, w, c), -128, 128,
                           jnp.int32).astype(jnp.int8)
    wk = jax.random.randint(k2, (3, 3, c, o), -128, 128,
                            jnp.int32).astype(jnp.int8)
    a = jnp.abs(jax.random.normal(k1, (o,))) * 1e-3 + 1e-4
    b = jax.random.normal(k2, (o,)) * 2.0
    zp = -7 if relu else 3
    want = _ref(x, wk, a, b, relu, zp)
    out_rm = int8_conv3x3_rm(
        to_rm(x, zp, bm), hwio_to_dxg(wk), a, b, rm_mask(n, h, w, bm),
        zp, c=c, o=o, wp=w + 1, bm=bm, relu=relu, interpret=True)
    got = from_rm(out_rm, n, h, w, o, bm)
    return np.asarray(got), np.asarray(want), np.asarray(out_rm), zp


class TestLayout:
    def test_roundtrip(self):
        x = jax.random.randint(jax.random.PRNGKey(0), (3, 6, 5, 4),
                               -128, 128, jnp.int32).astype(jnp.int8)
        rt = from_rm(to_rm(x, -3, bm=128), 3, 6, 5, 4, bm=128)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))

    def test_mask_counts_data_rows(self):
        n, h, w = 2, 6, 5
        m = np.asarray(rm_mask(n, h, w, bm=128))
        assert m.sum() == n * h * w
        _, _, _, m_data, M = rm_geometry(n, h, w, 128)
        assert m.shape == (M, 1)


class TestKernel:
    @pytest.mark.parametrize("shape", [
        (2, 14, 14, 8, 16),      # stage3-like (small channels)
        (1, 7, 7, 16, 8),        # odd spatial
        (3, 10, 6, 8, 8),        # non-square
    ])
    def test_matches_reference(self, shape):
        got, want, _, _ = _run(*shape)
        np.testing.assert_array_equal(got, want)

    def test_no_relu(self):
        got, want, _, _ = _run(2, 8, 8, 8, 8, relu=False)
        np.testing.assert_array_equal(got, want)

    def test_pad_rows_hold_output_zero_point(self):
        n, h, w, c, o = 2, 8, 8, 8, 8
        _, _, out_rm, zp = _run(n, h, w, c, o)
        bm = 128
        hp, wp = h + 1, w + 1
        ow = out_rm.shape[1]
        body = out_rm[bm:bm + n * hp * wp].reshape(n, hp, wp, ow)
        assert (body[:, h, :, :o] == zp).all()
        assert (body[:, :, w, :o] == zp).all()
        # guard blocks too (chaining feeds them straight back in)
        assert (out_rm[:bm] == zp).all()

    def test_chains_two_layers(self):
        """Layer-to-layer chaining: rpconv output IS the next layer's
        input layout; a 2-layer chain matches the XLA reference chain."""
        n, h, w, c = 2, 8, 8, 8
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
        x = jax.random.randint(k1, (n, h, w, c), -128, 128,
                               jnp.int32).astype(jnp.int8)
        w1 = jax.random.randint(k2, (3, 3, c, c), -128, 128,
                                jnp.int32).astype(jnp.int8)
        w2 = jax.random.randint(k3, (3, 3, c, c), -128, 128,
                                jnp.int32).astype(jnp.int8)
        a1 = jnp.full((c,), 2e-3)
        b1 = jnp.zeros((c,))
        a2 = jnp.full((c,), 1e-3)
        b2 = jnp.ones((c,))
        zp = -7
        y1 = _ref(x, w1, a1, b1, True, zp)
        want = _ref(y1, w2, a2, b2, True, zp)

        bm = 128
        mask = rm_mask(n, h, w, bm)
        out1 = int8_conv3x3_rm(
            to_rm(x, zp, bm), hwio_to_dxg(w1), a1, b1, mask, zp,
            c=c, o=c, wp=w + 1, bm=bm, interpret=True)
        out2 = int8_conv3x3_rm(
            out1, hwio_to_dxg(w2), a2, b2, mask, zp,
            c=c, o=c, wp=w + 1, bm=bm, interpret=True)
        got = from_rm(out2, n, h, w, c, bm)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
