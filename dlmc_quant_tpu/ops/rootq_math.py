"""RootQ root-base estimator math (pure jnp).

RootQ replaces the STE with a power-function surrogate
``phi(x) = (2/delta * |x - mi| + eps)^alpha * sgn(x - mi)`` whose gradient
is sharp near quantization-bin midpoints and flat near bin edges, with a
learnable root exponent ``alpha``.  A binarizing ``sgn`` (identity
gradient) then decides round-down vs round-up within the bin.

Everything here is differentiable jnp; the composition gives exactly the
surrogate gradients the reference implements with torch autograd.

Parity targets:
  ref: dlmc/quantization/scalar/RootQ/function.py:5-67
  ref: dlmc/quantization/scalar/RootQ/base.py:108-155  (composition order)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dlmc_quant_tpu.ops.numerics import floor_pass, round_pass


def clipping(x, upper, lower):
    """Differentiable clip to ``[lower, upper]`` via two ReLUs.

    Unlike ``jnp.clip`` with stop-gradients, gradients flow to ``upper``
    and ``lower`` wherever the bound is active (PACT-style learned clip).
    ref: RootQ/function.py:15-20
    """
    x = x + jax.nn.relu(lower - x)
    x = x - jax.nn.relu(x - upper)
    return x


def clamp_alpha(alpha):
    """Clamp the root exponent to ``[1e-4, 1]`` with ReLUs (gradient flows
    at the boundary like a hinge).  ref: RootQ/function.py:25-26"""
    alpha = alpha + jax.nn.relu(1e-4 - alpha)
    alpha = alpha - jax.nn.relu(alpha - 1.0)
    return alpha


def phi(x, mi, alpha, delta, eps: float = 1e-5):
    """Root-base surrogate ``(2/delta * |x-mi| + eps)^alpha * sgn(x-mi)``.

    ``mi`` is the midpoint of x's quantization bin (stop-gradiented by the
    caller); ``alpha`` is the learnable root exponent.  The smooth sign is
    ``(x-mi)/(|x-mi| + eps)``.  ref: RootQ/function.py:22-32
    """
    alpha = clamp_alpha(alpha)
    d = x - mi
    smooth_sgn = d / (jnp.abs(d) + eps)
    k = 2.0 / delta
    return jnp.power(k * jnp.abs(d) + eps, alpha) * smooth_sgn


def sgn(x):
    """Hard sign (±1) forward, identity gradient.

    ref: RootQ/function.py:5-12,58-61 (RoundWithGradient)
    """
    return x + jax.lax.stop_gradient(jnp.sign(x) - x)


def bin_dequantize(s, lower, delta, interval):
    """Map the ±1 bin decision back to a real value.

    ``((s+1)/2 + interval) * delta + lower`` — ``s=-1`` lands on the bin's
    lower edge, ``s=+1`` on the upper edge.  ref: RootQ/function.py:63-67
    """
    return ((s + 1.0) / 2.0 + interval) * delta + lower


def rootq_weight_fake_quant(w, upper, lower, alpha, qmin, qmax):
    """Full RootQ weight quantization path.

    clip → bin index (floor STE) → bin midpoint → phi surrogate → hard sign
    (identity grad) → dequantize.  ``upper``/``lower`` are the (EMA-blended,
    gradient-scaled) clip bounds; gradients reach them through ``clipping``
    and through ``delta``.  ref: RootQ/base.py:146-155
    """
    w_c = clipping(w, upper, lower)
    delta = (upper - lower) / float(qmax - qmin)
    interval = floor_pass((w_c - lower) / delta)
    mi = (interval + 0.5) * delta + lower
    s = sgn(phi(w_c, jax.lax.stop_gradient(mi), alpha, delta))
    return bin_dequantize(s, lower, delta, interval)


def rootq_act_fake_quant(x, scale, qmax, qmin=0):
    """RootQ activation quantization: differentiable clip to
    ``[0, scale*(qmax-qmin)]`` then round-STE on the integer grid.

    ref: RootQ/base.py:108-111
    """
    upper = scale * float(qmax - qmin)
    x_c = clipping(x, upper, 0.0)
    return round_pass(x_c / scale) * scale
