"""Affine quantization numerics and straight-through estimators.

Pure-jnp building blocks for fake quantization.  All functions are
jit/vmap/grad-compatible and shape-polymorphic; they form the bottom layer
of the framework (observers and quantized layers sit above).

Behavioral parity targets (reference, for capability checking only):
  ref: dlmc/quantization/scalar/utils.py:1-44   (quantize/dequantize/
       emulate_quantize/get_qrange, round_pass/floor_pass, grad_scale)
  ref: dlmc/quantization/scalar/modules/function.py:9-71
       (FunUniformQ / FunLSQ custom-gradient semantics)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quantization ranges
# ---------------------------------------------------------------------------

def get_qrange(signed: bool, n_bits: int) -> Tuple[int, int]:
    """Integer grid for an ``n_bits`` quantizer.

    Signed quantizers use the *symmetric* grid ``[-(2^{b-1}-1), 2^{b-1}-1]``
    (no ``-2^{b-1}``, matching the reference's symmetric convention);
    unsigned use ``[0, 2^b - 1]``.  ref: scalar/utils.py:14-22
    """
    if signed:
        qmax = 2 ** (n_bits - 1) - 1
        return -qmax, qmax
    return 0, 2 ** n_bits - 1


# ---------------------------------------------------------------------------
# Affine quantize / dequantize (no gradient tricks — plain math)
# ---------------------------------------------------------------------------

def quantize(x, scale, offset, qmin, qmax):
    """``q = clamp(round((x - offset)/scale), qmin, qmax)`` (float-valued).

    ref: scalar/utils.py:1-6
    """
    return jnp.clip(jnp.round((x - offset) / scale), qmin, qmax)


def dequantize(q, scale, offset):
    """``x = q * scale + offset``.  ref: scalar/utils.py:8-9"""
    return q * scale + offset


def emulate_quantize(x, scale, offset, qmin, qmax):
    """Quantize-dequantize round trip (fake quantization).

    ref: scalar/utils.py:11-12
    """
    return dequantize(quantize(x, scale, offset, qmin, qmax), scale, offset)


# ---------------------------------------------------------------------------
# Straight-through estimators
# ---------------------------------------------------------------------------

def round_pass(x):
    """Round forward, identity gradient (STE).  ref: scalar/utils.py:29-32"""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_pass(x):
    """Floor forward, identity gradient (STE).  ref: scalar/utils.py:34-37"""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def grad_scale(x, g):
    """Identity forward; gradient scaled by ``g`` (LSQ trick).

    ``value = x`` but ``d/dx = g``.  ref: scalar/utils.py:24-27
    """
    return x * g + jax.lax.stop_gradient(x - x * g)


# ---------------------------------------------------------------------------
# Fused fake-quant forward used by the LSQ-style quantized layers
# ---------------------------------------------------------------------------

def lsq_fake_quant(x, scale, offset, qmin, qmax, g):
    """LSQ fake quantization with gradient-scaled learnable step size.

    Exactly the steady-state forward of the reference's ``QBase``:
    ``s = grad_scale(scale, g)``; ``round_pass(clip((x-offset)/s)) * s + off``
    (clamp applied *before* the STE round, as in the reference).
    ref: scalar/modules/base.py:96-102,131-133
    """
    s = grad_scale(scale, g)
    q = round_pass(jnp.clip((x - offset) / s, qmin, qmax))
    return q * s + offset


def lsq_grad_factor(numel: int, qmax: int):
    """LSQ gradient scale ``1/sqrt(numel * qmax)``.

    ref: scalar/modules/base.py:97,132
    """
    return 1.0 / jnp.sqrt(float(numel) * float(max(qmax, 1)))


def lsq_init_scale(x, qmax: int, axis=None):
    """LSQ scale initialization ``2 * mean|x| / sqrt(qmax)``.

    ``axis=None`` → per-tensor scalar; otherwise mean over ``axis`` for
    per-channel init.  ref: scalar/modules/base.py:82-94,118-121
    """
    m = jnp.mean(jnp.abs(x)) if axis is None else jnp.mean(jnp.abs(x), axis=axis)
    return 2.0 * m / jnp.sqrt(float(max(qmax, 1)))


# ---------------------------------------------------------------------------
# Explicit custom-gradient estimators.
#
# The LSQ layers above get the right gradients from plain autodiff of the
# STE composition; these custom_vjp variants exist to pin down (and test)
# the exact gradient semantics the reference encodes in autograd.Functions.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def uniform_q(x, scale, offset, qmin, qmax):
    """Clip-aware STE fake quant: zero gradient outside the clip range.

    Forward = ``emulate_quantize``; backward passes the incoming gradient
    through only where ``qmin <= (x-offset)/scale <= qmax``; ``scale`` and
    ``offset`` receive no gradient.  ref: scalar/modules/function.py:9-23
    """
    return emulate_quantize(x, scale, offset, qmin, qmax)


def _uniform_q_fwd(x, scale, offset, qmin, qmax):
    t = (x - offset) / scale
    mask = (t >= qmin) & (t <= qmax)
    return emulate_quantize(x, scale, offset, qmin, qmax), mask


def _uniform_q_bwd(qmin, qmax, mask, g):
    return (jnp.where(mask, g, 0.0), jnp.zeros(()), jnp.zeros(()))


uniform_q.defvjp(_uniform_q_fwd, _uniform_q_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def lsq_q(x, scale, qmin, qmax, g):
    """Per-tensor LSQ with the reference's explicit backward.

    Forward: symmetric fake quant ``clamp(round(x/s)) * s``.
    Backward: ``dx = dy`` inside the clip range, 0 outside;
    ``ds = sum(dy * r) * g`` where ``r = -t + round(t)`` inside the range,
    ``qmin``/``qmax`` at the clipped ends.
    ref: scalar/modules/function.py:26-46
    """
    t = x / scale
    return jnp.clip(jnp.round(t), qmin, qmax) * scale


def _lsq_q_fwd(x, scale, qmin, qmax, g):
    return lsq_q(x, scale, qmin, qmax, g), (x, scale)


def _lsq_q_bwd(qmin, qmax, g, res, dy):
    x, scale = res
    t = x / scale
    inside = (t >= qmin) & (t <= qmax)
    r = jnp.where(t < qmin, float(qmin),
                  jnp.where(t > qmax, float(qmax), jnp.round(t) - t))
    dx = jnp.where(inside, dy, 0.0)
    ds = jnp.sum(dy * r) * g
    return dx, jnp.reshape(ds, jnp.shape(scale))


lsq_q.defvjp(_lsq_q_fwd, _lsq_q_bwd)


# ---------------------------------------------------------------------------
# Granularity helpers
# ---------------------------------------------------------------------------

def channel_param_shape(ndim: int, ch_axis: int) -> Tuple[int, ...]:
    """Broadcastable shape with size kept on ``ch_axis`` only (placeholder 1s).

    Used to reshape per-channel scales so they broadcast against the full
    tensor; mirrors the reference's ``_process_channel`` reshape.
    ref: scalar/ops.py:112-118
    """
    return tuple(-1 if d == ch_axis else 1 for d in range(ndim))


def reduce_axes_except(ndim: int, keep_axis: int) -> Tuple[int, ...]:
    """All axes except ``keep_axis`` — the reduction set for per-channel stats."""
    return tuple(d for d in range(ndim) if d != keep_axis)
