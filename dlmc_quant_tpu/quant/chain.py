"""Chained int8-resident deploy execution (qmode='intc').

In plain ``qmode='int'`` every layer boundary runs

    y   = acc·ps + pb            (producer f32 epilogue, per-channel)
    y   = max(y, 0)              (model-level ReLU)
    q   = clip(round(y·inv + qb), lo, hi)    (consumer act quantize)

— XLA fuses all of it into one kernel, but executes every op: ~9 VPU
ops per output value.  On the VPU-bound early layers (stem, stage1) that
epilogue chain, not the MXU, is the cost floor (fence-corrected
prefix timing: batch-512 RepVGG-A0 stem = 1.56 ms ≈ the VPU epilogue
floor for its 308M output values).

This module folds the boundary algebraically before XLA ever sees it:

    q = clip(round(acc·A + B), L, hi)
    A = ps·inv        B = pb·inv + qb
    L = clip(round(qb), lo, hi)   if the boundary has a ReLU, else lo

The ReLU disappears into the clamp's lower bound: for y <= 0 the
argument is exactly ``qb``, so clamping at ``round(qb)`` — which equals
the consumer's zero-point pad code — reproduces ``relu`` bit-for-bit up
to the same fp-reassociation ±1-code boundary cases as the existing
single-FMA ``act_to_int8`` fast path (quant/deploy.py:act_to_int8).
6 VPU ops per value instead of ~9, and the activation crosses HBM once
as int8 codes instead of twice (f32 out + i8 in).

Mechanically: in ``qmode='intc'`` a quantized layer returns a
:class:`DeferredEpilogue` (raw int32 accumulator + its affine) instead
of f32; :func:`qrelu` marks the pending ReLU; the *consumer* layer—the
only one that knows its input grid—materializes int8 codes with the
folded clamp.  Sequential deploy stacks (RepVGG, MobileOne) thread it;
:func:`materialize` closes the chain before non-quantized ops (GAP,
losses).  The reference has no analogue: its deploy path is fp32
emulation end-to-end (ref: dlmc/quantization/scalar/modules/base.py:96-140).

Residual boundaries (ResNet blocks) chain through
:class:`QuantizedTensor`: the block's output quantizer
(``quant.layers.QBlockOutput``) folds *trunk epilogue + shortcut +
ReLU + quantize* into one fused clamp producing int8 codes on the
block's own calibrated grid (value ≈ ``q·scale + bias``).  Both
consumers of a block output — the next block's first conv and its
shortcut path — read those codes straight from HBM (1 byte/value
instead of 4), and a consumer conv adapts its epilogue to the incoming
grid via the stored column-sums (see ``_int_conv``), so no
requantization pass ever runs.  This is the standard fully-int8
residual-net deployment the reference's fp32 emulation never needs
(ref: model/classification/cifarresnet.py BasicBlock forward).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DeferredEpilogue:
    """Lazy layer output: real value = ``relu?(acc·scale + bias)``,
    optionally upper-clamped at ``clamp_hi`` (ReLU6 nets)."""
    acc: jnp.ndarray                     # int32 accumulator
    scale: jnp.ndarray                   # per-channel f32 (broadcastable)
    bias: jnp.ndarray                    # per-channel f32 (broadcastable)
    relu: bool = struct.field(pytree_node=False, default=False)
    clamp_hi: Optional[float] = struct.field(pytree_node=False, default=None)

    @property
    def shape(self):
        return self.acc.shape

    @property
    def ndim(self):
        return self.acc.ndim


@struct.dataclass
class QuantizedTensor:
    """int8 codes on a per-tensor affine grid: real ≈ ``q·scale + bias``.

    Produced at residual-block boundaries by ``QBlockOutput`` in
    ``qmode='intc'``; consumed directly by quantized convs/denses
    (grid-adapted epilogue) and by residual adds (one FMA per value).
    """
    q: jnp.ndarray                       # int8 codes
    scale: jnp.ndarray                   # f32 scalar
    bias: jnp.ndarray                    # f32 scalar

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def zero_code(self):
        """int8 code whose real value is (closest to) 0 — the pad code."""
        return jnp.clip(jnp.round(-self.bias / self.scale),
                        -128, 127).astype(jnp.int8)


def qrelu(x):
    """ReLU that stays lazy on a :class:`DeferredEpilogue`."""
    if isinstance(x, DeferredEpilogue):
        return x.replace(relu=True)
    if isinstance(x, QuantizedTensor):
        # block-boundary codes are already post-ReLU (clamped at the
        # zero code); a further ReLU clamps there again
        return x.replace(q=jnp.maximum(x.q, x.zero_code()))
    return jax.nn.relu(x)


def qrelu6(x):
    """ReLU6 (``min(max(x, 0), 6)``) that stays lazy on the chain.

    On a :class:`DeferredEpilogue` the upper clamp folds into the
    consumer's quantize (rounding is monotone, so
    ``round(min(v, 6)·a + b) = min(round(v·a + b), round(6·a + b))``
    for a > 0 — see :func:`fold_quantize`); on codes it clamps at the
    grid code of 6.
    """
    if isinstance(x, DeferredEpilogue):
        return x.replace(relu=True, clamp_hi=6.0)
    if isinstance(x, QuantizedTensor):
        hi = jnp.clip(jnp.round((6.0 - x.bias) / x.scale),
                      -128, 127).astype(jnp.int8)
        return x.replace(q=jnp.clip(x.q, x.zero_code(), hi))
    return jnp.minimum(jax.nn.relu(x), 6.0)


def qmaxpool(x, window, strides, padding):
    """``nn.max_pool`` that stays lazy on the chain.

    Max-pooling is per-channel spatial; the epilogue affine is monotone
    increasing per channel (scale > 0), and ReLU/clamp are monotone too,
    so ``maxpool(epilogue(acc)) == epilogue(maxpool(acc))`` — pool the
    int32 accumulator (or int8 codes) and keep the boundary foldable.
    Pad contributions: flax pads with -inf; on integer accumulators use
    the dtype min, which loses to any real window element the same way.
    """
    import flax.linen as nn

    if isinstance(x, DeferredEpilogue):
        acc = nn.pooling.pool(x.acc, jnp.iinfo(x.acc.dtype).min,
                              jax.lax.max, window, strides, padding)
        return x.replace(acc=acc)
    if isinstance(x, QuantizedTensor):
        q = nn.pooling.pool(x.q, jnp.int8(-128), jax.lax.max, window,
                            strides, padding)
        return x.replace(q=q)
    return nn.max_pool(x, window, strides=strides, padding=padding)


def materialize(x) -> jnp.ndarray:
    """Close a chain: f32 value of a deferred output (no-op on arrays)."""
    if isinstance(x, QuantizedTensor):
        return x.q.astype(jnp.float32) * x.scale + x.bias
    if not isinstance(x, DeferredEpilogue):
        return x
    y = x.acc.astype(jnp.float32) * x.scale + x.bias
    if x.relu:
        y = jnp.maximum(y, 0.0)
    if x.clamp_hi is not None:
        y = jnp.minimum(y, x.clamp_hi)
    return y


def fold_quantize(x: DeferredEpilogue, inv_s, qbias, qmin_s: int,
                  qmax_s: int) -> jnp.ndarray:
    """Folded boundary: int8 codes of ``x`` on the consumer's grid.

    ``inv_s``/``qbias`` are the consumer plan's ``in_inv_scale`` /
    ``in_qbias``; ``qmin_s``/``qmax_s`` its shifted int8 code range.
    """
    a = x.scale * inv_s
    b = x.bias * inv_s + qbias
    lo = qmin_s
    if x.relu:
        lo = jnp.clip(jnp.round(qbias), qmin_s, qmax_s)
    hi = qmax_s
    if x.clamp_hi is not None:
        # upper clamp (ReLU6): rounding is monotone, so clamping the
        # *codes* at round(clamp_hi·inv + qbias) equals clamping the
        # values first (inv_s > 0)
        hi = jnp.clip(jnp.round(x.clamp_hi * inv_s + qbias),
                      qmin_s, qmax_s)
    q = jnp.clip(jnp.round(x.acc.astype(jnp.float32) * a + b), lo, hi)
    return q.astype(jnp.int8)


def fold_sum_quantize(terms, inv_s, qbias, lo, qmax_s: int) -> jnp.ndarray:
    """Residual boundary: int8 codes of ``relu(Σ terms)`` on a grid.

    Each term is a :class:`DeferredEpilogue`, :class:`QuantizedTensor`
    or plain f32 array; their sum is scaled onto the grid given by
    ``inv_s``/``qbias`` (the block-output plan's ``1/s`` and
    ``-o/s - shift``) in one fused FMA chain:

        q = clip(round(Σᵢ vᵢ·inv + qbias), lo, qmax_s)

    with each ``vᵢ·inv`` folded into the term's own affine so no term is
    ever materialized at f32 precision in HBM.  The ReLU lives in ``lo``
    (the code for real 0), exactly as in :func:`fold_quantize`.  A
    *relu-flagged* DeferredEpilogue term is nonlinear inside a sum and
    is materialized first (occurs only for the stem→first-block
    shortcut).
    """
    total = jnp.float32(qbias)
    for t in terms:
        if isinstance(t, DeferredEpilogue):
            if t.relu or t.clamp_hi is not None:
                total = total + materialize(t) * inv_s
            else:
                total = (total + t.acc.astype(jnp.float32) * (t.scale * inv_s)
                         + t.bias * inv_s)
        elif isinstance(t, QuantizedTensor):
            total = (total + t.q.astype(jnp.float32) * (t.scale * inv_s)
                     + t.bias * inv_s)
        else:
            total = total + t * inv_s
    q = jnp.clip(jnp.round(total), lo, qmax_s)
    return q.astype(jnp.int8)
