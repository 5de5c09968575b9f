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
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DeferredEpilogue:
    """Lazy layer output: real value = ``relu?(acc·scale + bias)``."""
    acc: jnp.ndarray                     # int32 accumulator
    scale: jnp.ndarray                   # per-channel f32 (broadcastable)
    bias: jnp.ndarray                    # per-channel f32 (broadcastable)
    relu: bool = struct.field(pytree_node=False, default=False)

    @property
    def shape(self):
        return self.acc.shape

    @property
    def ndim(self):
        return self.acc.ndim


def qrelu(x):
    """ReLU that stays lazy on a :class:`DeferredEpilogue`."""
    if isinstance(x, DeferredEpilogue):
        return x.replace(relu=True)
    return jax.nn.relu(x)


def materialize(x) -> jnp.ndarray:
    """Close a chain: f32 value of a deferred output (no-op on arrays)."""
    if not isinstance(x, DeferredEpilogue):
        return x
    y = x.acc.astype(jnp.float32) * x.scale + x.bias
    return jnp.maximum(y, 0.0) if x.relu else y


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
    q = jnp.clip(jnp.round(x.acc.astype(jnp.float32) * a + b), lo, qmax_s)
    return q.astype(jnp.int8)
