"""PTQ calibration observers.

Each observer maps a tensor (weights, or a cached batch of activations) to
quantization parameters ``(scale, offset)``.  All are pure jnp functions:
Python ``for``/``while`` loops of the reference are re-expressed as
``lax.scan`` (grid searches) and ``lax.while_loop`` (fixed-point
iterations) so the whole calibration pass jits and runs on TPU.

Granularities (encoded in the observer name, same grammar as the
reference's YAML ``type`` strings):
  * ``*_tensor``  — one (scale, offset) per tensor
  * ``*_channel`` — per channel along ``ch_axis`` (0 for weights,
    1/feature axis for activations), returned broadcast-shaped
  * ``*_pixel``   — per spatial position of a conv weight
  * ``*_output``  — scale chosen to minimize the layer *output* error,
    driving the layer's forward function inside the iteration

Parity target: ref: dlmc/quantization/scalar/ops.py:11-292.  Deviations
(deliberate fixes, flagged inline): the reference's ``l2loss_*`` return an
*integer zero-point* as "offset" but apply it through the float-offset
formula (ops.py:58-66); we keep one consistent affine convention.  The
reference's ``l2norm_pixel`` best-tracking is dead code
(``best_mse = best_mse``, ops.py:243); we track the best for real.
``l2loss``/signed does no search in the reference (ops.py:37-39); we
search symmetric clip candidates too (strictly better, same API).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dlmc_quant_tpu.ops.numerics import (
    channel_param_shape,
    get_qrange,
    quantize,
    reduce_axes_except,
)

_EPS = 1e-9

# number of 1%-shrink steps in the clip grid search (ref: ops.py:52)
GRID_STEPS = 80
# cap for fixed-point iterations (reference loops are unbounded / 1000)
MAX_FP_ITERS = 100
FP_TOL = 1e-5


def _sse(a, b):
    """Sum of squared errors — the observer ranking metric.

    ref: trainer/loss/loss.py l2_loss (per-row SSE averaged over batch);
    for ranking candidate scales only the ordering matters.
    """
    return jnp.sum((a - b) ** 2)


# ---------------------------------------------------------------------------
# Per-tensor observers
# ---------------------------------------------------------------------------

def minmax_tensor(tensor, n_bits: int, signed: bool, allow_offset: bool = True):
    """Abs-max (signed/symmetric) or min..max affine (unsigned) scale.

    ref: ops.py:20-34
    """
    if signed:
        qmax = 2 ** (n_bits - 1) - 1
        scale = jnp.max(jnp.abs(tensor)) / qmax
        offset = jnp.zeros(())
    else:
        qmax = 2 ** n_bits - 1
        min_val = jnp.min(tensor) if allow_offset else jnp.zeros(())
        max_val = jnp.max(tensor)
        scale = (max_val - min_val) / qmax
        offset = min_val
    return jnp.maximum(scale, _EPS), offset


def l2loss_tensor(tensor, n_bits: int, signed: bool, allow_offset: bool = True):
    """Clip-range grid search: shrink the min/max range by 1% per step for
    80 steps, keep the (scale, offset) minimizing the L2 reconstruction
    error.  ref: ops.py:36-68 (search extended to the signed case).
    """
    qmin, qmax = get_qrange(signed, n_bits)
    levels = qmax - qmin
    if signed:
        base_max = jnp.max(jnp.abs(tensor))
        base_min = -base_max
    else:
        base_min = jnp.min(tensor) if allow_offset else jnp.zeros(())
        base_max = jnp.max(tensor)

    def step(best, i):
        f = 1.0 - 0.01 * i
        mn, mx = f * base_min, f * base_max
        scale = jnp.maximum((mx - mn) / levels, _EPS)
        offset = jnp.zeros(()) if signed else mn
        q = quantize(tensor, scale, offset, qmin, qmax)
        loss = _sse(q * scale + offset, tensor)
        better = loss < best[0]
        return (jnp.where(better, loss, best[0]),
                jnp.where(better, scale, best[1]),
                jnp.where(better, offset, best[2])), None

    init = (jnp.inf, jnp.maximum((base_max - base_min) / levels, _EPS),
            jnp.zeros(()) if signed else base_min)
    (_, scale, offset), _ = lax.scan(step, init,
                                     jnp.arange(GRID_STEPS, dtype=jnp.float32))
    return scale, offset


def l2norm_tensor(tensor, n_bits: int, signed: bool):
    """Lloyd-Max-style fixed point: ``scale ← Σ(x·x_q)/Σ(x_q²)`` until the
    relative change drops below 1e-5.  ref: ops.py:71-83
    """
    scale, offset = minmax_tensor(tensor, n_bits, signed, allow_offset=True)
    qmin, qmax = get_qrange(signed, n_bits)

    def cond(state):
        _, diff, it = state
        return (diff > FP_TOL) & (it < MAX_FP_ITERS)

    def body(state):
        scale, _, it = state
        q = quantize(tensor, scale, offset, qmin, qmax)
        new_scale = jnp.sum(tensor * q) / jnp.sum(q * q + 1e-7)
        diff = jnp.abs(new_scale - scale) / jnp.maximum(jnp.abs(scale), _EPS)
        return new_scale, diff, it + 1

    scale, _, _ = lax.while_loop(cond, body, (scale, jnp.inf, 0))
    return scale, offset


def percentile_tensor(tensor, n_bits: int, signed: bool, pct: float = 99.99,
                      allow_offset: bool = True):
    """Percentile-clipped range (north-star addition; no reference analogue).

    Signed: symmetric at the ``pct`` percentile of |x|.  Unsigned: affine
    between the (100-pct) and pct percentiles.
    """
    if signed:
        qmax = 2 ** (n_bits - 1) - 1
        hi = jnp.percentile(jnp.abs(tensor), pct)
        return jnp.maximum(hi / qmax, _EPS), jnp.zeros(())
    qmax = 2 ** n_bits - 1
    hi = jnp.percentile(tensor, pct)
    lo = jnp.percentile(tensor, 100.0 - pct) if allow_offset else jnp.zeros(())
    return jnp.maximum((hi - lo) / qmax, _EPS), lo


# ---------------------------------------------------------------------------
# Per-channel observers
# ---------------------------------------------------------------------------

def _channel_view(tensor, ch_axis: int):
    """Move ``ch_axis`` to the front and flatten the rest: (C, -1).

    ref: ops.py:112-118 (_process_channel)
    """
    t = jnp.moveaxis(tensor, ch_axis, 0)
    return t.reshape(t.shape[0], -1)


def _channel_bcast(stat, tensor_ndim: int, ch_axis: int):
    return stat.reshape(channel_param_shape(tensor_ndim, ch_axis))


def minmax_channel(tensor, n_bits: int, signed: bool, ch_axis: int = 0,
                   allow_offset: bool = True):
    """Per-channel min/max; returns broadcast-shaped (scale, offset).

    ref: ops.py:121-140
    """
    t = _channel_view(tensor, ch_axis)
    if signed:
        qmax = 2 ** (n_bits - 1) - 1
        scale = jnp.max(jnp.abs(t), axis=1) / qmax
        offset = jnp.zeros_like(scale)
    else:
        qmax = 2 ** n_bits - 1
        mn = jnp.min(t, axis=1) if allow_offset else jnp.zeros(t.shape[0])
        mx = jnp.max(t, axis=1)
        scale = (mx - mn) / qmax
        offset = mn
    return (_channel_bcast(jnp.maximum(scale, _EPS), tensor.ndim, ch_axis),
            _channel_bcast(offset, tensor.ndim, ch_axis))


def l2loss_channel(tensor, n_bits: int, signed: bool, ch_axis: int = 0,
                   allow_offset: bool = True):
    """Per-channel 80-step clip grid search, vectorized over channels
    (the reference loops channels in Python; ops.py:169-196).
    """
    qmin, qmax = get_qrange(signed, n_bits)
    levels = qmax - qmin
    t = _channel_view(tensor, ch_axis)          # (C, N)
    if signed:
        base_max = jnp.max(jnp.abs(t), axis=1)
        base_min = -base_max
    else:
        base_min = (jnp.min(t, axis=1) if allow_offset
                    else jnp.zeros(t.shape[0]))
        base_max = jnp.max(t, axis=1)

    def step(best, i):
        f = 1.0 - 0.01 * i
        mn, mx = f * base_min, f * base_max                    # (C,)
        scale = jnp.maximum((mx - mn) / levels, _EPS)
        offset = jnp.zeros_like(mn) if signed else mn
        q = quantize(t, scale[:, None], offset[:, None], qmin, qmax)
        loss = jnp.sum((q * scale[:, None] + offset[:, None] - t) ** 2,
                       axis=1)                                 # (C,)
        better = loss < best[0]
        return (jnp.where(better, loss, best[0]),
                jnp.where(better, scale, best[1]),
                jnp.where(better, offset, best[2])), None

    init = (jnp.full(t.shape[0], jnp.inf),
            jnp.maximum((base_max - base_min) / levels, _EPS),
            jnp.zeros(t.shape[0]) if signed else base_min)
    (_, scale, offset), _ = lax.scan(step, init,
                                     jnp.arange(GRID_STEPS, dtype=jnp.float32))
    return (_channel_bcast(scale, tensor.ndim, ch_axis),
            _channel_bcast(offset, tensor.ndim, ch_axis))


def l2norm_channel(tensor, n_bits: int, signed: bool, ch_axis: int = 0):
    """Per-channel fixed-point L2-optimal scale.  ref: ops.py:198-215"""
    qmin, qmax = get_qrange(signed, n_bits)
    t = _channel_view(tensor, ch_axis)
    scale_b, offset_b = minmax_channel(tensor, n_bits, signed, ch_axis)
    scale = scale_b.reshape(-1)
    offset = offset_b.reshape(-1)

    def cond(state):
        _, diff, it = state
        return (diff > FP_TOL) & (it < MAX_FP_ITERS)

    def body(state):
        scale, _, it = state
        q = quantize(t, scale[:, None], offset[:, None], qmin, qmax)
        new_scale = jnp.sum(t * q, axis=1) / jnp.sum(q * q + 1e-7, axis=1)
        diff = (jnp.linalg.norm(new_scale - scale)
                / jnp.maximum(jnp.linalg.norm(scale), _EPS))
        return new_scale, diff, it + 1

    scale, _, _ = lax.while_loop(cond, body, (scale, jnp.inf, 0))
    return (_channel_bcast(scale, tensor.ndim, ch_axis), offset_b)


# ---------------------------------------------------------------------------
# Per-pixel observers (conv-weight spatial positions)
# ---------------------------------------------------------------------------

def _pixel_view(tensor):
    """(O, I, *spatial) → (O, I, S) plus the spatial shape for reshaping."""
    spatial = tensor.shape[2:] if tensor.ndim > 2 else (1,)
    return tensor.reshape(tensor.shape[0], tensor.shape[1], -1), spatial


def minmax_pixel(tensor, n_bits: int, signed: bool, allow_offset: bool = True):
    """Per-spatial-position min/max, reduced over out/in channels.

    ref: ops.py:142-167 (we use plain min/max for the unsigned branch;
    the reference's ``abs().min`` there is a quirk).
    """
    t, spatial = _pixel_view(tensor)
    if signed:
        qmax = 2 ** (n_bits - 1) - 1
        scale = jnp.max(jnp.abs(t), axis=(0, 1)) / qmax
        offset = jnp.zeros_like(scale)
    else:
        qmax = 2 ** n_bits - 1
        mn = (jnp.min(t, axis=(0, 1)) if allow_offset
              else jnp.zeros(t.shape[-1]))
        mx = jnp.max(t, axis=(0, 1))
        scale = (mx - mn) / qmax
        offset = mn
    shape = (1, 1) + spatial
    return (jnp.maximum(scale, _EPS).reshape(shape), offset.reshape(shape))


def l2norm_pixel(tensor, n_bits: int, signed: bool, patience: int = MAX_FP_ITERS):
    """Per-pixel fixed-point L2 scale with best-MSE tracking.

    ref: ops.py:217-250 (whose best-tracking is dead code; fixed here).
    """
    qmin, qmax = get_qrange(signed, n_bits)
    t, spatial = _pixel_view(tensor)
    scale_b, offset_b = minmax_pixel(tensor, n_bits, signed)
    scale = scale_b.reshape(-1)
    offset = offset_b.reshape(-1)

    def cond(state):
        _, _, _, diff, it = state
        return (diff > FP_TOL) & (it < patience)

    def body(state):
        scale, best_mse, best_scale, _, it = state
        q = quantize(t, scale[None, None, :], offset[None, None, :],
                     qmin, qmax)
        deq = q * scale[None, None, :] + offset[None, None, :]
        mse = _sse(deq, t)
        better = mse < best_mse
        best_mse = jnp.where(better, mse, best_mse)
        best_scale = jnp.where(better, scale, best_scale)
        new_scale = (jnp.sum(t * q, axis=(0, 1))
                     / jnp.sum(q * q + 1e-7, axis=(0, 1)))
        diff = (jnp.linalg.norm(new_scale - scale)
                / jnp.maximum(jnp.linalg.norm(scale), _EPS))
        return new_scale, best_mse, best_scale, diff, it + 1

    _, _, best_scale, _, _ = lax.while_loop(
        cond, body, (scale, jnp.inf, scale, jnp.inf, 0))
    shape = (1, 1) + spatial
    return best_scale.reshape(shape), offset_b


# ---------------------------------------------------------------------------
# Output-reconstruction observers: pick the weight scale minimizing the
# layer OUTPUT error.  ``forward_fn(input, weight) -> output`` is the
# layer's linear op (conv/matmul incl. bias), jitted once by the caller.
# ---------------------------------------------------------------------------

def l2norm_output(inputs, weight, forward_fn: Callable, n_bits: int,
                  signed: bool, patience: int = 1000):
    """Per-tensor output-reconstruction fixed point.

    Iterates ``scale ← <out, out_q>/<out_q, out_q>`` where
    ``out_q = forward_fn(x, quantize(w, scale))`` (integer-valued weights,
    linearity pulls the scale out), tracking the scale whose *dequantized*
    output MSE is best.  ref: ops.py:85-109
    """
    output = forward_fn(inputs, weight)
    scale, offset = minmax_tensor(weight, n_bits, signed, allow_offset=True)
    qmin, qmax = get_qrange(signed, n_bits)

    def cond(state):
        _, _, _, diff, it = state
        return (diff > FP_TOL) & (it < patience)

    def body(state):
        scale, best_mse, best_scale, _, it = state
        wq = quantize(weight, scale, offset, qmin, qmax)
        out_q = forward_fn(inputs, wq)
        mse = _sse(output, out_q * scale)
        better = mse < best_mse
        best_mse = jnp.where(better, mse, best_mse)
        best_scale = jnp.where(better, scale, best_scale)
        new_scale = (jnp.mean(out_q * output, axis=0).sum()
                     / jnp.mean(out_q * out_q + 1e-7, axis=0).sum())
        diff = jnp.abs(new_scale - scale) / jnp.maximum(jnp.abs(scale), _EPS)
        return new_scale, best_mse, best_scale, diff, it + 1

    _, _, best_scale, _, _ = lax.while_loop(
        cond, body, (scale, jnp.inf, scale, jnp.inf,
                     jnp.zeros((), jnp.int32)))
    return best_scale, offset


def l2norm_output_channel(inputs, weight, forward_fn: Callable, n_bits: int,
                          signed: bool, ch_axis: int = 0,
                          patience: int = 1000):
    """Per-output-channel output-reconstruction fixed point.

    Output channel axis is assumed to be axis 1 of the layer output
    (NCHW-style) or the last axis (NHWC / dense) — detected from the
    channel count.  ref: ops.py:252-292
    """
    output = forward_fn(inputs, weight)
    n_ch = weight.shape[ch_axis]
    # locate the output's channel axis
    out_ch_axis = 1 if (output.ndim > 1 and output.shape[1] == n_ch) \
        else output.ndim - 1
    o = jnp.moveaxis(output, out_ch_axis, 1).reshape(
        output.shape[0], n_ch, -1)

    scale_b, offset_b = minmax_channel(weight, n_bits, signed, ch_axis)
    scale = scale_b.reshape(-1)
    offset0 = offset_b.reshape(-1)
    qmin, qmax = get_qrange(signed, n_bits)
    pshape = channel_param_shape(weight.ndim, ch_axis)

    def cond(state):
        _, _, _, diff, it = state
        return (diff > FP_TOL) & (it < patience)

    def body(state):
        scale, best_mse, best_scale, _, it = state
        wq = quantize(weight, scale.reshape(pshape),
                      offset0.reshape(pshape), qmin, qmax)
        out_q = forward_fn(inputs, wq)
        oq = jnp.moveaxis(out_q, out_ch_axis, 1).reshape(
            output.shape[0], n_ch, -1)
        mse = _sse(o, oq * scale[None, :, None])
        better = mse < best_mse
        best_mse = jnp.where(better, mse, best_mse)
        best_scale = jnp.where(better, scale, best_scale)
        new_scale = (jnp.sum(o * oq, axis=(0, 2))
                     / jnp.sum(oq * oq + 1e-7, axis=(0, 2)))
        diff = (jnp.linalg.norm(new_scale - scale)
                / jnp.maximum(jnp.linalg.norm(scale), _EPS))
        return new_scale, best_mse, best_scale, diff, it + 1

    _, _, best_scale, _, _ = lax.while_loop(
        cond, body, (scale, jnp.inf, scale, jnp.inf,
                     jnp.zeros((), jnp.int32)))
    return best_scale.reshape(pshape), offset_b


# ---------------------------------------------------------------------------
# Dispatch — mirrors the reference's string grammar
# (``globals()[f"quantize_{qtype}"]``, ref: ops.py:11-18) with an explicit
# registry instead of reflection.
# ---------------------------------------------------------------------------

TENSOR_OBSERVERS: Dict[str, Callable] = {
    "minmax_tensor": minmax_tensor,
    "l2loss_tensor": l2loss_tensor,
    "l2norm_tensor": l2norm_tensor,
    "percentile_tensor": percentile_tensor,
    "minmax_channel": minmax_channel,
    "l2loss_channel": l2loss_channel,
    "l2norm_channel": l2norm_channel,
    "minmax_pixel": minmax_pixel,
    "l2norm_pixel": l2norm_pixel,
}

OUTPUT_OBSERVERS: Dict[str, Callable] = {
    "l2norm_output": l2norm_output,
    "l2norm_output_channel": l2norm_output_channel,
}


def get_qparams_tensor(tensor, qtype: str, **kwargs):
    """String-dispatched tensor observer.  ref: ops.py:15-18"""
    try:
        fn = TENSOR_OBSERVERS[qtype]
    except KeyError:
        raise ValueError(
            f"unknown observer {qtype!r}; known: "
            f"{sorted(TENSOR_OBSERVERS)}") from None
    return fn(tensor, **kwargs)


def get_qparams_output(inputs, weight, forward_fn, qtype: str, **kwargs):
    """String-dispatched output-reconstruction observer.  ref: ops.py:11-13"""
    try:
        fn = OUTPUT_OBSERVERS[qtype]
    except KeyError:
        raise ValueError(
            f"unknown output observer {qtype!r}; known: "
            f"{sorted(OUTPUT_OBSERVERS)}") from None
    return fn(inputs, weight, forward_fn, **kwargs)


def is_output_observer(qtype: str) -> bool:
    """The reference matches '*output*' with fnmatch (modules/base.py:106)."""
    return "output" in qtype


# ---------------------------------------------------------------------------
# Streaming observers — scan-compatible init/update/finalize state machines
# for multi-batch activation calibration (the reference only ever uses the
# first batch; these are the TPU-native generalization).
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class StreamingState:
    """Pytree carrying running activation statistics across a lax.scan."""

    def __init__(self, min, max, pct_sum, count):
        self.min, self.max, self.pct_sum, self.count = min, max, pct_sum, count

    def tree_flatten(self):
        return (self.min, self.max, self.pct_sum, self.count), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def streaming_init(stat_shape=()) -> StreamingState:
    return StreamingState(
        min=jnp.full(stat_shape, jnp.inf),
        max=jnp.full(stat_shape, -jnp.inf),
        pct_sum=jnp.zeros(stat_shape),
        count=jnp.zeros((), jnp.int32),
    )


def streaming_update(state: StreamingState, x, ch_axis=None,
                     pct: float = 99.99) -> StreamingState:
    """Fold one batch into the running stats (global or per-channel)."""
    if ch_axis is None:
        mn, mx = jnp.min(x), jnp.max(x)
        p = jnp.percentile(jnp.abs(x), pct)
    else:
        axes = reduce_axes_except(x.ndim, ch_axis)
        mn, mx = jnp.min(x, axis=axes), jnp.max(x, axis=axes)
        p = jnp.percentile(jnp.abs(jnp.moveaxis(x, ch_axis, 0)
                                   .reshape(x.shape[ch_axis], -1)), pct, axis=1)
    return StreamingState(
        min=jnp.minimum(state.min, mn),
        max=jnp.maximum(state.max, mx),
        pct_sum=state.pct_sum + p,
        count=state.count + 1,
    )


def streaming_finalize(state: StreamingState, qtype: str, n_bits: int,
                       signed: bool, pct: float = 99.99):
    """Turn accumulated stats into (scale, offset).

    Supports 'minmax*' (true multi-batch min/max) and 'percentile*'
    (mean of per-batch percentiles, TensorRT-style).
    """
    if qtype.startswith("percentile"):
        hi = state.pct_sum / jnp.maximum(state.count, 1)
        if signed:
            qmax = 2 ** (n_bits - 1) - 1
            return jnp.maximum(hi / qmax, _EPS), jnp.zeros_like(hi)
        qmax = 2 ** n_bits - 1
        return jnp.maximum(hi / qmax, _EPS), jnp.zeros_like(hi)
    if signed:
        qmax = 2 ** (n_bits - 1) - 1
        amax = jnp.maximum(jnp.abs(state.min), jnp.abs(state.max))
        return jnp.maximum(amax / qmax, _EPS), jnp.zeros_like(amax)
    qmax = 2 ** n_bits - 1
    scale = (state.max - state.min) / qmax
    return jnp.maximum(scale, _EPS), state.min
