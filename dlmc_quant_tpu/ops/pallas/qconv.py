"""Fused int8 direct convolution (implicit GEMM) Pallas kernel.

``int8_conv3x3(x_i8_padded, w_i8, scale, bias, relu)`` computes a
stride-1 3×3 NHWC conv as 9 shifted int8 matmuls on the MXU with the
fp32 dequant epilogue fused — XLA's int8 conv lowering does not reach
the int8 MXU rate (it clocks ≈ its bf16 conv), so this kernel is the
deploy-path engine for the 3×3 stride-1 layers that dominate RepVGG
FLOPs.  Stride-2 / other kernel sizes fall back to the XLA int8 conv.

The input must already be zero-point padded by 1 on H and W (the deploy
path pads anyway — see quant/deploy.py).

Layout gymnastics (Mosaic int8 tiling is (sublane 8, lane 128) over the
last two dims, and slices along tiled dims must be 8-aligned in both
offset and length):
  * W is padded to ``wq = roundup(W, 8)`` (+2 halo, again 8-aligned), so
    every W-slice has aligned length;
  * the dx ∈ {1, 2} column shifts — unalignable as slices — are done
    with ``pltpu.roll`` on the VMEM strip;
  * the H halo (overlapping (bh+2)-row strips) cannot be expressed with
    block-index BlockSpecs, so the input stays in HBM (``pltpu.ANY``)
    and each program DMAs its strip into VMEM scratch via ``pl.ds``.

Grid: (N, H/BH, O/BO); one (bh·wq, C)×(C, BO) int8 matmul per tap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _rup(a, b):
    return _cdiv(a, b) * b


def _conv_kernel(x_hbm, w_ref, scale_ref, bias_ref, out_ref, x_vmem, sem, *,
                 bh: int, wq: int, relu: bool):
    ni = pl.program_id(0)
    hi = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[ni, pl.ds(hi * bh, bh + 2)], x_vmem, sem)
    dma.start()
    dma.wait()

    c = x_vmem.shape[-1]
    bo = w_ref.shape[-1]
    acc = jnp.zeros((bh * wq, bo), jnp.int32)
    for dy in range(3):
        slab = x_vmem[dy:dy + bh]                 # (bh, wpt, c): dim0 untiled
        wpt = slab.shape[1]
        # Mosaic can only rotate 32-bit lanes: bitcast groups of 4 int8
        # channels into one int32 lane (C is always a multiple of 4),
        # rotate along W, bitcast back.
        slab32 = pltpu.bitcast(slab, jnp.int32)
        for dx in range(3):
            if dx:
                # left-rotate by dx == roll forward by (wpt - dx)
                shifted = pltpu.bitcast(
                    pltpu.roll(slab32, wpt - dx, 1), jnp.int8)
            else:
                shifted = slab
            patch = shifted[:, 0:wq, :].reshape(bh * wq, c)
            acc += jax.lax.dot_general(
                patch, w_ref[dy, dx, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(bh, wq, bo)


@functools.partial(jax.jit, static_argnames=("relu", "block_h", "block_o"))
def int8_conv3x3(x_padded, w_i8, scale, bias=None, relu: bool = False,
                 block_h: int = 8, block_o: int = 256):
    """Stride-1 3×3 conv on zero-point-prepadded int8 input.

    x_padded: (N, H+2, W+2, C) int8 — already padded with the activation
    zero-point code.  w_i8: (3, 3, C, O) int8.  scale: (O,) f32 — the
    combined s_x·s_w factor.  bias: (O,) f32 — bias_eff incl. zero-point
    corrections.  Returns (N, H, W, O) f32.
    """
    n, hp, wp, c = x_padded.shape
    h, w = hp - 2, wp - 2
    o = w_i8.shape[-1]
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (o,))
    bias = (jnp.zeros((o,), jnp.float32) if bias is None
            else jnp.broadcast_to(jnp.asarray(bias, jnp.float32), (o,)))

    bh = min(block_h, h)
    bo = min(block_o, o)
    bo = max(128, bo - bo % 128) if bo >= 128 else o
    wq = _rup(w, 8)                    # aligned output width
    wpt = _rup(wq + 2, 8)              # aligned padded strip width
    cpad = _rup(c, 128) - c            # DMA needs lane-aligned channels
    hpad = _rup(h, bh) - h
    opad = _rup(o, bo) - o
    x_padded = jnp.pad(
        x_padded, ((0, 0), (0, hpad), (0, wpt - wp), (0, cpad)))
    if opad or cpad:
        w_i8 = jnp.pad(w_i8, ((0, 0), (0, 0), (0, cpad), (0, opad)))
        scale = jnp.pad(scale, (0, opad))
        bias = jnp.pad(bias, (0, opad))
    c = c + cpad
    ob = o + opad

    out = pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh, wq=wq, relu=relu),
        grid=(n, (h + hpad) // bh, ob // bo),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # stays in HBM
            pl.BlockSpec((3, 3, c, bo), lambda ni, hi, oi: (0, 0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bo), lambda ni, hi, oi: (0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bo), lambda ni, hi, oi: (0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wq, bo),
                               lambda ni, hi, oi: (ni, hi, 0, oi)),
        out_shape=jax.ShapeDtypeStruct((n, h + hpad, wq, ob), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, wpt, c), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * c * o * 9,
            bytes_accessed=n * hp * wp * c + 9 * c * o + 4 * n * h * w * o,
            transcendentals=0),
    )(x_padded, w_i8, scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:, :h, :w, :o]
