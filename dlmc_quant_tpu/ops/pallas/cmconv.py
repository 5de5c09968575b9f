"""Channel-major fused int8 3x3 stride-1 convolution (implicit GEMM).

The deploy-path engine for reparameterized CNN stacks (RepVGG /
MobileOne deploy form — ref: model/classification/repvgg.py:132-147
produces exactly these conv->relu chains).  XLA's conv lowering runs
int8 at its bf16 rate (~112 TFLOP/s measured on this chip) while the
int8 MXU sustains ~200 TOP/s on aligned GEMMs; this kernel restructures
the conv so the MXU sees one large aligned GEMM per block and the
activations never round-trip through fp32 HBM:

* Activations live channel-major: ``x_cm`` is ``(C, M)`` int8 where
  ``M`` flattens (image, row, col) over a *shared-pad* grid — each
  image is ``(H+1) x (W+1)`` with ONE zero-point pad column per row and
  ONE pad row per image (a single pad column serves as both the right
  pad of col W-1 and the left pad of col 0 of the next row; same for
  rows), plus a ``bm``-wide zero-point guard block at each end of M.
* A 3x3 stride-1 conv then becomes ``y[:, m] = sum_t W_t @ x[:, m +
  off_t]`` with *constant* lane offsets ``off_t = (dy-1)*Wp + (dx-1)``
  — i.e. one GEMM ``(O, 9C) x (9C, bm)`` per M-block, with the patch
  matrix built in VMEM from a single strip DMA (the 9x input re-read
  never touches HBM).
* The epilogue fuses dequant + bias + ReLU + *re*-quantization to the
  next layer's int8 grid and writes int8: activation HBM traffic is
  1 byte/value in steady state (4x less than the fp32 emulation the
  reference uses — dlmc/quantization/scalar/modules/base.py:96-140).
* Pad/guard lanes are overwritten with the output quantizer's
  zero-point code via a mask, so the layout chains: layer N's output
  is layer N+1's ``x_cm`` with no glue.

Per-tap channel blocks are padded to ``Cp = roundup(C, 32)`` (int8
sublane tile) and the corresponding GEMM weight rows are ZERO, so
whatever garbage sits in the pad sublanes multiplies away.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(a: int, b: int) -> int:
    return -(-a // b) * b


# ---------------------------------------------------------------------------
# Layout helpers (pure jnp; run once per stage boundary, fused by XLA)
# ---------------------------------------------------------------------------

def cm_geometry(n: int, h: int, w: int, bm: int = 512):
    """Geometry of the shared-pad channel-major layout.

    Returns (Hp, Wp, img, m_data, n_blocks, M): per-image padded grid is
    Hp x Wp = (h+1) x (w+1); data region is ``n * img`` lanes starting at
    lane ``bm``; M = (n_blocks) * bm with one guard block at each end.
    """
    hp, wp = h + 1, w + 1
    img = hp * wp
    m_data = n * img
    n_blocks = 2 + -(-m_data // bm)
    return hp, wp, img, m_data, n_blocks * bm


def to_cm(x_codes: jnp.ndarray, zp_code, bm: int = 512) -> jnp.ndarray:
    """(N, H, W, C) int8 codes -> (C, M) channel-major shared-pad layout."""
    n, h, w, c = x_codes.shape
    hp, wp, img, m_data, M = cm_geometry(n, h, w, bm)
    zp = jnp.asarray(zp_code, jnp.int8)
    xp = jnp.pad(x_codes, ((0, 0), (0, 1), (0, 1), (0, 0)),
                 constant_values=zp)
    flat = jnp.transpose(xp, (3, 0, 1, 2)).reshape(c, m_data)
    lead = jnp.full((c, bm), zp, jnp.int8)
    tail = jnp.full((c, M - bm - m_data), zp, jnp.int8)
    return jnp.concatenate([lead, flat, tail], axis=1)


def from_cm(x_cm: jnp.ndarray, n: int, h: int, w: int,
            bm: int = 512) -> jnp.ndarray:
    """(C, M) channel-major -> (N, H, W, C)."""
    c = x_cm.shape[0]
    hp, wp, img, m_data, _ = cm_geometry(n, h, w, bm)
    body = x_cm[:, bm:bm + m_data].reshape(c, n, hp, wp)
    return jnp.transpose(body[:, :, :h, :w], (1, 2, 3, 0))


def cm_mask(n: int, h: int, w: int, bm: int = 512) -> jnp.ndarray:
    """(1, M) int8 mask: 1 on valid data lanes, 0 on pad/guard lanes."""
    import numpy as np
    hp, wp, img, m_data, M = cm_geometry(n, h, w, bm)
    m = np.zeros((1, M), np.int8)
    body = np.zeros((hp, wp), np.int8)
    body[:h, :w] = 1
    m[0, bm:bm + m_data] = np.tile(body.reshape(-1), n)
    return jnp.asarray(m)


def hwio_to_gemm(w_int: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) int8 -> (O, 9*Cp) GEMM weights, zero pad-channel rows.

    Row block t = dy*3+dx of the patch matrix holds input channels at
    lane offset (dy-1)*Wp + (dx-1); weights follow the same order.
    """
    _, _, c, o = w_int.shape
    cp = _rup(c, 32)
    w = jnp.transpose(w_int, (3, 0, 1, 2))           # (O, 3, 3, C)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    return w.reshape(o, 9 * cp)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _cm_kernel(x_hbm, w_hbm, a_ref, b_ref, mask_ref, zp_ref, out_ref,
               w_buf, strip, patches, sems, wsem, *,
               c: int, cp: int, o: int, wp: int, bm: int, ms: int,
               relu: bool, qmin: int, qmax: int):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    interior = jnp.logical_and(i > 0, i < nblk - 1)

    def strip_dma(slot, blk):
        # strip for block blk covers x lanes [blk*bm - 128, +ms)
        start = pl.multiple_of(blk * bm - 128, 128)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(start, ms)],
            strip.at[slot, :c], sems.at[slot])

    @pl.when(i == 0)
    def _():
        wdma = pltpu.make_async_copy(w_hbm, w_buf, wsem)
        wdma.start()
        wdma.wait()

    @pl.when(i == 1)
    def _():
        strip_dma(1, 1).start()

    @pl.when(jnp.logical_and(interior, i + 1 < nblk - 1))
    def _():
        strip_dma((i + 1) % 2, i + 1).start()

    @pl.when(jnp.logical_not(interior))
    def _():
        out_ref[:] = jnp.full((o, bm), zp_ref[0], jnp.int8)

    @pl.when(interior)
    def _():
        strip_dma(i % 2, i).wait()
        s = strip[i % 2]
        # patch build: 9 lane-shifted copies stacked on sublanes (the
        # stores normalize the lane-offset layouts of the slices)
        for dy in range(3):
            for dx in range(3):
                off = (dy - 1) * wp + (dx - 1)
                t = dy * 3 + dx
                patches[t * cp:(t + 1) * cp, :] = \
                    s[:, 128 + off:128 + off + bm]
        acc = jax.lax.dot_general(
            w_buf[:], patches[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        q = jnp.clip(jnp.round(y), qmin, qmax)
        zp = zp_ref[0].astype(jnp.float32)
        # int8 vector compares are unsupported; select in f32/int32 space
        sel = mask_ref[:].astype(jnp.float32) > 0.5
        out_ref[:] = jnp.where(sel, q, zp).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("c", "o", "wp", "bm", "relu", "qmin", "qmax",
                     "interpret"))
def int8_conv3x3_cm(x_cm, w_gemm, a_vec, b_vec, mask, zp_code, *,
                    c: int, o: int, wp: int, bm: int = 512,
                    relu: bool = True, qmin: int = -128, qmax: int = 127,
                    interpret: bool = False):
    """Fused int8 3x3/s1 conv + requant on the channel-major layout.

    x_cm:   (C, M) int8, shared-pad layout (see module docstring).
    w_gemm: (O, 9*Cp) int8 from :func:`hwio_to_gemm`.
    a_vec:  (O,) f32 — per-channel ``s_x * s_w / s_y`` requant scale.
    b_vec:  (O,) f32 — folded bias on the output grid (incl. zero-point
            corrections and the output shift), i.e. the epilogue is
            ``q = clip(round(acc * a + b))``.
    mask:   (1, M) int8 — 1 on valid lanes (:func:`cm_mask`).
    zp_code: () int32 — output zero-point code written to pad lanes.
    Returns (O, M) int8 on the output quantizer's grid.
    """
    C, M = x_cm.shape
    assert C == c and M % bm == 0 and bm % 128 == 0
    cp = _rup(c, 32)
    assert w_gemm.shape == (o, 9 * cp), (w_gemm.shape, o, cp)
    assert wp + 1 <= 128
    ms = bm + 256
    nblk = M // bm

    a2 = a_vec.reshape(o, 1).astype(jnp.float32)
    b2 = b_vec.reshape(o, 1).astype(jnp.float32)
    zp = jnp.asarray(zp_code, jnp.int32).reshape(1)

    kern = functools.partial(
        _cm_kernel, c=c, cp=cp, o=o, wp=wp, bm=bm, ms=ms,
        relu=relu, qmin=qmin, qmax=qmax)
    flops = 2 * o * 9 * c * M
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),          # w (HBM)
            pl.BlockSpec((o, 1), lambda i: (0, 0)),        # a
            pl.BlockSpec((o, 1), lambda i: (0, 0)),        # b
            pl.BlockSpec((1, bm), lambda i: (0, i)),       # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),         # zp
        ],
        out_specs=pl.BlockSpec((o, bm), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((o, M), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((o, 9 * cp), jnp.int8),             # weights
            pltpu.VMEM((2, cp, ms), jnp.int8),             # strip x2
            pltpu.VMEM((9 * cp, bm), jnp.int8),            # patch matrix
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * M * (c + o) + o * 9 * cp,
            transcendentals=0),
        interpret=interpret,
    )(x_cm, w_gemm, a2, b2, mask, zp)
