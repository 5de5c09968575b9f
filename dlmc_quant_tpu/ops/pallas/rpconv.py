"""Row-major dx-grouped fused int8 3x3 stride-1 convolution.

Successor to the channel-major cmconv kernel (removed; see git
history).  Measurement on the v5e chip showed the MXU starves whenever
either GEMM output dim is small: cmconv's GEMM put the o=192 output
channels on the M dim and sustained only ~75 TOP/s even with
patch-build and epilogue removed, while >=512-square tiles reach
~270 TOP/s (tools/pallas_gemm_sweep.py).  This kernel restructures the
conv so BOTH GEMM output dims are large.

Status (fence-corrected timing, tools/layerbench.py): exact everywhere,
138–145 TOP/s on RepVGG stage-3 shapes — the best Pallas conv built in
this repo, but still 0.74x XLA's chained int8 conv (186–327 TOP/s), so
the deploy path keeps XLA as its engine and this kernel stands as the
measured reference point.  Its remaining gap is VPU-bound: the
recombination adds + f32 epilogue on (bm, 3·O) int32 tiles cost ~2x the
GEMM itself at these sizes.

Design:

* Activations are **row-major shared-pad**: ``x_rm`` is ``(M, SW)`` int8
  with channels on lanes (zero-padded to ``SW = roundup(C, 128)``) and
  M flattening (image, row, col) over an (H+1) x (W+1) per-image grid —
  one zero-point pad column serves as both the right pad of col W-1 and
  the left pad of col 0 of the next row — plus a ``bm``-row guard block
  at each end.
* The 9 taps are **grouped by dx**: patches stack only the 3 dy-shifts
  at lane stride C (built with 3 *overlapping* aligned-width stores —
  later groups overwrite the previous group's lane padding, so every
  slice shape is a 128-multiple, the Mosaic requirement, while the K
  overhead stays (2C+SW)/3C ≈ 11% at C=192).  With weights
  ``W3 (2C+SW, 2O+OW)`` whose column block d holds tap column dx=d, ONE
  GEMM produces ``G`` and the conv output is the dx-shifted
  recombination

      y[j] = G[j+7, 0:] + G[j+8, O:] + G[j+9, 2O:]

  — two int32 adds of aligned-width slices (sublane shifts of 32-bit
  data are native; int8 ones are not).  GEMM dims for RepVGG stage3 /
  bm=1024: (1040, 640) x (640, 640) — no starved dim.
* The epilogue fuses dequant + bias + ReLU + requantization to the
  *next* layer's int8 grid: activations cross HBM at ~1 byte/value and
  the output (M, OW) IS the next layer's ``x_rm`` (pad rows rewritten
  to the output zero-point via the mask; lane padding is dead weight
  rows there), so stride-1 stacks chain with no glue at all.

Replaces the capability the reference outsources to cuDNN
(ref: dlmc/quantization/scalar/modules/conv.py:13-19).

Mosaic/axon constraints baked in (discovered empirically, see git log):
no lax loops in kernels, no int8 scalar splat arithmetic, no sub-32-bit
rotates, every ref-slice SHAPE 128-aligned on the lane dim (offsets are
free), DMA src/dst lane dims 128-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _rup(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# layout helpers (pure jnp; fused by XLA at stage boundaries)
# ---------------------------------------------------------------------------

def rm_geometry(n: int, h: int, w: int, bm: int = 1024):
    """(Hp, Wp, img, m_data, M) of the shared-pad row-major layout."""
    hp, wp = h + 1, w + 1
    img = hp * wp
    m_data = n * img
    nblk = 2 + _cdiv(m_data, bm)
    return hp, wp, img, m_data, nblk * bm


def to_rm(x_codes: jnp.ndarray, zp_code, bm: int = 1024) -> jnp.ndarray:
    """(N, H, W, C) int8 codes -> (M, SW) row-major shared-pad layout."""
    n, h, w, c = x_codes.shape
    sw = _rup(c, 128)
    hp, wp, img, m_data, M = rm_geometry(n, h, w, bm)
    zp = jnp.asarray(zp_code, jnp.int8)
    xp = jnp.pad(x_codes, ((0, 0), (0, 1), (0, 1), (0, 0)),
                 constant_values=zp)
    flat = xp.reshape(m_data, c)
    if sw != c:
        flat = jnp.pad(flat, ((0, 0), (0, sw - c)))
    lead = jnp.full((bm, sw), zp, jnp.int8)
    tail = jnp.full((M - bm - m_data, sw), zp, jnp.int8)
    return jnp.concatenate([lead, flat, tail], axis=0)


def from_rm(x_rm: jnp.ndarray, n: int, h: int, w: int, c: int,
            bm: int = 1024) -> jnp.ndarray:
    """(M, SW) row-major shared-pad -> (N, H, W, C)."""
    hp, wp, img, m_data, _ = rm_geometry(n, h, w, bm)
    body = x_rm[bm:bm + m_data, :c].reshape(n, hp, wp, c)
    return body[:, :h, :w, :]


def rm_mask(n: int, h: int, w: int, bm: int = 1024) -> jnp.ndarray:
    """(M, 1) int8 mask: 1 on valid data rows, 0 on pad/guard rows."""
    hp, wp, img, m_data, M = rm_geometry(n, h, w, bm)
    m = np.zeros((M, 1), np.int8)
    body = np.zeros((hp, wp), np.int8)
    body[:h, :w] = 1
    m[bm:bm + m_data, 0] = np.tile(body.reshape(-1), n)
    return jnp.asarray(m)


def hwio_to_dxg(w_int: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) int8 -> (2C+SW, 2O+OW) dx-grouped GEMM weights.

    Row t*C+ci holds dy=t-1 / channel ci (matching the overlap-store
    patch layout); column d*O+oj holds dx=d / output oj; the padding
    rows/cols are zero so the lane-pad garbage multiplies away."""
    _, _, c, o = w_int.shape
    sw, ow = _rup(c, 128), _rup(o, 128)
    out = jnp.zeros((2 * c + sw, 2 * o + ow), w_int.dtype)
    for t in range(3):
        for d in range(3):
            out = out.at[t * c:(t + 1) * c, d * o:(d + 1) * o].set(
                w_int[t, d])
    return out


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _rp_kernel(x_hbm, w_ref, a_ref, b_ref, mask_ref, zp_ref, out_ref,
               strip, patches, sems, *,
               c: int, o: int, sw: int, ow: int, wp: int, bm: int, ms: int,
               relu: bool, qmin: int, qmax: int):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    interior = jnp.logical_and(i > 0, i < nblk - 1)
    bmp = bm + 16

    def strip_dma(slot, blk):
        start = pl.multiple_of(blk * bm - 128, 128)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, ms), :], strip.at[slot], sems.at[slot])

    @pl.when(i == 1)
    def _():
        strip_dma(1, 1).start()

    @pl.when(jnp.logical_and(interior, i + 1 < nblk - 1))
    def _():
        strip_dma((i + 1) % 2, i + 1).start()

    @pl.when(jnp.logical_not(interior))
    def _():
        zp = zp_ref[0]                 # int32 scalar: splats compile
        out_ref[:] = (jnp.zeros((bm, ow), jnp.int32) + zp).astype(jnp.int8)

    @pl.when(interior)
    def _():
        strip_dma(i % 2, i).wait()
        s = strip[i % 2]
        # dy-shifted patch stack at lane stride c, via overlapping
        # aligned-width stores (in order: later groups overwrite the
        # previous group's lane padding)
        for t in range(3):
            off = 120 + (t - 1) * wp
            patches[:, t * c:t * c + sw] = s[off:off + bmp, :]
        g = jax.lax.dot_general(
            patches[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # dx recombination: y[j] = G[j+7, 0:] + G[j+8, O:] + G[j+9, 2O:]
        acc = (g[7:7 + bm, 0:ow]
               + g[8:8 + bm, o:o + ow]
               + g[9:9 + bm, 2 * o:2 * o + ow])
        y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        q = jnp.clip(jnp.round(y), qmin, qmax)
        # int8 vector compares are unsupported; select in f32 space
        sel = mask_ref[:].astype(jnp.float32) > 0.5
        zp = zp_ref[0].astype(jnp.float32)
        out_ref[:] = jnp.where(sel, q, zp).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("c", "o", "wp", "bm", "relu", "qmin", "qmax",
                     "interpret"))
def int8_conv3x3_rm(x_rm, w_dxg, a_vec, b_vec, mask, zp_code, *,
                    c: int, o: int, wp: int, bm: int = 1024,
                    relu: bool = True, qmin: int = -128, qmax: int = 127,
                    interpret: bool = False):
    """Fused int8 3x3/s1 conv + requant on the row-major layout.

    x_rm:   (M, SW) int8, shared-pad layout (see module docstring).
    w_dxg:  (2C+SW, 2O+OW) int8 from :func:`hwio_to_dxg`.
    a_vec:  (O,) f32 — per-channel ``s_x·s_w / s_y`` requant scale.
    b_vec:  (O,) f32 — folded bias on the output grid.
    mask:   (M, 1) int8 — 1 on valid rows (:func:`rm_mask`).
    zp_code: () int — output zero-point code written to pad rows.
    Returns (M, OW) int8 on the output quantizer's grid — directly the
    next stride-1 layer's ``x_rm``.
    """
    sw, ow = _rup(c, 128), _rup(o, 128)
    M, SW = x_rm.shape
    assert SW == sw and M % bm == 0 and bm % 128 == 0
    assert w_dxg.shape == (2 * c + sw, 2 * o + ow), w_dxg.shape
    assert wp + 16 <= 120, "image rows too wide for the strip margin"
    ms = bm + 256
    nblk = M // bm

    av = jnp.zeros((1, ow), jnp.float32).at[0, :o].set(
        a_vec.astype(jnp.float32))
    bv = jnp.zeros((1, ow), jnp.float32).at[0, :o].set(
        b_vec.astype(jnp.float32))
    zp = jnp.asarray(zp_code, jnp.int32).reshape(1)

    kern = functools.partial(
        _rp_kernel, c=c, o=o, sw=sw, ow=ow, wp=wp, bm=bm, ms=ms,
        relu=relu, qmin=qmin, qmax=qmax)
    flops = 2 * 9 * c * o * M
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x (HBM)
            pl.BlockSpec((2 * c + sw, 2 * o + ow),
                         lambda i: (0, 0)),                  # weights
            pl.BlockSpec((1, ow), lambda i: (0, 0)),         # a
            pl.BlockSpec((1, ow), lambda i: (0, 0)),         # b
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),         # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),           # zp
        ],
        out_specs=pl.BlockSpec((bm, ow), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, ow), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, ms, sw), jnp.int8),               # strip x2
            pltpu.VMEM((bm + 16, 2 * c + sw), jnp.int8),     # patches
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=M * (sw + ow) + 9 * c * o,
            transcendentals=0),
        interpret=interpret,
    )(x_rm, w_dxg, av, bv, mask, zp)
