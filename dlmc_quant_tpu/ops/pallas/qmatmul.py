"""Fused int8 matmul Pallas kernels.

``int8_matmul(x_i8, w_i8, scale, bias, relu)`` computes

    out = relu?( (x_i8 @ w_i8).astype(f32) * scale + bias )

in one kernel: int8×int8→int32 on the MXU, dequant epilogue on the VPU,
no int32 intermediate ever touching HBM.  This is the deploy-path engine
for QDense and 1×1 QConv (and the im2col core for larger convs).

Grid: (M/BM, N/BN, K/BK) with an int32 VMEM accumulator; the epilogue
runs on the last K step.  Tile sizes respect int8 (32,128) tiling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _matmul_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, acc_ref, *,
                   n_k: int, relu: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * scale_ref[:] + bias_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("relu", "block_m", "block_n",
                                             "block_k"))
def int8_matmul(x_i8, w_i8, scale, bias=None, relu: bool = False,
                block_m: int = 512, block_n: int = 512,
                block_k: int = 1024):
    """out[M,N] = epilogue((x_i8[M,K] @ w_i8[K,N]) * scale[N] + bias[N]).

    Shapes need not be tile-aligned; inputs are padded (zeros contribute
    nothing to the int accumulation).
    """
    M, K = x_i8.shape
    K2, N = w_i8.shape
    assert K == K2, (x_i8.shape, w_i8.shape)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (N,))
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    bias = jnp.broadcast_to(jnp.asarray(bias, jnp.float32), (N,))

    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    # int8 min tile (32, 128); f32 out tile (8, 128)
    bm = max(8, bm - bm % 8) if bm < 32 else bm - bm % 32 or 32
    bn = max(128, bn - bn % 128)
    bk = max(128, bk - bk % 128)

    Mp, Np, Kp = _cdiv(M, bm) * bm, _cdiv(N, bn) * bn, _cdiv(K, bk) * bk
    if (Mp, Kp) != (M, K):
        x_i8 = jnp.pad(x_i8, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        w_i8 = jnp.pad(w_i8, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale, (0, Np - N))
        bias = jnp.pad(bias, (0, Np - N))
    n_k = Kp // bk

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k, relu=relu),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + 4 * Mp * Np,
            transcendentals=0),
    )(x_i8, w_i8, scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:M, :N]


def _quant_matmul_kernel(x_ref, w_ref, sx_ref, scale_ref, bias_ref, out_ref,
                         acc_ref, *, n_k: int, relu: bool, qmin: int,
                         qmax: int, shift: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    inv_s = 1.0 / sx_ref[0]
    x_i8 = (jnp.clip(jnp.round(x_ref[:] * inv_s), qmin, qmax) - shift
            ).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        x_i8, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * scale_ref[:] + bias_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("relu", "qmin", "qmax", "shift",
                                             "block_m", "block_n", "block_k"))
def fused_quant_int8_matmul(x, w_i8, s_x, scale, bias=None,
                            relu: bool = False, qmin: int = 0,
                            qmax: int = 255, shift: int = 128,
                            block_m: int = 512, block_n: int = 512,
                            block_k: int = 1024):
    """Fully fused: quantize fp32 activations to int8 in-kernel, int8
    matmul, dequant epilogue.  ``scale``/``bias`` must already include
    the s_x factor and zero-point correction (see quant/deploy.py) —
    i.e. scale = s_x·s_w, bias = bias_eff.
    """
    M, K = x.shape
    _, N = w_i8.shape
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (N,))
    bias = (jnp.zeros((N,), jnp.float32) if bias is None
            else jnp.broadcast_to(jnp.asarray(bias, jnp.float32), (N,)))

    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    bm = max(8, bm - bm % 8) if bm < 32 else bm - bm % 32 or 32
    bn = max(128, bn - bn % 128)
    bk = max(128, bk - bk % 128)
    Mp, Np, Kp = _cdiv(M, bm) * bm, _cdiv(N, bn) * bn, _cdiv(K, bk) * bk
    if (Mp, Kp) != (M, K):
        x = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if w_i8.shape != (Kp, Np):
        w_i8 = jnp.pad(w_i8, ((0, Kp - K), (0, Np - N)))
    if Np != N:
        scale = jnp.pad(scale, (0, Np - N))
        bias = jnp.pad(bias, (0, Np - N))
    n_k = Kp // bk

    out = pl.pallas_call(
        functools.partial(_quant_matmul_kernel, n_k=n_k, relu=relu,
                          qmin=qmin, qmax=qmax, shift=shift),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w_i8, jnp.reshape(jnp.asarray(s_x, jnp.float32), (1,)),
      scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:M, :N]
