#!/usr/bin/env python
"""Pallas int8 GEMM rate vs shape — finds the kernel design point.

Shapes swept:
  * big square (4096^3) — peak check vs XLA's 172 TOP/s
  * conv-as-GEMM channel-major: (O, 9C) x (9C, BM) for RepVGG stage
    shapes (O=C in {48, 96, 192}) and BM in {512, 1024, 2048}
  * per-tap accumulation shape: (BM, C) x (C, O) row-major

Every kernel is a straight VMEM-resident dot (no DMA games) run in a
loop-carried scan so rates are not hoisting artifacts.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def gemm_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def make_pallas_gemm(m, k, n, bm=None, bn=None):
    """Tiled (m,k)x(k,n) int8 GEMM; K resident, grid over (m/bm, n/bn)."""
    bm = bm or min(m, 1024)
    bn = bn or min(n, 1024)
    f = pl.pallas_call(
        gemm_kernel,
        grid=(m // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                  pl.BlockSpec((k, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
    )
    return f


def bench_gemm(name, m, k, n, iters=None, **tile):
    # pick iters so each round is ~0.3-1s of MXU work at ~150T
    flop = 2.0 * m * k * n
    iters = iters or max(8, min(256, int(50e12 / flop)))
    gemm = make_pallas_gemm(m, k, n, **tile)

    def scan_fn(x, w):
        def body(c, _):
            y = gemm(c, w)
            # dependent transform back to the carry shape (m, k)
            if n >= k:
                c2 = (y[:, :k] >> 8).astype(jnp.int8)
            else:
                reps = -(-k // n)
                c2 = (jnp.tile(y, (1, reps))[:, :k] >> 8).astype(jnp.int8)
            return c2, ()
        out, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.int32))

    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (m, k), -100, 100, jnp.int8)
    w = jax.random.randint(key, (k, n), -100, 100, jnp.int8)
    fn = jax.jit(scan_fn)
    try:
        float(jnp.asarray(fn(x, w), jnp.float32))
    except Exception as e:
        print(f"{name:28s} FAILED: {str(e)[:120]}", flush=True)
        return
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        y = fn(x, w)
        float(jnp.asarray(y, jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:28s} {best*1e6:9.1f} us  {flop/best/1e12:7.1f} TOP/s",
          flush=True)


def main():
    bench_gemm("square-4096 (bm=bn=1024)", 4096, 4096, 4096)
    bench_gemm("square-4096 (bm=bn=512)", 4096, 4096, 4096, bm=512, bn=512)
    # channel-major conv GEMM: (O, 9C) x (9C, M)
    for c in (48, 96, 192):
        for bm in (512, 1024, 2048):
            bench_gemm(f"cm O={c} K={9*c} M=16384 bn={bm}",
                       c if c % 8 == 0 else c, 9 * c, 16384,
                       bm=c, bn=bm)
    # row-major per-tap: (M, C) x (C, O)
    for c in (192,):
        for bm in (1024, 2048, 4096):
            bench_gemm(f"rm M=16384 K={c} O={c} bm={bm}",
                       16384, c, c, bm=bm, bn=c)
    # K-heavy row-major patch GEMM: (M, 9C) x (9C, O)
    for c in (96, 192):
        bench_gemm(f"rm-patch M=16384 K={9*c} O={c}", 16384, 9 * c, c,
                   bm=2048, bn=c)


if __name__ == "__main__":
    main()
