#!/usr/bin/env python
"""Ablation of the cmconv kernel: which part eats the time?"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def _rup(a, b):
    return -(-a // b) * b


def build(c, o, wp, bm, M, mode):
    cp = _rup(c, 32)
    ms = bm + 256

    def kern(x_hbm, w_hbm, a_ref, b_ref, mask_ref, out_ref,
             w_buf, strip, patches, sems, wsem):
        i = pl.program_id(0)
        nblk = pl.num_programs(0)
        interior = jnp.logical_and(i > 0, i < nblk - 1)

        def strip_dma(slot, blk):
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
            out_ref[:] = jnp.zeros((o, bm), jnp.int8)

        @pl.when(interior)
        def _():
            strip_dma(i % 2, i).wait()
            s = strip[i % 2]
            if mode != "nopatch":
                for dy in range(3):
                    for dx in range(3):
                        off = (dy - 1) * wp + (dx - 1)
                        if mode == "aligned":
                            off = 0
                        t = dy * 3 + dx
                        patches[t * cp:(t + 1) * cp, :] = \
                            s[:, 128 + off:128 + off + bm]
            acc = jax.lax.dot_general(
                w_buf[:], patches[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if mode == "noepi":
                out_ref[:] = (acc >> 24).astype(jnp.int8)
            else:
                y = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
                y = jnp.maximum(y, 0.0)
                q = jnp.clip(jnp.round(y), -128, 127)
                sel = mask_ref[:].astype(jnp.float32) > 0.5
                out_ref[:] = jnp.where(sel, q, 0.).astype(jnp.int8)

    return pl.pallas_call(
        kern,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((o, 1), lambda i: (0, 0)),
            pl.BlockSpec((o, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, bm), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((o, bm), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((o, M), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((o, 9 * cp), jnp.int8),
            pltpu.VMEM((2, cp, ms), jnp.int8),
            pltpu.VMEM((9 * cp, bm), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * o * 9 * c * M, bytes_accessed=2 * M * (c + o),
            transcendentals=0),
    )


def bench(c, o, wp, bm, n_img, img, mode):
    M = _rup(n_img * img + 2 * bm, bm)
    f = jax.jit(build(c, o, wp, bm, M, mode))
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (c, M), -128, 128, jnp.int32).astype(jnp.int8)
    w = jax.random.randint(key, (o, 9 * _rup(c, 32)), -128, 128,
                           jnp.int32).astype(jnp.int8)
    a = jnp.full((o, 1), 1e-3, jnp.float32)
    b = jnp.zeros((o, 1), jnp.float32)
    mask = jnp.ones((1, M), jnp.int8)
    R = 50

    @jax.jit
    def loop(x, w, a, b, mask):
        def body(carry, _):
            y = f(x, w, a, b, mask)
            return carry ^ y[0, 0], ()
        r, _ = jax.lax.scan(body, jnp.int8(0), None, length=R)
        return r

    int(loop(x, w, a, b, mask))
    t0 = time.perf_counter()
    int(loop(x, w, a, b, mask))
    dt = (time.perf_counter() - t0) / R
    fl = 2 * o * 9 * c * M
    print(f"c{c} o{o} bm{bm} {mode:8s}: {dt*1e3:7.3f} ms "
          f"{fl/dt/1e12:6.1f} T(gross)")


if __name__ == "__main__":
    for mode in ["full", "aligned", "nopatch", "noepi"]:
        bench(192, 192, 15, 512, 256, 225, mode)
    for mode in ["full", "aligned", "nopatch", "noepi"]:
        bench(96, 96, 29, 1024, 256, 841, mode)
