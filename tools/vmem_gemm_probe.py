#!/usr/bin/env python
"""Pure-MXU int8 GEMM rate for VMEM-resident operands, per shape.

Measures the raw MXU rate of a (m,k)x(k,n) int8 dot with operands
resident in VMEM — the ceiling any conv kernel built around that GEMM
geometry can reach.  Hoisting/CSE-proof without dependency hacks: each
in-kernel iteration contracts against a *different* weight buffer (and a
rolled copy of x across outer repeats), and all partial accumulators are
summed into the output.

Notes for this environment (axon remote-compile helper):
  * lax.fori_loop / while inside kernels do not compile — python loops.
  * int8 *scalar* broadcasts do not compile — vector ops only.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

VMEM_W_BUDGET = 6 * 2 ** 20      # weight buffers budget (bytes)
TARGET_DOTS = 8                  # dots per kernel call (compile time explodes with more)


def make_probe(m, k, n, n_bufs, n_rolls):
    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((m, n), jnp.int32)
        x = x_ref[...]
        for r in range(n_rolls):
            if r:
                # cheap twist; defeats CSE.  Mosaic can only rotate
                # 32-bit data → bitcast 4 int8 lanes into one int32.
                x = pltpu.bitcast(
                    pltpu.roll(pltpu.bitcast(x, jnp.int32), 32, 0),
                    jnp.int8)
            for j in range(n_bufs):
                acc += jax.lax.dot_general(
                    x, w_ref[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        o_ref[...] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
    )


def bench(m, k, n):
    n_bufs = max(1, min(8, VMEM_W_BUDGET // (k * n)))
    n_rolls = max(1, TARGET_DOTS // n_bufs)
    dots = n_bufs * n_rolls
    vmem = 2 * m * k + n_bufs * k * n + 4 * m * n
    if vmem > 110 * 2 ** 20:
        print(f"({m:5d},{k:5d})x({k:5d},{n:4d})  skipped (vmem)")
        return
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (m, k), -100, 100, jnp.int8)
    w = jax.random.randint(key, (n_bufs, k, n), -100, 100, jnp.int8)
    f = make_probe(m, k, n, n_bufs, n_rolls)
    SCAN = 32        # kernel launches per jit call: dispatch costs ~3 ms
    reps = -(-k // n)  # on the axon tunnel; a dependent-carry scan
                       # amortizes it away

    def scanned(x, w):
        def body(c, _):
            acc = f(c, w)
            big = (jnp.tile(acc, (1, reps))[:, :k] if reps > 1
                   else acc[:, :k])
            return c ^ (big >> 24).astype(jnp.int8), ()
        out, _ = jax.lax.scan(body, x, None, length=SCAN)
        return jnp.sum(out.astype(jnp.int32))

    fn = jax.jit(scanned)
    try:
        float(jnp.asarray(fn(x, w), jnp.float32))
    except Exception as e:
        print(f"({m:5d},{k:5d})x({k:5d},{n:4d})  FAILED {str(e)[:90]}")
        return
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = fn(x, w)
        float(jnp.asarray(y, jnp.float32))
        best = min(best, (time.perf_counter() - t0) / SCAN)
    tops = 2.0 * m * k * n * dots / best / 1e12
    print(f"({m:5d},{k:5d})x({k:5d},{n:4d})  {best/dots*1e6:8.2f} us/dot "
          f"{tops:7.1f} TOP/s  [{n_bufs}w x {n_rolls}r]", flush=True)


def main():
    import sys
    shapes = [
        (512, 512, 512),            # sanity square
        (1024, 1728, 512),          # big sanity
        (192, 1728, 1024),          # cm orientation (O rows)
        (256, 1728, 1024),          # cm, O padded to 256
        (1024, 1728, 192),          # rm orientation (O cols)
        (1024, 1728, 256),          # rm, O padded
        (1024, 864, 128),           # rm stage2 padded
        (192, 576, 1024),           # dy-decomposed cm
        (1024, 576, 192),           # dy-decomposed rm
    ]
    if len(sys.argv) > 1:           # probe single shape: m k n
        shapes = [tuple(int(a) for a in sys.argv[1:4])]
    for m, k, n in shapes:
        bench(m, k, n)


if __name__ == "__main__":
    main()
