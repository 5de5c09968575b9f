#!/usr/bin/env python
"""Measure the chip's GEMM ceiling for int8 vs bf16 via loop-carried scans.

Each variant runs a lax.scan whose carry feeds the next matmul (no
hoisting possible), timed by fetching one scalar. Reports TOP/s
(2*M*N*K*iters / t). Decides whether a 2x int8 MXU mode exists worth
chasing with a Pallas kernel.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M = N = K = 4096
ITERS = 64


def s8_scan(x, w):
    def body(c, _):
        y = lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        # cheap dependent transform back to int8 (keeps values bounded)
        c2 = (y >> 8).astype(jnp.int8)
        return c2, ()
    out, _ = lax.scan(body, x, None, length=ITERS)
    return jnp.sum(out.astype(jnp.int32))


def bf16_scan(x, w):
    def body(c, _):
        y = lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        c2 = (y * 1e-3).astype(jnp.bfloat16)
        return c2, ()
    out, _ = lax.scan(body, x, None, length=ITERS)
    return jnp.sum(out.astype(jnp.float32))


def u8s8_scan(x, w):
    def body(c, _):
        y = lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        c2 = (y >> 8).astype(jnp.uint8)
        return c2, ()
    out, _ = lax.scan(body, x.astype(jnp.uint8), None, length=ITERS)
    return jnp.sum(out.astype(jnp.int32))


def time_one(fn, *args):
    y = fn(*args)          # compile+warm
    float(jnp.asarray(y, jnp.float32))
    t0 = time.perf_counter()
    y = fn(*args)
    float(jnp.asarray(y, jnp.float32))
    return time.perf_counter() - t0


def main():
    key = jax.random.PRNGKey(0)
    xi = jax.random.randint(key, (M, K), -100, 100, jnp.int8)
    wi = jax.random.randint(key, (K, N), -100, 100, jnp.int8)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    wb = jax.random.normal(key, (K, N), jnp.bfloat16)

    fns = {
        "s8xs8": (jax.jit(s8_scan), (xi, wi)),
        "u8xs8": (jax.jit(u8s8_scan), (xi, wi)),
        "bf16": (jax.jit(bf16_scan), (xb, wb)),
    }
    results = {k: [] for k in fns}
    for rnd in range(3):
        for name, (fn, args) in fns.items():
            t = time_one(fn, *args)
            tops = 2.0 * M * N * K * ITERS / t / 1e12
            results[name].append(tops)
            print(f"round{rnd} {name:6s} {t*1e3:8.1f} ms  {tops:7.1f} TOP/s",
                  flush=True)
    print("--- best ---")
    for name, v in results.items():
        print(f"{name:6s} {max(v):7.1f} TOP/s")


if __name__ == "__main__":
    main()
