"""Canonical TPU timing on the axon tunnel — fence-aware.

On this environment ``block_until_ready`` does not synchronize; the only
fence is fetching a scalar from a result, and that round-trip costs
**~25 ms** of tunnel latency.  Any measurement that amortizes the fence
over too few iterations silently inflates per-iteration time:

    measured/iter = true/iter + 0.025 / R

At R=20 that is +1.25 ms/iter — which is how this repo's round-2 notes
came to claim XLA's int8 conv tops out at ~112 TOP/s when it actually
sustains 186–327 TOP/s on RepVGG stage shapes (fence-corrected, R>=160).
Every timing tool here must either use a large R or subtract FENCE_S.

Two helpers:

* ``time_dispatch(fn, *args)`` — times R independent dispatches and one
  final fence, subtracting FENCE_S.  Right for whole-model throughput
  (matches how a serving loop drives the chip).
* ``time_scan(step, *args)`` — wraps ``step`` in a lax.scan chain inside
  ONE jit program so per-dispatch host overhead is amortized too; right
  for single-op microbenchmarks.  Beware: isolated per-layer scans
  overstate chained-model cost — in a whole model XLA fuses each
  layer's pad+quantize into the producer's epilogue, so measure chains
  when chains are the question (see prefix-timing in git history).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

FENCE_S = 0.025   # measured scalar-fetch round-trip, axon tunnel


def fence(y) -> float:
    """Force completion of all queued device work; returns the scalar."""
    return float(jnp.sum(jnp.ravel(jnp.asarray(y))[:1].astype(jnp.float32)))


def time_dispatch(fn, *args, iters: int = 30, warmup: int = 3) -> float:
    """Seconds per call: ``iters`` queued dispatches + one fence."""
    for _ in range(warmup):
        y = fn(*args)
    fence(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0 - FENCE_S) / iters


def time_scan(step, *args, iters: int = 160) -> float:
    """Seconds per iteration of ``step(*args)`` chained in one program.

    ``step`` must return an array.  The body is made genuinely
    loop-variant by routing the first argument through an
    ``optimization_barrier`` together with the loop carry: the barrier's
    output depends on the carry, so XLA's while-loop invariant code
    motion cannot hoist ``step`` out of the loop (a sum-carry of the
    *result* alone does NOT prevent hoisting — the hoisted op's scalar
    can be re-added each iteration; earlier revisions of this tool had
    that defect).  Sanity-check any suspicious number by confirming
    measured time scales ~linearly in ``iters``.  args are passed as
    jit arguments (never captured — large captured constants blow up
    the remote-compile request on the tunnel).
    """
    @jax.jit
    def loop(*a):
        def body(c, _):
            a0, cc = jax.lax.optimization_barrier((a[0], c))
            y = step(a0, *a[1:])
            return cc + jnp.ravel(y)[0].astype(jnp.float32), ()
        r, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return r

    fence(loop(*args))
    t0 = time.perf_counter()
    fence(loop(*args))
    return (time.perf_counter() - t0 - FENCE_S) / iters
