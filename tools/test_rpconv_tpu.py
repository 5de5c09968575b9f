#!/usr/bin/env python
"""TPU-side correctness + perf check for the row-major dx-grouped conv."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from dlmc_quant_tpu.ops.pallas.rpconv import (
    from_rm, hwio_to_dxg, int8_conv3x3_rm, rm_mask, to_rm)


def ref_conv(x_codes, w_int, a, b, relu, qmin, qmax, zp):
    xp = jnp.pad(x_codes, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=jnp.asarray(zp, jnp.int8))
    acc = jax.lax.conv_general_dilated(
        xp, w_int, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * a.reshape(1, 1, 1, -1) + b.reshape(
        1, 1, 1, -1)
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), qmin, qmax).astype(jnp.int8)


def check(n, h, w, c, o, relu=True, bm=1024, bench=False):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.randint(k1, (n, h, w, c), -128, 128, jnp.int32
                           ).astype(jnp.int8)
    wk = jax.random.randint(k2, (3, 3, c, o), -128, 128, jnp.int32
                            ).astype(jnp.int8)
    a = jnp.abs(jax.random.normal(k1, (o,))) * 1e-3 + 1e-4
    b = jax.random.normal(k2, (o,)) * 2.0
    zp = -128 if relu else 0

    want = ref_conv(x, wk, a, b, relu, -128, 127, zp)

    x_rm = to_rm(x, zp, bm)
    mask = rm_mask(n, h, w, bm)
    wg = hwio_to_dxg(wk)
    out_rm = int8_conv3x3_rm(x_rm, wg, a, b, mask, zp,
                             c=c, o=o, wp=w + 1, bm=bm, relu=relu)
    got = from_rm(out_rm, n, h, w, o, bm)
    diff = jnp.max(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32)))
    hp, wp = h + 1, w + 1
    ow = out_rm.shape[1]
    body = out_rm[bm:bm + n * hp * wp].reshape(n, hp, wp, ow)
    pads_ok = bool(jnp.all(body[:, h, :, :o] == zp) and
                   jnp.all(body[:, :, w, :o] == zp))
    print(f"n{n} h{h} c{c} o{o} relu={relu} bm{bm}: maxdiff={int(diff)} "
          f"pads_ok={pads_ok}", flush=True)
    assert int(diff) == 0 and pads_ok, "mismatch"

    if bench:
        R = 50
        @jax.jit
        def loop(x_rm, wg, a, b, mask):
            def body(carry, _):
                y = int8_conv3x3_rm(x_rm, wg, a, b, mask, zp,
                                    c=c, o=o, wp=w + 1, bm=bm, relu=relu)
                return carry ^ y[0, 0], ()
            r, _ = jax.lax.scan(body, jnp.int8(0), None, length=R)
            return r
        int(loop(x_rm, wg, a, b, mask))
        t0 = time.perf_counter()
        int(loop(x_rm, wg, a, b, mask))
        dt = (time.perf_counter() - t0) / R
        fl = 2 * n * h * w * 9 * c * o
        print(f"   {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} Teff", flush=True)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--perf-only", action="store_true")
    args = p.parse_args()
    if not args.perf_only:
        check(2, 14, 14, 192, 192)
        check(2, 14, 14, 192, 192, relu=False)
        check(2, 28, 28, 96, 96)
        check(2, 56, 56, 48, 48)
        check(3, 7, 7, 64, 128)
    print("-- perf --", flush=True)
    check(256, 14, 14, 192, 192, bench=True)
    check(256, 28, 28, 96, 96, bench=True)
    check(256, 56, 56, 48, 48, bench=True)
    check(256, 14, 14, 192, 192, bm=2048, bench=True)
    check(512, 14, 14, 192, 192, bench=True)
