#!/usr/bin/env python
"""Per-layer microbenchmark for the int8 deploy path on RepVGG-A0 shapes.

Fence-corrected (see tpu_timing.py).  For each conv layer shape, times
the *chained* deploy form — int8 codes in, pad + conv + fused
dequant/bias/relu/requant epilogue, int8 codes out — for:

  fp32    XLA conv fp32 + bias + relu                  (baseline)
  int8    XLA int8 conv -> int32 -> f32 epilogue -> int8   (the engine)
  rpconv  Pallas row-major dx-grouped kernel (3x3/s1 shapes only)

plus the one-off input-quantize cost.  This is the measurement that
decides the deploy engine (quant/deploy.py engine-choice note): XLA's
chained int8 form sustains 186–327 TOP/s on the stage shapes; rpconv is
exact but ~0.74x XLA, so XLA stays the engine.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tools.tpu_timing import time_scan  # noqa: E402

B = 512

# (H_in, C_in, C_out, stride, count) deploy-form RepVGG-A0 @224
SHAPES = [
    (224, 3, 48, 2, 1),      # stem
    (112, 48, 48, 2, 1),     # stage1.0
    (56, 48, 48, 1, 1),      # stage1.1
    (56, 48, 96, 2, 1),      # stage2.0
    (28, 96, 96, 1, 3),      # stage2.1-3
    (28, 96, 192, 2, 1),     # stage3.0
    (14, 192, 192, 1, 13),   # stage3.1-13
    (14, 192, 1280, 2, 1),   # stage4.0
]


def chained_int8(x, w, a, b, s):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=jnp.int8(-128))
    acc = jax.lax.conv_general_dilated(
        xp, w, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * a + b, 0.)
    return jnp.clip(jnp.round(y * 7.7 - 128), -128, 127).astype(jnp.int8)


def fp32_layer(x, w, b, s):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y + b, 0.)


def main():
    key = jax.random.PRNGKey(0)
    tot_i8 = tot_fp = 0.0
    for (h, ci, co, s, cnt) in SHAPES:
        k1, k2 = jax.random.split(jax.random.fold_in(key, h * ci))
        xi = jax.random.randint(k1, (B, h, h, ci), -128, 128,
                                jnp.int32).astype(jnp.int8)
        xf = jax.random.normal(k1, (B, h, h, ci))
        w = jax.random.randint(k2, (3, 3, ci, co), -128, 128,
                               jnp.int32).astype(jnp.int8)
        wf = jax.random.normal(k2, (3, 3, ci, co)) * 0.05
        a = jnp.abs(jax.random.normal(k1, (co,))) * 1e-3 + 1e-4
        b = jax.random.normal(k2, (co,))
        ho = h // s
        fl = 2 * B * ho * ho * 9 * ci * co

        t8 = time_scan(lambda x, w, a, b: chained_int8(x, w, a, b, s),
                       xi, w, a, b)
        tf = time_scan(lambda x, w, b: fp32_layer(x, w, b, s), xf, wf, b)
        tot_i8 += t8 * cnt
        tot_fp += tf * cnt
        line = (f"h{h:3d} {ci:4d}->{co:4d} s{s} x{cnt:2d}: "
                f"int8 {t8*1e3:7.3f} ms {fl/t8/1e12:6.1f}T | "
                f"fp32 {tf*1e3:7.3f} ms {fl/tf/1e12:6.1f}T")

        if s == 1 and jax.default_backend() != "cpu":
            from dlmc_quant_tpu.ops.pallas.rpconv import (
                hwio_to_dxg, int8_conv3x3_rm, rm_mask, to_rm)
            x_rm = to_rm(xi, -128, 1024)
            mask = rm_mask(B, h, h, 1024)
            wg = hwio_to_dxg(w)
            tp = time_scan(
                lambda xr, wg, a, b, m: int8_conv3x3_rm(
                    xr, wg, a, b, m, -128, c=ci, o=co, wp=h + 1,
                    bm=1024, relu=True),
                x_rm, wg, a, b, mask)
            line += f" | rpconv {tp*1e3:7.3f} ms {fl/tp/1e12:6.1f}T"
        print(line, flush=True)

    xq = jax.random.normal(key, (B, 224, 224, 3))
    tq = time_scan(lambda x: jnp.clip(jnp.round(x * 13.1 - 128), -128,
                                      127).astype(jnp.int8), xq)
    print(f"input quantize (224^2x3):  {tq*1e3:7.3f} ms")
    print(f"sum over isolated layers: int8 {tot_i8*1e3:.2f} ms "
          f"fp32 {tot_fp*1e3:.2f} ms  (whole-model chains run FASTER "
          f"than this sum: pad+quantize fuse into producers)")


if __name__ == "__main__":
    main()
