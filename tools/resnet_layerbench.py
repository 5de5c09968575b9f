#!/usr/bin/env python
"""Per-layer int8 audit on ResNet-50 deploy shapes (fence-corrected).

Where do ResNet-50's TOP/s go?  Unlike RepVGG's uniform 3×3 stacks,
ResNet-50 is 1×1-heavy (2/3 of its convs) with low arithmetic intensity
per byte of activation traffic, plus a residual boundary per block.
This tool times, at batch ``B``:

  fp32      XLA fp32 conv + bias + relu (baseline)
  int8      chained int8 form: codes in → pad → conv → fused epilogue
            → codes out (the deploy engine)
  add_f32   unchained residual boundary: two f32 epilogues + add + relu
            + requantize (what qmode='int' pays per block)
  add_i8    chained boundary: fold_sum over int32 acc + int8 shortcut
            codes → int8 codes (what QBlockOutput emits in 'intc')

Usage:  python tools/resnet_layerbench.py [batch]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tools.tpu_timing import time_scan  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

# (H_in, C_in, C_out, k, stride, count) — resnet50 @224 deploy form
SHAPES = [
    (224, 3, 64, 7, 2, 1),        # stem
    (56, 64, 64, 1, 1, 3),        # stage1 conv1 (+downsample-ish)
    (56, 64, 64, 3, 1, 3),        # stage1 conv2
    (56, 64, 256, 1, 1, 4),       # stage1 conv3 + ds
    (56, 256, 128, 1, 1, 1),      # stage2.0 conv1
    (56, 128, 128, 3, 2, 1),      # stage2.0 conv2
    (28, 128, 512, 1, 1, 5),      # stage2 conv3 + ds
    (28, 512, 128, 1, 1, 3),      # stage2.* conv1
    (28, 128, 128, 3, 1, 3),      # stage2.* conv2
    (28, 512, 256, 1, 1, 1),      # stage3.0 conv1
    (28, 256, 256, 3, 2, 1),      # stage3.0 conv2
    (14, 256, 1024, 1, 1, 7),     # stage3 conv3 + ds
    (14, 1024, 256, 1, 1, 5),     # stage3.* conv1
    (14, 256, 256, 3, 1, 5),      # stage3.* conv2
    (14, 1024, 512, 1, 1, 1),     # stage4.0 conv1
    (14, 512, 512, 3, 2, 1),      # stage4.0 conv2
    (7, 512, 2048, 1, 1, 4),      # stage4 conv3 + ds
    (7, 2048, 512, 1, 1, 2),      # stage4.* conv1
    (7, 512, 512, 3, 1, 2),       # stage4.* conv2
]

# residual boundary tensors: (H, C, blocks)
BOUNDARIES = [(56, 256, 3), (28, 512, 4), (14, 1024, 6), (7, 2048, 3)]


def make_int8_layer(s, p):
    def int8_layer(x, w, a, b):
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                     constant_values=jnp.int8(-128))
        acc = jax.lax.conv_general_dilated(
            xp, w, (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * a + b, 0.)
        return jnp.clip(jnp.round(y * 7.7 - 128), -128,
                        127).astype(jnp.int8)
    return int8_layer


def make_fp32_layer(s, p):
    def fp32_layer(x, w, b):
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, w, (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y + b, 0.)
    return fp32_layer


def add_f32(acc_t, acc_s, a, b):
    y = acc_t.astype(jnp.float32) * a + b
    r = acc_s.astype(jnp.float32) * a + b
    v = jnp.maximum(y + r, 0.)
    return jnp.clip(jnp.round(v * 7.7 - 128), -128, 127).astype(jnp.int8)


def add_i8(acc_t, q_s, a, b):
    tot = acc_t.astype(jnp.float32) * a + q_s.astype(jnp.float32) * 0.11 + b
    return jnp.clip(jnp.round(tot), -128, 127).astype(jnp.int8)


def main():
    key = jax.random.PRNGKey(0)
    print(f"batch={B}  (TOP/s = int8 MAC throughput, fence-corrected)")
    tot_fp = tot_i8 = 0.0
    for (h, ci, co, k, s, count) in SHAPES:
        x8 = jax.random.randint(key, (B, h, h, ci), -128, 128, jnp.int8)
        w8 = jax.random.randint(key, (k, k, ci, co), -127, 128, jnp.int8)
        xf = x8.astype(jnp.float32)
        wf = w8.astype(jnp.float32)
        a = jnp.abs(jax.random.normal(key, (1, 1, 1, co))) * 1e-3
        b = jax.random.normal(key, (1, 1, 1, co))
        p = k // 2
        ho = h // s
        macs = B * ho * ho * co * k * k * ci
        t8 = time_scan(make_int8_layer(s, p), x8, w8, a, b, iters=48)
        tf = time_scan(make_fp32_layer(s, p), xf, wf, b, iters=48)
        tot_fp += tf * count
        tot_i8 += t8 * count
        print(f"{h:4d} {ci:5d}->{co:5d} k{k} s{s} x{count:2d}: "
              f"fp32 {tf*1e3:7.3f} ms  int8 {t8*1e3:7.3f} ms  "
              f"({2*macs/t8/1e12:6.1f} TOP/s)  speedup {tf/t8:4.2f}x")
    print(f"conv totals: fp32 {tot_fp*1e3:.2f} ms  int8 {tot_i8*1e3:.2f} ms"
          f"  ({tot_fp/tot_i8:.2f}x)")
    tot_f = tot_q = 0.0
    for (h, c, count) in BOUNDARIES:
        acc_t = jax.random.randint(key, (B, h, h, c), -(2**18), 2**18,
                                   jnp.int32)
        acc_s = jax.random.randint(key, (B, h, h, c), -(2**18), 2**18,
                                   jnp.int32)
        q_s = jax.random.randint(key, (B, h, h, c), -128, 128, jnp.int8)
        a = jnp.abs(jax.random.normal(key, (1, 1, 1, c))) * 1e-3
        b = jax.random.normal(key, (1, 1, 1, c))
        t_f = time_scan(add_f32, acc_t, acc_s, a, b, iters=48)
        t_q = time_scan(add_i8, acc_t, q_s, a, b, iters=48)
        tot_f += t_f * count
        tot_q += t_q * count
        print(f"boundary {h:3d}x{h:<3d} C={c:5d} x{count}: "
              f"f32-add {t_f*1e3:7.3f} ms  chained {t_q*1e3:7.3f} ms  "
              f"({t_f/t_q:4.2f}x)")
    print(f"boundary totals: f32 {tot_f*1e3:.2f} ms  "
          f"chained {tot_q*1e3:.2f} ms")


if __name__ == "__main__":
    main()
