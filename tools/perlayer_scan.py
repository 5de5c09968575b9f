#!/usr/bin/env python
"""Dispatch-free per-layer conv timings: each layer shape is timed as a
dependent lax.scan chain inside ONE jit program (R iterations), so the
axon tunnel's ~1.5 ms dispatch floor is amortized away.

Reports ms/iter and effective TFLOP/s for fp32 / bf16 / int8 variants of
every RepVGG-A0 deploy layer shape, plus a space-to-depth variant of the
stem.  This is the data that says where the whole-chain 6.2 ms goes.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 256
R = 20

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


def scan_time(conv_step, x0, w, flops):
    @jax.jit
    def loop(x, w):
        def body(x, _):
            return conv_step(x, w), ()
        y, _ = jax.lax.scan(body, x, None, length=R)
        return y
    y = loop(x0, w)
    float(jnp.sum(y.astype(jnp.float32)[0, :2]))
    t0 = time.perf_counter()
    y = loop(x0, w)
    float(jnp.sum(y.astype(jnp.float32)[0, :2]))
    dt = (time.perf_counter() - t0) / R
    return dt, flops / dt / 1e12


def main():
    key = jax.random.PRNGKey(0)
    total = {"fp32": 0.0, "bf16": 0.0, "int8": 0.0}
    for (h, ci, co, s, cnt) in SHAPES:
        ho = -(-h // s)
        flops = 2 * B * ho * ho * 9 * ci * co
        w = jax.random.normal(key, (3, 3, ci, co), jnp.float32) * 0.05
        wi = jnp.clip(jnp.round(w * 600), -127, 127).astype(jnp.int8)
        x = jax.random.normal(key, (B, h, h, ci), jnp.float32)
        xi = jnp.clip(jnp.round(x * 30), -127, 127).astype(jnp.int8)

        # the carry stays input-shaped; the output feeds back through a
        # single-element update so XLA can't dead-code the conv
        def fp_step(x, w, s=s):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return x.at[0, 0, 0, 0].add(
                jnp.tanh(y[0, 0, 0, 0]).astype(x.dtype) * 1e-6)

        def int_step(x, w, s=s):
            acc = jax.lax.conv_general_dilated(
                x, w, (s, s), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return x.at[0, 0, 0, 0].set(
                x[0, 0, 0, 0] ^ (acc[0, 0, 0, 0] & 1).astype(jnp.int8))

        t_fp, r_fp = scan_time(fp_step, x, w, flops)
        t_bf, r_bf = scan_time(
            fp_step, x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), flops)
        t_i8, r_i8 = scan_time(int_step, xi, wi, flops)
        print(f"h{h:4d} {ci:4d}->{co:4d} s{s} x{cnt:2d}: "
              f"fp32 {t_fp*1e3:7.3f} ms {r_fp:6.1f}T | "
              f"bf16 {t_bf*1e3:7.3f} ms {r_bf:6.1f}T | "
              f"int8 {t_i8*1e3:7.3f} ms {r_i8:6.1f}T")
        total["fp32"] += cnt * t_fp
        total["bf16"] += cnt * t_bf
        total["int8"] += cnt * t_i8
    print("sum over layers:",
          " ".join(f"{k} {v*1e3:.2f} ms" for k, v in total.items()))

    # space-to-depth stem variant: 3x3 s2 on (224,3) == 4x4 s2 on
    # (224,3) zero-extended == 2x2 s1 conv on s2d(2) input (112,12)
    x = jax.random.normal(key, (B, 224, 224, 3), jnp.float32)
    w4 = jax.random.normal(key, (4, 4, 3, 48), jnp.float32) * 0.05

    def s2d_stem(x, w4):
        # s2d(2): (B,224,224,3) -> (B,112,112,12)
        b, h, wdt, c = x.shape
        xs = x.reshape(b, h // 2, 2, wdt // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h // 2, wdt // 2, 4 * c)
        # 2x2 s1 conv with rearranged weights (4,4,3,48)->(2,2,12,48)
        wr = w4.reshape(2, 2, 2, 2, 3, 48).transpose(
            0, 2, 1, 3, 4, 5).reshape(2, 2, 12, 48)
        y = jax.lax.conv_general_dilated(
            xs, wr, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return x.at[0, 0, 0, 0].add(jnp.tanh(y[0, 0, 0, 0]) * 1e-6)

    flops = 2 * B * 112 * 112 * 16 * 3 * 48
    t, r = scan_time(s2d_stem, x, w4, flops)
    print(f"s2d-stem (2x2s1 on 112x112x12): {t*1e3:7.3f} ms {r:6.1f}T")


if __name__ == "__main__":
    main()
