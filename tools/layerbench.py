#!/usr/bin/env python
"""Per-layer microbenchmark for the int8 deploy path on RepVGG-A0 shapes.

For each conv layer shape, times:
  fp32   — XLA conv_general_dilated fp32
  bf16   — XLA conv in bf16
  int8x  — XLA conv int8->int32
  pallas — ops.pallas.qconv.int8_conv3x3 (stride-1 3x3 only)
  quant  — act_to_int8 + pad glue cost

Prints one line per (shape, impl) with ms and TOPs.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 256

# (H_in, C_in, C_out, stride) deploy-form RepVGG-A0 @224
SHAPES = [
    (224, 3, 48, 2),     # stem
    (112, 48, 48, 2),    # stage1.0
    (56, 48, 48, 1),     # stage1.1
    (56, 48, 96, 2),     # stage2.0
    (28, 96, 96, 1),     # stage2.1-3 (x3)
    (28, 96, 192, 2),    # stage3.0
    (14, 192, 192, 1),   # stage3.1-13 (x13)
    (14, 192, 1280, 2),  # stage4.0
]


def timeit(fn, *args, iters=20):
    y = fn(*args)
    jnp.sum(y if not isinstance(y, tuple) else y[0]).block_until_ready()
    float(jnp.sum(y if not isinstance(y, tuple) else y[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y if not isinstance(y, tuple) else y[0]))
    return (time.perf_counter() - t0) / iters


def conv_fn(dtype, acc):
    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), window_strides=(S, S),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)
    return f


def main():
    from dlmc_quant_tpu.ops.pallas.qconv import int8_conv3x3

    key = jax.random.PRNGKey(0)
    global S
    for (h, ci, co, s) in SHAPES:
        S = s
        x = jax.random.normal(key, (B, h, h, ci), jnp.float32)
        w = jax.random.normal(key, (3, 3, ci, co), jnp.float32) * 0.05
        flops = 2 * B * (h // s) ** 2 * 9 * ci * co
        rows = []
        t = timeit(conv_fn(jnp.float32, jnp.float32), x, w)
        rows.append(("fp32", t))
        t = timeit(conv_fn(jnp.bfloat16, jnp.float32), x, w)
        rows.append(("bf16", t))
        xi = jnp.clip(jnp.round(x * 10), -127, 127).astype(jnp.int8)
        wi = jnp.clip(jnp.round(w * 100), -127, 127).astype(jnp.int8)

        @jax.jit
        def xla_int(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, window_strides=(S, S), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
        t = timeit(xla_int, xi, wi)
        rows.append(("int8xla", t))
        if s == 1:
            xp = jnp.pad(xi, ((0, 0), (1, 1), (1, 1), (0, 0)))
            scale = jnp.full((co,), 0.01, jnp.float32)

            @jax.jit
            def pallas(x_, w_):
                return int8_conv3x3(x_, w_, scale)
            t = timeit(pallas, xp, wi)
            rows.append(("pallas", t))

            @jax.jit
            def quant_pad(x_):
                q = jnp.clip(jnp.round(x_ * 7.0), 0, 255) - 128
                return jnp.pad(q.astype(jnp.int8),
                               ((0, 0), (1, 1), (1, 1), (0, 0)),
                               constant_values=3)
            t = timeit(quant_pad, x)
            rows.append(("quantpad", t))
        for name, t in rows:
            print(f"h={h:3d} ci={ci:4d} co={co:4d} s={s} {name:9s} "
                  f"{t*1e3:7.3f} ms  {flops/t/1e12:6.1f} T")
        print()


if __name__ == "__main__":
    main()
