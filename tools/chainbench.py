#!/usr/bin/env python
"""Whole-chain experiment: RepVGG-A0 deploy conv stack in different
execution strategies, timed as ONE jit program (dispatch amortized).

  fp32      conv fp32 + bias + relu
  bf16      conv bf16 (f32 accum) + bias + relu
  int8-f32  int8 conv -> f32 dequant+bias+relu -> requantize next layer
  int8-i8   int8 conv -> fused requant epilogue (activations stay int8)

The int8-i8 variant is the "real engine" candidate: activation HBM
traffic is 1 byte/val everywhere and requant folds into the epilogue.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 256

# RepVGG-A0 deploy @224: (cin, cout, stride) per conv
LAYERS = (
    [(3, 48, 2)] +
    [(48, 48, 2)] + [(48, 48, 1)] * 1 +
    [(48, 96, 2)] + [(96, 96, 1)] * 3 +
    [(96, 192, 2)] + [(192, 192, 1)] * 13 +
    [(192, 1280, 2)]
)


def conv(x, w, s, dt):
    return jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), window_strides=(s, s), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def iconv(x_i8, w_i8, s):
    return jax.lax.conv_general_dilated(
        x_i8, w_i8, window_strides=(s, s), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def make_params(key):
    ws, wis = [], []
    for ci, co, s in LAYERS:
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (3, 3, ci, co), jnp.float32) * 0.05
        ws.append(w)
        wis.append(jnp.clip(jnp.round(w * 127 / 0.2), -127, 127
                            ).astype(jnp.int8))
    return ws, wis


def fp_chain(dt):
    def f(x, ws):
        for (ci, co, s), w in zip(LAYERS, ws):
            x = jnp.maximum(conv(x, w, s, dt), 0.0)
        return jnp.mean(x, (1, 2))
    return jax.jit(f)


@jax.jit
def int8_f32_chain(x, wis):
    # fp32 activations in HBM between layers; quantize before each conv
    for (ci, co, s), wi in zip(LAYERS, wis):
        xi = jnp.clip(jnp.round(x * 25.0), -127, 127).astype(jnp.int8)
        acc = iconv(xi, wi, s)
        x = jnp.maximum(acc.astype(jnp.float32) * 1e-4, 0.0)
    return jnp.mean(x, (1, 2))


@jax.jit
def int8_i8_chain(x, wis):
    # activations stay int8; requant fused into the conv epilogue
    xi = jnp.clip(jnp.round(x * 25.0), -127, 127).astype(jnp.int8)
    for (ci, co, s), wi in zip(LAYERS, wis):
        acc = iconv(xi, wi, s)
        # fused epilogue: scale + relu + requant to next layer's grid
        y = jnp.maximum(acc, 0)                        # relu in int32
        xi = jnp.clip((y >> 7), 0, 127).astype(jnp.int8)
    return jnp.mean(xi.astype(jnp.float32), (1, 2))


def timeit(fn, *args, iters=20):
    y = fn(*args)
    float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    ws, wis = make_params(key)
    x = jax.random.normal(key, (B, 224, 224, 3), jnp.float32)

    for name, fn, args in [
        ("fp32    ", fp_chain(jnp.float32), (x, ws)),
        ("bf16    ", fp_chain(jnp.bfloat16), (x, ws)),
        ("int8-f32", int8_f32_chain, (x, wis)),
        ("int8-i8 ", int8_i8_chain, (x, wis)),
    ]:
        t = timeit(fn, *args)
        print(f"{name}  {t*1e3:8.2f} ms   {B/t:9.0f} ips")


if __name__ == "__main__":
    main()
