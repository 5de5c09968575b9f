#!/usr/bin/env python
"""Morph the fast int8 mirror chain into the engine, one feature at a
time, to find which engine feature costs time on TPU.

Variants (cumulative):
  m0  plain mirror (scalar scale, symmetric acts, const pad, 3x3 stem)
  m1  + per-channel w_scale and bias_eff epilogue
  m2  + act offset/inv-scale/shift (unsigned [0,255] grid w/ -128)
  m3  + traced pad value (int8 scalar arg instead of literal)
  m4  + s2d stem
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 256
ITERS = 20

LAYERS = (
    [(3, 48, 2)] +
    [(48, 48, 2)] + [(48, 48, 1)] * 1 +
    [(48, 96, 2)] + [(96, 96, 1)] * 3 +
    [(96, 192, 2)] + [(192, 192, 1)] * 13 +
    [(192, 1280, 2)]
)


def conv(x, w, s, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(s, s), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def s2d_conv(x_i8, w_int, pv):
    n, h, w, c = x_i8.shape
    o = w_int.shape[-1]
    xp = jnp.pad(x_i8, ((0, 0), (0, 2), (0, 2), (0, 0)),
                 constant_values=pv)
    hp, wp = h + 2, w + 2
    xs = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)
    w4 = jnp.pad(w_int, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w2 = w4.reshape(2, 2, 2, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(2, 2, 4 * c, o)
    return conv(xs, w2, 1, "VALID")


def make_chain(per_channel, act_affine, traced_pad, s2d):
    def chain(x, wis, scales, biases, pad_val):
        pv = pad_val if traced_pad else jnp.int8(-3)
        for li, ((ci, co, s), wi) in enumerate(zip(LAYERS, wis)):
            if act_affine == "folded":
                # offset+shift folded into one multiply-add
                xi = jnp.clip(jnp.round(x * 25.0 + (-0.25 - 128.0)),
                              -128, 127).astype(jnp.int8)
            elif act_affine:
                xi = (jnp.clip(jnp.round((x - 0.01) * 25.0), 0, 255)
                      - 128).astype(jnp.int8)
            else:
                xi = jnp.clip(jnp.round(x * 25.0), -128, 127
                              ).astype(jnp.int8)
            if li == 0 and s2d:
                acc = s2d_conv(xi, wi, pv)
            elif s == 1:
                xp = jnp.pad(xi, ((0, 0), (1, 1), (1, 1), (0, 0)),
                             constant_values=pv)
                acc = conv(xp, wi, s, "VALID")
            else:
                acc = conv(xi, wi, s, "SAME")
            if per_channel:
                y = (acc.astype(jnp.float32) * scales[li].reshape(1, 1, 1, -1)
                     + biases[li])
            else:
                y = acc.astype(jnp.float32) * 1e-4
            x = jnp.maximum(y, 0.0)
        x = jnp.mean(x, (1, 2))
        return x
    return chain


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 224, 224, 3), jnp.float32)
    wis, scales, biases = [], [], []
    for ci, co, s in LAYERS:
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (3, 3, ci, co), jnp.float32) * 0.05
        wis.append(jnp.clip(jnp.round(w * 127 / 0.2), -127, 127
                            ).astype(jnp.int8))
        scales.append(jnp.full((co,), 1e-4, jnp.float32))
        biases.append(jnp.zeros((co,), jnp.float32))
    pad_val = jnp.int8(-3)

    variants = {
        "m0 mirror": (False, False, False, False),
        "m2 +affine": (True, True, False, False),
        "m2f folded": (True, "folded", False, False),
        "m2f+tpad": (True, "folded", True, False),
        "m2f+s2d": (True, "folded", True, True),
    }
    fns = {}
    for name, flags in variants.items():
        fn = jax.jit(make_chain(*flags))
        float(jnp.sum(fn(x, wis, scales, biases, pad_val)))  # compile
        fns[name] = fn

    best = {k: 1e9 for k in fns}
    for rnd in range(2):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                y = fn(x, wis, scales, biases, pad_val)
            float(jnp.sum(y))
            t = (time.perf_counter() - t0) / ITERS
            best[name] = min(best[name], t)
            print(f"round{rnd} {name:10s} {t*1e3:7.2f} ms  {B/t:8.0f} ips",
                  flush=True)
    print("--- best ---")
    for name, t in best.items():
        print(f"{name:10s} {t*1e3:7.2f} ms  {B/t:8.0f} ips")


if __name__ == "__main__":
    main()
