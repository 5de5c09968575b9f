#!/usr/bin/env python
"""Glue-cost ablation for the XLA int8 deploy chain (RepVGG-A0 shapes).

Variants (all one jit program, batch B, dependent-chained):
  fp32      fp32 conv + bias + relu                      (baseline)
  int-pad   real deploy path shape: quantize -> jnp.pad(zp) -> VALID
            int8 conv -> f32 dequant+bias+relu           (current engine)
  int-same  quantize -> SAME int8 conv (zero pad, wrong borders) ->
            dequant — upper bound with no pad copy
  int-corr  quantize -> SAME int8 conv + precomputed border-correction
            map (exact numerics, no pad copy)            (candidate)
  bf16-w8   quantize acts to int8 codes, convert codes to bf16, SAME
            bf16 conv with bf16 int-code weights -> dequant — exact
            int semantics on the bf16 MXU                (candidate)

The correction map exploits that the zero-point pad contribution at the
border is a constant per (h, w, o): corr = zp_real * s_w * (colsum -
visible_colsum(h, w)) where visible_colsum = conv(ones, |taps visible|).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 256

# RepVGG-A0 deploy @224: (cin, cout, stride)
LAYERS = (
    [(3, 48, 2)] +
    [(48, 48, 2)] + [(48, 48, 1)] * 1 +
    [(48, 96, 2)] + [(96, 96, 1)] * 3 +
    [(96, 192, 2)] + [(192, 192, 1)] * 13 +
    [(192, 1280, 2)]
)


def conv(x, w, s, pad="SAME", dt=None):
    if dt is not None:
        x, w = x.astype(dt), w.astype(dt)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(s, s), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8
        else jnp.float32)


def make_params(key):
    ws, wis = [], []
    for ci, co, s in LAYERS:
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (3, 3, ci, co), jnp.float32) * 0.05
        ws.append(w)
        wis.append(jnp.clip(jnp.round(w * 127 / 0.2), -127, 127
                            ).astype(jnp.int8))
    return ws, wis


S_IN, S_OUT = 25.0, 1e-4


def quant(x):
    return jnp.clip(jnp.round(x * S_IN), -128, 127).astype(jnp.int8)


def fp_chain(x, ws):
    for (ci, co, s), w in zip(LAYERS, ws):
        x = jnp.maximum(conv(x, w, s), 0.0)
    return jnp.mean(x, (1, 2))


def int_pad_chain(x, wis):
    for (ci, co, s), wi in zip(LAYERS, wis):
        xi = quant(x)
        if s == 1:
            xp = jnp.pad(xi, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         constant_values=jnp.int8(-3))   # nonzero zp code
            acc = conv(xp, wi, s, pad="VALID")
        else:
            acc = conv(xi, wi, s)
        x = jnp.maximum(acc.astype(jnp.float32) * S_OUT, 0.0)
    return jnp.mean(x, (1, 2))


def int_same_chain(x, wis):
    for (ci, co, s), wi in zip(LAYERS, wis):
        xi = quant(x)
        acc = conv(xi, wi, s)
        x = jnp.maximum(acc.astype(jnp.float32) * S_OUT, 0.0)
    return jnp.mean(x, (1, 2))


def make_corr_maps(wis, h0=224):
    """Precompute (1, H, W, O) border-correction maps per stride-1 layer."""
    maps = {}
    h = h0
    for li, (ci, co, s) in enumerate(LAYERS):
        h = -(-h // s)
        if s != 1:
            continue
        ones = jnp.ones((1, h, h, ci), jnp.float32)
        visible = conv(ones, jnp.abs(jnp.sign(
            wis[li].astype(jnp.float32))) * 0 + 1.0, 1)  # taps visible
        colsum = float(9.0)
        # per-channel weight colsum over taps actually missing:
        wsum = jnp.sum(wis[li].astype(jnp.float32), axis=(0, 1, 2))
        # fraction missing per pixel position (same for all channels)
        missing = (9.0 - visible[..., :1])  # (1,H,W,1) since all ci equal
        zp_real = -3.0
        maps[li] = zp_real * missing * (wsum / 9.0 * 9.0 / ci)[None, None,
                                                               None, :] * 0 \
            + zp_real * missing * jnp.mean(
                jnp.sum(wis[li].astype(jnp.float32), axis=2),
                axis=(0, 1))[None, None, None, :] / 9.0 * 0
        # NOTE: exact map needs per-position visible-tap weight sums;
        # for TIMING purposes any (1,H,W,O) add has identical cost:
        maps[li] = jnp.zeros((1, h, h, co), jnp.float32) + zp_real
    return maps


def int_corr_chain(x, wis, maps):
    for li, ((ci, co, s), wi) in enumerate(zip(LAYERS, wis)):
        xi = quant(x)
        acc = conv(xi, wi, s)
        y = acc.astype(jnp.float32) * S_OUT
        if li in maps:
            y = y + maps[li]
        x = jnp.maximum(y, 0.0)
    return jnp.mean(x, (1, 2))


def bf16_w8_chain(x, wis):
    for (ci, co, s), wi in zip(LAYERS, wis):
        xi = quant(x).astype(jnp.bfloat16)
        acc = conv(xi, wi.astype(jnp.bfloat16), s, dt=jnp.bfloat16)
        x = jnp.maximum(acc.astype(jnp.float32) * S_OUT, 0.0)
    return jnp.mean(x, (1, 2))


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
    maps = make_corr_maps(wis)

    for name, fn, args in [
        ("fp32    ", jax.jit(fp_chain), (x, ws)),
        ("int-pad ", jax.jit(int_pad_chain), (x, wis)),
        ("int-same", jax.jit(int_same_chain), (x, wis)),
        ("int-corr", jax.jit(lambda x, w: int_corr_chain(x, w, maps)),
         (x, wis)),
        ("bf16-w8 ", jax.jit(bf16_w8_chain), (x, wis)),
    ]:
        t = timeit(fn, *args)
        print(f"{name}  {t*1e3:8.2f} ms   {B/t:9.0f} ips")


if __name__ == "__main__":
    main()
