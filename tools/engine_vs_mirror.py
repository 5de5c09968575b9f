#!/usr/bin/env python
"""Interleaved timing: real int8 deploy engine vs a synthetic int8 XLA
chain ("mirror") with identical conv shapes, plus the fp32 engine.

All candidates run in ONE process with rounds interleaved so TPU-tunnel
throughput drift cancels; each candidate reports its best round.
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


def conv(x, w, s, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(s, s), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8
        else jnp.float32)


def quant(x):
    return jnp.clip(jnp.round(x * 25.0), -128, 127).astype(jnp.int8)


def mirror_chain(x, wis, head_w):
    for (ci, co, s), wi in zip(LAYERS, wis):
        xi = quant(x)
        if s == 1:
            xp = jnp.pad(xi, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         constant_values=jnp.int8(-3))
            acc = conv(xp, wi, s, pad="VALID")
        else:
            acc = conv(xi, wi, s)
        x = jnp.maximum(acc.astype(jnp.float32) * 1e-4, 0.0)
    x = jnp.mean(x, (1, 2))
    xi = quant(x)
    return jnp.dot(xi, head_w, preferred_element_type=jnp.int32
                   ).astype(jnp.float32) * 1e-4


def build_engine():
    from dlmc_quant_tpu.models import get_model
    from dlmc_quant_tpu.quant.config import scheme_from_dict
    from dlmc_quant_tpu.quant.deploy import prepare_deploy
    from dlmc_quant_tpu.quant.layers import calibrate

    scheme = scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "args": {"n_bits": 8, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
    })
    model = get_model("RepVGG_A0", num_classes=1000, deploy=True,
                      scheme=scheme)
    xc = jax.random.uniform(jax.random.PRNGKey(0), (8, 224, 224, 3),
                            jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), xc)
    variables = calibrate(model, variables, [xc])
    variables = prepare_deploy(model, variables, sample_input=xc)
    int8_fn = jax.jit(lambda v, x: model.apply(v, x, qmode="int"))
    fp_fn = jax.jit(lambda v, x: model.apply(v, x, qmode="fp"))
    return variables, int8_fn, fp_fn


def time_round(fn, *args):
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = fn(*args)
    float(jnp.sum(y.astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 224, 224, 3), jnp.float32)
    wis = []
    for ci, co, s in LAYERS:
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (3, 3, ci, co), jnp.float32) * 0.05
        wis.append(jnp.clip(jnp.round(w * 127 / 0.2), -127, 127
                            ).astype(jnp.int8))
    head_w = jnp.ones((1280, 1000), jnp.int8)

    variables, int8_fn, fp_fn = build_engine()

    cands = {
        "engine-int8": (int8_fn, (variables, x)),
        "engine-fp32": (fp_fn, (variables, x)),
        "mirror-int8": (jax.jit(mirror_chain), (x, wis, head_w)),
    }
    # compile + warm all
    for name, (fn, args) in cands.items():
        float(jnp.sum(fn(*args).astype(jnp.float32)))

    best = {k: 1e9 for k in cands}
    for rnd in range(2):
        for name, (fn, args) in cands.items():
            t = time_round(fn, *args)
            best[name] = min(best[name], t)
            print(f"round{rnd} {name:12s} {t*1e3:7.2f} ms  {B/t:8.0f} ips",
                  flush=True)
    print("--- best ---")
    for name, t in best.items():
        print(f"{name:12s} {t*1e3:7.2f} ms  {B/t:8.0f} ips")


if __name__ == "__main__":
    main()
