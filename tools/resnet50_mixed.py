#!/usr/bin/env python
"""ResNet-50 int8 throughput: attack the stage-1 underutilization.

The per-layer audit (tools/resnet_layerbench.py) shows the 56×56/64-ch
stage-1 convs can't fill the int8 MXU tiles and run at/below fp32 in
isolation.  This measures, fence-corrected, on the real chip:

  A. all-int8 chained (the r4 bench configuration), batch 256
  B. all-int8 chained, batch 512 (fill tiles with batch)
  C. mixed plan: stage-1 (layer1_*) convs weight-only → bf16 MXU path,
     stages 2-4 int8 chained (config-driven via override_options)
  D. fp32 reference at each batch

Usage: python tools/resnet50_mixed.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.deploy import (  # noqa: E402
    make_serving_fn, prepare_deploy,
)
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402

ITERS, WARMUP, ROUNDS = 20, 3, 3
FENCE_S = 0.025


def _measure_fence():
    global FENCE_S
    y = jnp.zeros((1,), jnp.float32) + 1.0
    float(jnp.sum(y))
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(y))
        samples.append(time.perf_counter() - t0)
    FENCE_S = min(samples)


def one_round(fn, x, iters=ITERS):
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    float(jnp.sum(y))
    return x.shape[0] * iters / max(time.perf_counter() - t0 - FENCE_S,
                                    1e-4)


def bench(fn, x):
    float(jnp.sum(fn(x)))
    for _ in range(WARMUP):
        y = fn(x)
    float(jnp.sum(y))
    return max(one_round(fn, x) for _ in range(ROUNDS))


def scheme(mixed_stage1: bool = False):
    d = {
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "args": {"n_bits": 8, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
    }
    if mixed_stage1:
        # stage-1 convs + their block-output quantizers lose input
        # quantization -> QConv takes the weight-only bf16 path and
        # QBlockOutput passes through (f32/bf16 boundary)
        d["override_options"] = [
            {"layers": [r"layer1_\d+\."],
             "options": {"input": {"enable": False}}}]
    return scheme_from_dict(d)


def prep(batch, mixed):
    model = get_model("resnet50", num_classes=1000, scheme=scheme(mixed),
                      deploy=True)
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (batch, 224, 224, 3), jnp.float32)
    xc = x[:8]
    v = jax.jit(model.init)(jax.random.PRNGKey(1), xc)
    v = calibrate(model, v, [xc])
    v = prepare_deploy(model, v, sample_input=xc)
    return model, v, x


def main():
    _measure_fence()
    print(f"fence {FENCE_S * 1e3:.1f} ms")
    for batch in (256, 512):
        for mixed in (False, True):
            try:
                model, v, x = prep(batch, mixed)
                best = {}
                for qm in ("intc", "int"):
                    fn = make_serving_fn(model, v, qmode=qm)
                    best[qm] = bench(fn, x)
                fp = bench(make_serving_fn(model, v, qmode="fp"), x)
                tag = "mixed-s1-bf16" if mixed else "all-int8"
                print(f"batch {batch} {tag:14s} intc={best['intc']:8.0f} "
                      f"int={best['int']:8.0f} fp32={fp:8.0f} img/s "
                      f"(best ratio {max(best.values()) / fp:.2f}x)",
                      flush=True)
            except Exception as e:
                print(f"batch {batch} mixed={mixed} failed: {e!r}"[:200],
                      flush=True)


if __name__ == "__main__":
    main()
