#!/usr/bin/env python
"""Headline benchmark: INT8 images/sec/chip on RepVGG-A0 (deploy form).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip",
     "vs_baseline": N}

``vs_baseline`` is the speedup of the int8 path over the same model's
FP32 forward on the same chip (the reference publishes no numbers —
BASELINE.json "published" is {} — so FP32-on-same-hardware is the
baseline the int8 engine must beat).

Timing notes: on the axon TPU tunnel ``block_until_ready`` does not
synchronize; we queue ``iters`` dependent-free forwards and force
completion by fetching a scalar from the last result (device executes
in-order), which bounds throughput correctly.  The scalar fetch itself
costs ~25 ms of tunnel round-trip, subtracted from each round.

Dispatch: both paths run in serving form — the weights are captured in
the jitted program (quant/deploy.py:make_serving_fn) because passing
the ~400-leaf variables pytree per call costs ~7 ms of host-side
marshalling on the tunnel.  The fp32 baseline additionally measures the
arg-passing form and takes whichever is faster: with fp32 weights the
tunnel re-stages large captured constants per call, making the captured
form *slower* for that path (measured 30k vs 40k img/s) — the baseline
must not be sandbagged by our dispatch choice.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

BATCH = 512   # measured ~20% faster than 256 on the v5e chip (better
              # MXU utilization on the 14x14 stages); 1024 adds little
              # and doubles compile time
ITERS = 30
WARMUP = 3
ROUNDS = 3


FENCE_S = 0.025   # measured scalar-fetch round-trip on the tunnel


def _one_round(fn, x, iters=ITERS):
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    float(jnp.sum(y))  # fence: forces all queued work to finish
    return x.shape[0] * iters / (time.perf_counter() - t0 - FENCE_S)


def _throughput_pair(fn_a, fn_b, x):
    """Interleaved best-of-ROUNDS for two programs: the TPU tunnel's
    throughput drifts +-15% across minutes, so alternating rounds and
    taking each side's best keeps the ratio honest."""
    for fn in (fn_a, fn_b):            # compile + warm
        float(jnp.sum(fn(x)))
        for _ in range(WARMUP):
            y = fn(x)
        float(jnp.sum(y))
    best_a = best_b = 0.0
    for _ in range(ROUNDS):
        best_a = max(best_a, _one_round(fn_a, x))
        best_b = max(best_b, _one_round(fn_b, x))
    return best_a, best_b


def _bench_model(name: str, batch: int, **model_kw):
    from dlmc_quant_tpu.models import get_model
    from dlmc_quant_tpu.quant.config import scheme_from_dict
    from dlmc_quant_tpu.quant.deploy import make_serving_fn, prepare_deploy
    from dlmc_quant_tpu.quant.layers import calibrate

    scheme = scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "args": {"n_bits": 8, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
    })
    model = get_model(name, num_classes=1000, scheme=scheme, **model_kw)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                           jnp.float32)
    xc = x[:8]
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), xc)
    variables = calibrate(model, variables, [xc])
    variables = prepare_deploy(model, variables, sample_input=xc)

    # int8: fastest of plain 'int' and the chained int8-resident 'intc'
    # (folded relu+requant boundaries, quant/chain.py); both are exact
    # deploy paths, 'intc' saves ~1/3 of the VPU epilogue ops
    int_fns = []
    for qm in ("intc", "int"):
        try:
            fn = make_serving_fn(model, variables, qmode=qm)
            float(jnp.sum(fn(x)))
            int_fns.append(fn)
        except Exception:          # model without intc support
            pass
    int8_fn = max(int_fns, key=lambda f: _one_round(f, x, 8))
    # fp32 baseline: fastest of the two dispatch forms (see module doc)
    fp_cap = make_serving_fn(model, variables, qmode="fp")
    fp_arg_ = jax.jit(lambda v, x: model.apply(v, x, qmode="fp"))
    fp_arg = lambda x: fp_arg_(variables, x)        # noqa: E731
    float(jnp.sum(fp_cap(x))), float(jnp.sum(fp_arg(x)))
    fp_fn = fp_cap if (_one_round(fp_cap, x, 8)
                       > _one_round(fp_arg, x, 8)) else fp_arg
    return _throughput_pair(int8_fn, fp_fn, x)


def main():
    ips_int8, ips_fp32 = _bench_model("RepVGG_A0", BATCH, deploy=True)
    extra = {"fp32_ips": round(ips_fp32, 1), "batch": BATCH}
    try:
        # second headline model per BASELINE.json's metric spec —
        # deploy (BN-folded) form, the serve-ready graph (models/fuse.py:
        # resnet_deploy); fp32 baseline is the same BN-free form
        r50_int8, r50_fp32 = _bench_model("resnet50", 256, deploy=True)
        extra["resnet50_int8_ips"] = round(r50_int8, 1)
        extra["resnet50_fp32_ips"] = round(r50_fp32, 1)
    except Exception as e:   # never fail the headline on the extra
        extra["resnet50_error"] = str(e)[:120]

    print(json.dumps({
        "metric": "repvgg_a0_int8_images_per_sec_per_chip",
        "value": round(ips_int8, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_int8 / ips_fp32, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
