#!/usr/bin/env python
"""Headline benchmark: INT8 images/sec/chip on RepVGG-A0 (deploy form).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip",
     "vs_baseline": N}

``vs_baseline`` is the speedup of the int8 path over the same model's
FP32 forward on the same chip (the reference publishes no numbers —
BASELINE.json "published" is {} — so FP32-on-same-hardware is the
baseline the int8 engine must beat).

Extras carry the other BASELINE-named models: ResNet-50 (chained
residual int8, quant/chain.py QuantizedTensor), MobileOne-S1 at W8A8
and W4A8 (native-S4 weights), and RepVGG-D2se (SE blocks materialize
the chain — see the engine note in quant/deploy.py).

Timing notes: on the axon TPU tunnel ``block_until_ready`` does not
synchronize; we queue ``iters`` dependent-free forwards and force
completion by fetching a scalar from the last result (device executes
in-order), which bounds throughput correctly.  The scalar-fetch fence
costs ~25 ms of tunnel round-trip — measured fresh at startup (it
drifts with tunnel load; a hard-coded constant skewed earlier rounds)
and subtracted from each round.

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

FENCE_S = 0.025   # fallback; overwritten by _measure_fence() at startup


def _measure_fence():
    """Measure the scalar-fetch round-trip: fetch from an already-ready
    tiny array.  Min of several samples — the cost every ``_one_round``
    subtracts.  Hard-coding it (earlier rounds) skews every number by a
    fixed offset when tunnel RTT drifts."""
    global FENCE_S
    y = jnp.zeros((1,), jnp.float32) + 1.0
    float(jnp.sum(y))                      # ensure materialized
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(y))
        samples.append(time.perf_counter() - t0)
    FENCE_S = min(samples)


def _one_round(fn, x, iters=ITERS):
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    float(jnp.sum(y))  # fence: forces all queued work to finish
    # clamp: a fast program at low iters can dip below the fence noise
    elapsed = max(time.perf_counter() - t0 - FENCE_S, 1e-4)
    return x.shape[0] * iters / elapsed


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


def _scheme(w_bits: int = 8):
    from dlmc_quant_tpu.quant.config import scheme_from_dict
    return scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "args": {"n_bits": w_bits, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
    })


def _prep(name: str, batch: int, w_bits: int = 8, **model_kw):
    from dlmc_quant_tpu.models import get_model
    from dlmc_quant_tpu.quant.deploy import prepare_deploy
    from dlmc_quant_tpu.quant.layers import calibrate

    model = get_model(name, num_classes=1000, scheme=_scheme(w_bits),
                      **model_kw)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                           jnp.float32)
    xc = x[:8]
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), xc)
    variables = calibrate(model, variables, [xc])
    variables = prepare_deploy(model, variables, sample_input=xc)
    return model, variables, x


def _int8_fn(model, variables, x):
    """Fastest deploy program: chained 'intc' vs plain 'int' probe."""
    from dlmc_quant_tpu.quant.deploy import make_serving_fn
    int_fns = []
    for qm in ("intc", "int"):
        try:
            fn = make_serving_fn(model, variables, qmode=qm)
            float(jnp.sum(fn(x)))
            int_fns.append(fn)
        except Exception as e:          # model without intc support
            print(f"# bench: qmode={qm} unavailable: {e!r}"[:200],
                  file=sys.stderr)
    if not int_fns:
        # last resort: arg-passed plain int forward (never silently
        # empty — an int8 deploy path must exist for every zoo model)
        fn_ = jax.jit(lambda v, x: model.apply(v, x, qmode="int"))
        int_fns = [lambda x: fn_(variables, x)]
        float(jnp.sum(int_fns[0](x)))
    if len(int_fns) == 1:
        return int_fns[0]
    return max(int_fns, key=lambda f: _one_round(f, x, 16))


def _bench_model(name: str, batch: int, **model_kw):
    from dlmc_quant_tpu.quant.deploy import make_serving_fn

    model, variables, x = _prep(name, batch, **model_kw)
    int8_fn = _int8_fn(model, variables, x)
    # fp32 baseline: fastest of the two dispatch forms (see module doc).
    # Large models (RepVGG-D2se: ~133M params -> >500 MB of captured
    # f32 constants) exceed the tunnel's remote-compile body limit
    # (HTTP 413) in captured form — fall back to arg-passing.
    fp_arg_ = jax.jit(lambda v, x: model.apply(v, x, qmode="fp"))
    fp_arg = lambda x: fp_arg_(variables, x)        # noqa: E731
    float(jnp.sum(fp_arg(x)))
    try:
        fp_cap = make_serving_fn(model, variables, qmode="fp")
        float(jnp.sum(fp_cap(x)))
        fp_fn = fp_cap if (_one_round(fp_cap, x, 8)
                           > _one_round(fp_arg, x, 8)) else fp_arg
    except Exception as e:
        print(f"# bench: fp32 captured form unavailable for {name}: "
              f"{e!r}"[:160], file=sys.stderr)
        fp_fn = fp_arg
    return _throughput_pair(int8_fn, fp_fn, x)


def main():
    _measure_fence()
    ips_int8, ips_fp32 = _bench_model("RepVGG_A0", BATCH, deploy=True)
    extra = {"fp32_ips": round(ips_fp32, 1), "batch": BATCH,
             "fence_ms": round(FENCE_S * 1e3, 2)}
    # Every extra pairs the quantized path with the SAME model's fp32
    # forward on the same chip (interleaved rounds), so vs_baseline
    # discipline is universal — any model where int8 loses shows a
    # ratio < 1 here and gets a sentence in the engine note
    # (quant/deploy.py).
    for key, fn in (
        # second headline model per BASELINE.json's metric spec —
        # deploy (BN-folded) form with chained residual boundaries
        ("resnet50_int8",
         lambda: _bench_model("resnet50", 256, deploy=True)),
        # BASELINE config #4's model: MobileOne-S1 deploy form, W8A8
        # and W4A8 (native-S4 weight storage)
        ("mobileone_s1_int8",
         lambda: _bench_model("mobileone_s1", 256, deploy=True)),
        ("mobileone_s1_w4a8",
         lambda: _bench_model("mobileone_s1", 256, w_bits=4,
                              deploy=True)),
        # SE variant: SEBlock materializes the chain (models/repvgg.py)
        ("repvgg_d2se_int8",
         lambda: _bench_model("RepVGG_D2se", 64, deploy=True)),
        # BASELINE config #2's model, BN-folded deploy twin with
        # ReLU6-chained linear-bottleneck residuals (models/fuse.py:
        # mobilenet_deploy builds it from a trained model; here the
        # deploy=True form is benched directly)
        ("mobilenet_v2_int8",
         lambda: _bench_model("mobilenet_v2", 256, deploy=True)),
    ):
        try:
            q_ips, fp_ips = fn()
            extra[f"{key}_ips"] = round(q_ips, 1)
            extra[f"{key}_fp32_ips"] = round(fp_ips, 1)
            extra[f"{key}_vs_fp32"] = round(q_ips / fp_ips, 3)
        except Exception as e:   # never fail the headline on an extra
            extra[f"{key}_error"] = str(e)[:120]

    print(json.dumps({
        "metric": "repvgg_a0_int8_images_per_sec_per_chip",
        "value": round(ips_int8, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_int8 / ips_fp32, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
