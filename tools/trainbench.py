#!/usr/bin/env python
"""TPU training-throughput benchmark: fp32 vs QAT fake-quant train ips.

Measures the full jitted train step (forward + backward + SGD update,
BN running stats mutated) on the attached chip for the headline models,
fp32 and LSQ/RootQ fake-quant QAT, and writes TRAINBENCH.md — the
training-speed counterpart of bench.py's inference numbers.

ref: example/benchmark/benchmark.py:168-197 (the reference's benchmark
measures train-mode ips; it records nothing — this artifact does).

Timing uses the scalar-fetch fence (axon tunnel: block_until_ready does
not synchronize); data is generated on device so the tunnel's ~13 MB/s
host->device path is not measured.

Usage: python tools/trainbench.py [--steps 20] [--out TRAINBENCH.md]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402


def qat_scheme(family, bits=4):
    """LSQ or RootQ W{bits}A{bits} fake-quant scheme (first conv + head
    kept 8-bit, standard QAT practice; ref: RootQ_config.yaml)."""
    return scheme_from_dict({
        "quantization_type": family,        # None -> LSQ family
        "weight": {"enable": True, "type": "LSQ" if family is None
                   else "minmax_tensor",
                   "args": {"n_bits": bits, "signed": True}},
        "input": {"enable": True, "type": "LSQ" if family is None
                  else "minmax_tensor",
                  "args": {"n_bits": bits, "signed": False}},
        "override_options": [
            {"layers": ["conv1$", r"stage0\.", "linear$"],
             "options": {"weight": {"args": {"n_bits": 8}},
                         "input": {"args": {"n_bits": 8}}}}],
    })


FENCE_S = 0.025


def _measure_fence():
    global FENCE_S
    y = jnp.zeros((1,), jnp.float32) + 1.0
    float(jnp.sum(y))
    FENCE_S = min((lambda t0: (float(jnp.sum(y)),
                               time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))


def bench_train(name, batch, size, scheme, qmode, steps, warmup=3,
                num_classes=1000):
    model = get_model(name, num_classes=num_classes)
    if scheme is not None:
        model = dataclasses.replace(model, scheme=scheme)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, size, size, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, num_classes)
    variables = jax.jit(model.init)(jax.random.PRNGKey(2), x[:2])
    if scheme is not None:
        variables = calibrate(model, variables, [x[:64]])
    variables = dict(variables)

    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, rest, opt_state, x, y):
        def loss_fn(p):
            out = model.apply({"params": p, **rest}, x, train=True,
                              qmode=qmode,
                              mutable=[k for k in rest])
            logits, upd = out if isinstance(out, tuple) else (out, {})
            one = jax.nn.one_hot(y, logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one, -1))
            return loss, upd
        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_rest = {**rest, **upd}
        return optax.apply_updates(params, updates), new_rest, \
            opt_state, loss

    params = variables.pop("params")
    rest = variables
    for _ in range(warmup):
        params, rest, opt_state, loss = step(params, rest, opt_state, x, y)
    float(loss)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, rest, opt_state, loss = step(params, rest, opt_state,
                                                 x, y)
        float(loss)
        dt = max(time.perf_counter() - t0 - FENCE_S, 1e-4)
        best = max(best, batch * steps / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="TRAINBENCH.md")
    args = ap.parse_args()
    _measure_fence()

    jobs = [
        # (label, model, batch, image size, scheme, qmode, classes)
        ("cifar_resnet20 fp32", "cifar_resnet20", 512, 32, None, "fp", 10),
        ("cifar_resnet20 QAT LSQ W4A4", "cifar_resnet20", 512, 32,
         qat_scheme(None), "train", 10),
        ("cifar_resnet20 QAT RootQ W4A4", "cifar_resnet20", 512, 32,
         qat_scheme("RootQ"), "train", 10),
        ("RepVGG_A0 fp32", "RepVGG_A0", 128, 224, None, "fp", 1000),
        ("RepVGG_A0 QAT LSQ W4A4", "RepVGG_A0", 128, 224,
         qat_scheme(None), "train", 1000),
    ]
    rows, base = [], {}
    for label, name, batch, size, scheme, qmode, nc in jobs:
        t0 = time.time()
        ips = bench_train(name, batch, size, scheme, qmode, args.steps,
                          num_classes=nc)
        model_key = name
        if scheme is None:
            base[model_key] = ips
        ratio = ips / base.get(model_key, ips)
        rows.append((label, batch, ips, ratio))
        print(f"{label:32s} batch {batch:4d}  {ips:10.1f} img/s "
              f"({ips / base.get(model_key, ips):.2f}x fp32)  "
              f"[{time.time() - t0:.0f}s]", flush=True)

    dev = jax.devices()[0]
    stamp = time.strftime("%Y-%m-%d %H:%M")
    lines = [
        "# TRAINBENCH — TPU training throughput (measured)\n",
        f"\nDate: {stamp}.  Device: {dev.platform} ({dev.device_kind})."
        f"  Fence: {FENCE_S * 1e3:.1f} ms (subtracted)."
        "\nFull jitted train step: forward + backward + SGD(momentum)"
        " update, BN stats mutated; synthetic on-device data"
        f" ({args.steps} steps x 3 rounds, best round)."
        "\nQAT = fake-quant W4A4 (first conv + head 8-bit), the QAT"
        " configuration of examples/configs; overhead vs fp32 is the"
        " fake-quant tax the reference's QAT also pays"
        " (ref: example/benchmark/benchmark.py:168-197 measures train"
        " ips but records nothing).\n",
        "\n| config | batch | train img/s | vs fp32 |",
        "|---|---|---|---|",
    ]
    for label, batch, ips, ratio in rows:
        lines.append(f"| {label} | {batch} | {ips:,.0f} | {ratio:.2f}x |")
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
