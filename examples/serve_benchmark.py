#!/usr/bin/env python
"""Quantized-serving scaling benchmark: images/sec at 1 chip vs the full
mesh, with tensor-sharded int8 weights and continuous batching.

The BASELINE.json scaling measurement (≥90% linear 1→2 hosts).  On a
multi-host slice run one process per host with
``jax.distributed.initialize()`` (env-driven on TPU pods) before this
script; the mesh then spans all hosts and each host submits its local
request stream.

Usage:
    python examples/serve_benchmark.py [model] [batch] [w_bits] [a_bits]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# virtual-mesh mode: DLMCQ_CPU_DEVICES=8 runs on 8 virtual CPU devices
# (set XLA_FLAGS=--xla_force_host_platform_device_count=8 too) — the
# JAX_PLATFORMS env var alone is overridden by the axon plugin here
if os.environ.get("DLMCQ_CPU_DEVICES"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.parallel.mesh import make_mesh  # noqa: E402
from dlmc_quant_tpu.parallel.serving import (  # noqa: E402
    InferenceEngine, measure_throughput,
)
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.deploy import prepare_deploy  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "RepVGG_A0"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    w_bits = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    a_bits = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    image = (224, 224, 3) if "cifar" not in model_name else (32, 32, 3)

    scheme = scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": {"enable": True, "type": "minmax_channel",
                   "args": {"n_bits": w_bits, "signed": True}},
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": a_bits, "signed": False}},
    })
    kwargs = ({"deploy": True}
              if model_name.lower().startswith(("repvgg", "mobileone"))
              else {})
    model = get_model(model_name, scheme=scheme, **kwargs)
    x = jax.random.uniform(jax.random.PRNGKey(0), (8,) + image)
    v = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    v = calibrate(model, v, [x])
    v = prepare_deploy(model, v, sample_input=x)

    results = {}
    n_total = len(jax.devices())
    for n_dev in sorted({1, n_total}):
        if n_dev == 1:
            mesh = make_mesh(1, axes=("data", "model"), shape=(1, 1))
        else:
            n_model = 2 if n_dev % 2 == 0 else 1
            mesh = make_mesh(n_dev, axes=("data", "model"),
                             shape=(n_dev // n_model, n_model))
        eng = InferenceEngine(model, v, mesh, batch_size=batch, qmode="int")
        ips = measure_throughput(eng, image, n_batches=20)
        results[f"{n_dev}_devices"] = round(ips, 1)
        print(f"{model_name} W{w_bits}A{a_bits} on {n_dev} device(s): "
              f"{ips:.1f} img/s")
    if len(results) > 1:
        lo = results[f"1_devices"]
        hi = results[f"{n_total}_devices"]
        results["scaling_efficiency"] = round(hi / (lo * n_total), 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
