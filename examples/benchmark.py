#!/usr/bin/env python
"""Throughput benchmark harness: images/sec per model, train and/or
inference, synthetic data, multi-device (data-parallel) aware.

ref: example/benchmark/benchmark.py:35-215 (ips/epoch-time measurement
per model list, warmup rounds, synthetic dataset, DP/DDP modes →
replaced by a mesh-sharded jitted step).

Usage: python examples/benchmark.py -c examples/configs/benchmark.yaml
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.parallel.mesh import (  # noqa: E402
    data_sharding, make_mesh, replicate, shard_batch,
)
from dlmc_quant_tpu.utils.config import ConfigParser, read_yaml  # noqa: E402


def bench_model(name: str, batch_size: int, image_size: int, mode: str,
                warmup: int, steps: int, mesh, num_classes: int = 1000):
    model = get_model(name, num_classes=num_classes)
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (batch_size, image_size, image_size, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch_size,), 0,
                           num_classes)
    variables = jax.jit(model.init)(jax.random.PRNGKey(2), x[:2])
    x, y = shard_batch((x, y), mesh)
    variables = jax.device_put(variables, replicate(mesh))

    if mode == "train":
        tx = optax.sgd(0.1, momentum=0.9)
        opt_state = jax.device_put(tx.init(variables["params"]),
                                   replicate(mesh))

        @jax.jit
        def step(params, rest, opt_state, x, y):
            def loss_fn(p):
                logits, upd = model.apply(
                    {"params": p, **rest}, x, train=True,
                    mutable=list(rest.keys()))
                one = jax.nn.one_hot(y, logits.shape[-1])
                return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one,
                                         -1)), upd
            (loss, upd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), upd, opt_state, loss

        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}
        for _ in range(warmup):
            params, rest, opt_state, loss = step(params, rest, opt_state,
                                                 x, y)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            params, rest, opt_state, loss = step(params, rest, opt_state,
                                                 x, y)
        float(loss)
        dt = time.perf_counter() - t0
    else:
        # weight-resident dispatch: see quant/deploy.py:make_serving_fn
        fwd = jax.jit(lambda x: model.apply(variables, x))
        for _ in range(warmup):
            out = fwd(x)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(x)
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    cfg_path = sys.argv[sys.argv.index("-c") + 1] if "-c" in sys.argv \
        else "examples/configs/benchmark.yaml"
    cfg = read_yaml(cfg_path)
    mesh = make_mesh(cfg.get("n_devices"))
    results = {}
    for name in cfg["models"]:
        for r in range(int(cfg.get("rounds", 1))):
            ips = bench_model(
                name, int(cfg.get("batch_size", 64)),
                int(cfg.get("image_size", 224)),
                cfg.get("mode", "inference"),
                int(cfg.get("warmup", 2)), int(cfg.get("steps", 20)), mesh,
                int(cfg.get("num_classes", 1000)))
            results.setdefault(name, []).append(round(ips, 1))
            print(f"{name} round {r}: {ips:.1f} img/s "
                  f"({cfg.get('mode', 'inference')})")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
