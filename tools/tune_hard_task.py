#!/usr/bin/env python
"""Tune the 'hard' synthetic profile: fp32 should land ~85-92% so the
accuracy protocol's ±0.5% criterion discriminates (VERDICT r4 Weak #1).

Sweeps candidate (amplitude, noise, rank, base resolution) settings of
a low-frequency shared-basis task; trains cifar_resnet20 briefly per
candidate and prints fp32 top-1.  The winner gets baked into
data/loaders.py's 'hard' profile.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import flax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from dlmc_quant_tpu.data.loaders import (  # noqa: E402
    CIFAR_MEAN, CIFAR_STD, ArrayDataset, DataLoader,
)
from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.training.ptq import evaluate  # noqa: E402
from dlmc_quant_tpu.training.losses import get_loss  # noqa: E402
from dlmc_quant_tpu.training.metrics import get_metric  # noqa: E402
from dlmc_quant_tpu.training.schedulers import CosineDecayLR  # noqa: E402
from dlmc_quant_tpu.training.trainer import Trainer  # noqa: E402


def gen(n, num_classes, k, amp, noise, base, seed, split):
    """Low-frequency shared-basis classification task."""
    h = w = 32
    rng = np.random.default_rng(seed)
    lo = rng.normal(0.0, 1.0, (k, base, base, 3)).astype(np.float32)
    up = np.repeat(np.repeat(lo, h // base, axis=1), w // base, axis=2)
    up /= np.linalg.norm(up.reshape(k, -1), axis=1).reshape(k, 1, 1, 1)
    coef = rng.normal(0.0, 1.0, (num_classes, k)).astype(np.float32)
    protos = 0.5 + amp * np.einsum("mk,khwc->mhwc", coef, up)
    srng = np.random.default_rng((seed, 0 if split == "train" else 1))
    labels = srng.integers(0, num_classes, n)
    images = protos[labels] + srng.normal(0, noise, (n, h, w, 3))
    return np.clip(images, 0, 1).astype(np.float32), labels


def run(num_classes, k, amp, noise, base, epochs=10):
    xtr, ytr = gen(10000, num_classes, k, amp, noise, base, 0, "train")
    xev, yev = gen(2000, num_classes, k, amp, noise, base, 0, "eval")
    train_l = DataLoader(ArrayDataset(xtr, ytr, CIFAR_MEAN, CIFAR_STD,
                                      train_augment=True), 256, True)
    eval_l = DataLoader(ArrayDataset(xev, yev, CIFAR_MEAN, CIFAR_STD),
                        256, False, drop_last=False)
    model = get_model("cifar_resnet20", num_classes=num_classes)
    x0 = jnp.asarray(next(iter(train_l))[0])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    steps = len(train_l) * epochs
    sched = CosineDecayLR(0.1, total_steps=steps, warmup_steps=len(train_l))
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(sched, momentum=0.9))
    tr = Trainer(model, variables, tx, sched, train_l, eval_l,
                 config={"epochs": epochs, "monitor": "max val_accuracy"},
                 loss="cross_entropy", metrics=("accuracy",))
    t0 = time.time()
    tr.train()
    fp_vars = flax.core.unfreeze(tr.state.variables())
    m = evaluate(model, fp_vars, eval_l, get_loss("cross_entropy"),
                 {"accuracy": get_metric("accuracy")}, qmode="fp")
    print(f"classes={num_classes:3d} k={k:2d} amp={amp:4.1f} "
          f"noise={noise:4.2f} base={base:2d}  "
          f"fp32={m['accuracy'] * 100:6.2f}  [{time.time() - t0:.0f}s]",
          flush=True)
    return m["accuracy"]


if __name__ == "__main__":
    cands = [
        (100, 16, 1.5, 0.40, 8),
        (100, 16, 1.5, 0.50, 8),
    ]
    for c in cands:
        run(*c, epochs=30)
