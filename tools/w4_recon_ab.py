#!/usr/bin/env python
"""A/B the FSPTQ reconstruction group LRs on the hard task (W4A8).

Cal-only+BN-recal reaches ~89.8; recon with the default LR groups
drops to 68.8.  Which group is responsible?
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import dataclasses  # noqa: E402

import flax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dlmc_quant_tpu.data.loaders import CIFAR10  # noqa: E402
from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.training.fsptq import FSPTQTrainer  # noqa: E402
from dlmc_quant_tpu.training.ptq import evaluate  # noqa: E402
from dlmc_quant_tpu.training.losses import get_loss  # noqa: E402
from dlmc_quant_tpu.training.metrics import get_metric  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402

sys.path.insert(0, "tools")
from w4_diag import load_params, make_scheme  # noqa: E402

kw = {"synthetic_profile": "hard", "_n_classes": 100}
train_l = CIFAR10("data", batch_size=256, training=True, **kw)
eval_l = CIFAR10("data", batch_size=256, training=False, **kw)
loss_fn = get_loss("cross_entropy")
metrics = {"accuracy": get_metric("accuracy")}
model = get_model("cifar_resnet20", num_classes=100)
fp_vars = load_params("saved/w4diag_fp_hard.npz")

cal, seen = [], 0
for x, _ in train_l:
    cal.append(jnp.asarray(x))
    seen += len(x)
    if seen >= 1024:
        break

CONFIGS = [
    ("default lrs", None),
    ("bn frozen", {"bn": 0.0}),
    ("scales only", {"bn": 0.0, "kernel": 0.0, "bias": 0.0}),
    ("bn 0.01", {"bn": 0.01}),
]


def run(lrs):
    scheme = make_scheme(4, "minmax_channel")
    qmodel = dataclasses.replace(model, scheme=scheme)
    qvars = flax.core.unfreeze(jax.jit(qmodel.init)(
        jax.random.PRNGKey(0), cal[0]))
    flatq = flax.traverse_util.flatten_dict(qvars["params"])
    for k, v in flax.traverse_util.flatten_dict(fp_vars["params"]).items():
        flatq[k] = v
    qvars["params"] = flax.traverse_util.unflatten_dict(flatq)
    qvars["batch_stats"] = fp_vars["batch_stats"]
    qvars = calibrate(qmodel, qvars, cal, observe_passes=len(cal))
    tr = FSPTQTrainer(qmodel, qvars, model, fp_vars, cal, iters=800,
                      lrs=lrs, disable_first_act_quant=True)
    out = tr.train()
    return evaluate(tr.model, out["variables"], eval_l, loss_fn, metrics,
                    qmode="eval")


for name, lrs in CONFIGS[1:]:   # default already measured: 68.80
    t0 = time.time()
    m = run(lrs)
    print(f"{name:14s} {m['accuracy']*100:6.2f}  ({time.time()-t0:.0f}s)",
          flush=True)
