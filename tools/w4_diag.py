#!/usr/bin/env python
"""Bisect the W4A8 accuracy collapse (VERDICT r4 Missing #2).

Trains (or reloads) a cifar_resnet20 fp32 baseline, then evaluates a
ladder of quantization variants — calibration-only first, then with
reconstruction — so the stage that destroys accuracy is isolated:

  fp32
  W8A8      cal-only
  W4 weights-only (act quant off), minmax_channel      cal-only
  W4 weights-only, l2loss_channel                      cal-only
  W4A8 minmax_channel                                  cal-only
  W4A8 l2loss_channel                                  cal-only
  W4A8 l2loss_channel + recon
  W4A8 l2loss_channel + recon + AdaRound

Usage: python tools/w4_diag.py [--epochs 10] [--variants all]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import dataclasses  # noqa: E402

import flax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from dlmc_quant_tpu.data.loaders import CIFAR10  # noqa: E402
from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402
from dlmc_quant_tpu.training.fsptq import FSPTQTrainer  # noqa: E402
from dlmc_quant_tpu.training.ptq import evaluate  # noqa: E402
from dlmc_quant_tpu.training.losses import get_loss  # noqa: E402
from dlmc_quant_tpu.training.metrics import get_metric  # noqa: E402
from dlmc_quant_tpu.training.schedulers import CosineDecayLR  # noqa: E402
from dlmc_quant_tpu.training.trainer import Trainer  # noqa: E402

CKPT = Path("saved/w4diag_fp.npz")  # per-profile suffix applied in main()


def make_scheme(wbits, wtype, act=True, recon=None):
    wargs = {"enable": True, "type": wtype,
             "args": {"n_bits": wbits, "signed": True}}
    if recon:
        wargs["recon_type"] = recon
    return scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": wargs,
        "input": {"enable": act, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
        "override_options": [
            {"layers": ["conv1$", "linear$"],
             "options": {"weight": {"args": {"n_bits": 8},
                                    **({"recon_type": None}
                                       if recon else {})}}},
        ] if wbits < 8 else [],
    })


def save_params(path, variables):
    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params(path):
    z = np.load(path)
    flat = {k: jnp.asarray(z[k]) for k in z.files}
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--recon-iters", type=int, default=800)
    ap.add_argument("--retrain", action="store_true")
    ap.add_argument("--profile", default="easy")
    args = ap.parse_args()

    n_classes = 100 if args.profile == "hard" else 10
    kw = ({"synthetic_profile": "hard", "_n_classes": 100}
          if args.profile == "hard" else {})
    train_l = CIFAR10("data", batch_size=args.batch, training=True, **kw)
    eval_l = CIFAR10("data", batch_size=args.batch, training=False, **kw)
    loss_fn = get_loss("cross_entropy")
    metrics = {"accuracy": get_metric("accuracy")}
    model = get_model("cifar_resnet20", num_classes=n_classes)

    global CKPT
    CKPT = Path(f"saved/w4diag_fp_{args.profile}.npz")
    if CKPT.exists() and not args.retrain:
        fp_vars = load_params(CKPT)
        print(f"loaded fp ckpt {CKPT}")
    else:
        x0 = jnp.asarray(next(iter(train_l))[0])
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        steps = len(train_l) * args.epochs
        sched = CosineDecayLR(0.1, total_steps=steps,
                              warmup_steps=len(train_l))
        tx = optax.chain(optax.add_decayed_weights(1e-4),
                         optax.sgd(sched, momentum=0.9))
        tr = Trainer(model, variables, tx, sched, train_l, eval_l,
                     config={"epochs": args.epochs,
                             "monitor": "max val_accuracy"},
                     loss="cross_entropy", metrics=("accuracy",))
        t0 = time.time()
        tr.train()
        fp_vars = flax.core.unfreeze(tr.state.variables())
        print(f"trained fp in {time.time() - t0:.0f}s")
        CKPT.parent.mkdir(exist_ok=True)
        save_params(CKPT, fp_vars)

    fp_m = evaluate(model, fp_vars, eval_l, loss_fn, metrics, qmode="fp")
    print(f"fp32                                   {fp_m['accuracy']*100:6.2f}")

    cal, seen = [], 0
    for x, _ in train_l:
        cal.append(jnp.asarray(x))
        seen += len(x)
        if seen >= 1024:
            break

    def quantize_variant(scheme, recon_iters=0):
        qmodel = dataclasses.replace(model, scheme=scheme)
        qvars = flax.core.unfreeze(jax.jit(qmodel.init)(
            jax.random.PRNGKey(0), cal[0]))
        flatq = flax.traverse_util.flatten_dict(qvars["params"])
        for k, v in flax.traverse_util.flatten_dict(
                fp_vars["params"]).items():
            flatq[k] = v
        qvars["params"] = flax.traverse_util.unflatten_dict(flatq)
        if "batch_stats" in fp_vars:
            qvars["batch_stats"] = fp_vars["batch_stats"]
        qvars = calibrate(qmodel, qvars, cal, observe_passes=len(cal))
        if recon_iters:
            tr = FSPTQTrainer(qmodel, qvars, model, fp_vars, cal,
                              iters=recon_iters,
                              disable_first_act_quant=True)
            out = tr.train()
            qvars, qmodel = out["variables"], tr.model
        else:
            from dlmc_quant_tpu.training.fsptq import (
                disable_act_quant_on, first_quant_path)
            from dlmc_quant_tpu.training.ptq import bn_recalibrate
            p = first_quant_path(qmodel, qvars, cal[0])
            if p:
                qmodel = disable_act_quant_on(qmodel, p)
            qvars = bn_recalibrate(qmodel, qvars, cal)
            qvars = calibrate(qmodel, qvars, cal, observe_passes=len(cal))
        return evaluate(qmodel, qvars, eval_l, loss_fn, metrics,
                        qmode="eval")

    variants = [
        ("W8A8 minmax cal-only+bnr",
         make_scheme(8, "minmax_channel"), 0),
        ("W4 w-only minmax cal-only+bnr",
         make_scheme(4, "minmax_channel", act=False), 0),
        ("W4A8 minmax cal-only+bnr",
         make_scheme(4, "minmax_channel"), 0),
        ("W4A8 l2loss cal-only+bnr",
         make_scheme(4, "l2loss_channel"), 0),
        ("W4A8 minmax + recon",
         make_scheme(4, "minmax_channel"), args.recon_iters),
        ("W4A8 l2loss + recon",
         make_scheme(4, "l2loss_channel"), args.recon_iters),
        ("W4A8 l2loss + recon + AdaRound",
         make_scheme(4, "l2loss_channel", recon="adaround"),
         args.recon_iters),
    ]
    for name, scheme, iters in variants:
        t0 = time.time()
        m = quantize_variant(scheme, iters)
        print(f"{name:38s} {m['accuracy']*100:6.2f}"
              f"  ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
