#!/usr/bin/env python
"""End-to-end accuracy protocol: fp32 train → PTQ → top-1 deltas.

Produces the north-star accuracy evidence (BASELINE.json: top-1 Δ ≤ 0.5%
at W8A8/W4A8 via the RepAPQ/FSPTQ path, mirroring the reference's
fsptq_trainer validation — ref: trainer/fsptq_trainer.py:104-132):

Section 1 (cifar_resnet20, BASELINE config #1's model family):
  1. train fp32 from scratch,
  2. PTQ to W8A8 (per-channel weights, minmax activations) + FSPTQ
     block reconstruction,
  3. PTQ to W4A8 two ways: plain rounding and AdaRound soft rounding,
  4. evaluate on the held-out split, append RESULTS.md.

Section 2 (RepVGG_A0 — the flagship RepAPQ path, BASELINE config #3):
  fp32 train (train form, 3-branch blocks) → repvgg_fuse to deploy form
  (exact) → calibrate → FSPTQ reconstruction at W8A8 → top-1 vs the
  fused fp32 teacher.  ref: example/quantization/FSPTQuant.py:35-108.

Dataset: real CIFAR-10 when the standard python-pickle batches exist
under ``--data-dir`` (data/cifar-10-batches-py); otherwise the
class-structured synthetic fallback (this container is zero-egress — no
dataset or pretrained checkpoint can be fetched), which exercises the
identical pipeline at the same shapes.  RESULTS.md records which one ran.

Usage:  python tools/accuracy_protocol.py [--epochs 30] [--data-dir data]
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
from dlmc_quant_tpu.models.fuse import repvgg_fuse  # noqa: E402
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.deploy import prepare_deploy  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402
from dlmc_quant_tpu.training.fsptq import FSPTQTrainer  # noqa: E402
from dlmc_quant_tpu.training.ptq import evaluate  # noqa: E402
from dlmc_quant_tpu.training.losses import get_loss  # noqa: E402
from dlmc_quant_tpu.training.metrics import get_metric  # noqa: E402
from dlmc_quant_tpu.training.qat import QATTrainer  # noqa: E402
from dlmc_quant_tpu.training.schedulers import CosineDecayLR  # noqa: E402
from dlmc_quant_tpu.training.trainer import Trainer  # noqa: E402


def w_scheme(bits: int, recon=None, wtype: str = "minmax_channel"):
    wargs = {"enable": True, "type": wtype,
             "args": {"n_bits": bits, "signed": True}}
    if recon:
        wargs["recon_type"] = recon
    return scheme_from_dict({
        "quantization_type": "FSPTQ",
        "weight": wargs,
        "input": {"enable": True, "type": "minmax_tensor",
                  "args": {"n_bits": 8, "signed": False}},
        # first conv + head stay 8-bit even at W4 (standard practice,
        # also what the reference's override grammar is for)
        "override_options": [
            {"layers": ["conv1$", r"stage0\.", "linear$"],
             "options": {"weight": {"args": {"n_bits": 8},
                                    **({"recon_type": None}
                                       if recon else {})}}},
        ] if bits < 8 else [],
    })


def qat_scheme(family, bits: int = 4):
    """LSQ (family=None) or RootQ W{bits}A{bits} fake-quant scheme;
    first conv + head stay 8-bit (ref: RootQ_config.yaml overrides)."""
    obs = "LSQ" if family is None else "minmax_tensor"
    return scheme_from_dict({
        "quantization_type": family,
        "momentum": 0.001,
        "weight": {"enable": True, "type": obs,
                   "args": {"n_bits": bits, "signed": True}},
        "input": {"enable": True, "type": obs,
                  "args": {"n_bits": bits, "signed": False}},
        "override_options": [
            {"layers": ["conv1$", "linear$"],
             "options": {"weight": {"args": {"n_bits": 8}},
                         "input": {"args": {"n_bits": 8}}}}],
    })


def qat(model, fp_vars, train_l, eval_l, family, epochs, loss_fn, metrics,
        lr: float = 0.01, alpha_lr: float = 0.01):
    """QAT fine-tune from the fp32 checkpoint; returns eval metrics.

    ref: example/quantization/RootQ_train.py:23-106 (same-checkpoint
    warm start, wt_alpha LR group, per-epoch validation) and
    trainer/quantization_aware_training_trainer.py:96-109.
    """
    qmodel = dataclasses.replace(model, scheme=qat_scheme(family))
    x0 = jnp.asarray(next(iter(train_l))[0])
    qvars = flax.core.unfreeze(jax.jit(qmodel.init)(
        jax.random.PRNGKey(0), x0))
    flatq = flax.traverse_util.flatten_dict(qvars["params"])
    for k, v in flax.traverse_util.flatten_dict(
            fp_vars["params"]).items():
        flatq[k] = v
    qvars["params"] = flax.traverse_util.unflatten_dict(flatq)
    if "batch_stats" in fp_vars:
        qvars["batch_stats"] = fp_vars["batch_stats"]
    qvars = calibrate(qmodel, qvars, [x0])

    steps = len(train_l) * epochs
    sched = CosineDecayLR(lr, total_steps=steps,
                          warmup_steps=len(train_l) // 2)
    alpha_sched = CosineDecayLR(alpha_lr, total_steps=steps)

    def label(params):
        flat = flax.traverse_util.flatten_dict(params)
        return flax.traverse_util.unflatten_dict(
            {p: ("alpha" if p[-1] == "wt_alpha" else "main")
             for p in flat})

    tx = optax.multi_transform(
        {"main": optax.chain(optax.add_decayed_weights(1e-4),
                             optax.sgd(sched, momentum=0.9)),
         "alpha": optax.sgd(alpha_sched, momentum=0.9)}, label)
    trainer = QATTrainer(qmodel, qvars, tx, sched, train_l, eval_l,
                         config={"epochs": epochs,
                                 "monitor": "max val_accuracy",
                                 "update_qparams_period": 0},
                         loss="cross_entropy", metrics=("accuracy",))
    trainer.train()
    best_vars = flax.core.unfreeze(trainer.state.variables())
    return evaluate(qmodel, best_vars, eval_l, loss_fn, metrics,
                    qmode="eval")


def train_fp(model, train_l, eval_l, epochs: int, lr: float = 0.1):
    x0 = jnp.asarray(next(iter(train_l))[0])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    steps = len(train_l) * epochs
    sched = CosineDecayLR(lr, total_steps=steps, warmup_steps=len(train_l))
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(sched, momentum=0.9))
    trainer = Trainer(model, variables, tx, sched, train_l, eval_l,
                      config={"epochs": epochs,
                              "monitor": "max val_accuracy"},
                      loss="cross_entropy", metrics=("accuracy",))
    t0 = time.time()
    trainer.train()
    return flax.core.unfreeze(trainer.state.variables()), time.time() - t0


def ptq(model, fp_vars, cal_batches, eval_loader, bits, loss_fn, metrics,
        recon_iters, recon=None, fp_model=None, wtype="minmax_channel"):
    qmodel = dataclasses.replace(model, scheme=w_scheme(bits, recon, wtype))
    qvars = flax.core.unfreeze(jax.jit(qmodel.init)(
        jax.random.PRNGKey(0), cal_batches[0]))
    flatq = flax.traverse_util.flatten_dict(qvars["params"])
    for k, v in flax.traverse_util.flatten_dict(fp_vars["params"]).items():
        flatq[k] = v
    qvars["params"] = flax.traverse_util.unflatten_dict(flatq)
    for col in ("batch_stats",):
        if col in fp_vars:
            qvars[col] = fp_vars[col]
    qvars = calibrate(qmodel, qvars, cal_batches,
                      observe_passes=len(cal_batches))
    tr = FSPTQTrainer(qmodel, qvars, fp_model or model, fp_vars,
                      cal_batches, iters=recon_iters,
                      disable_first_act_quant=True)
    out = tr.train()
    qvars = out["variables"]
    qmodel = tr.model
    m = evaluate(qmodel, qvars, eval_loader, loss_fn, metrics,
                 qmode="eval")
    return m, qmodel, qvars


def ptq_retry(*args, attempts: int = 3, **kw):
    """The axon tunnel's remote_compile sporadically drops the
    connection mid-stream ('response body closed...'); retry the whole
    PTQ round — recompilation usually succeeds."""
    import jax.errors
    for i in range(attempts):
        try:
            return ptq(*args, **kw)
        except jax.errors.JaxRuntimeError as e:
            if "remote_compile" not in str(e) or i == attempts - 1:
                raise
            print(f"transient remote-compile failure, retry {i + 1}: "
                  f"{str(e)[:120]}", file=sys.stderr)


def cal_set(train_l, n: int = 1024):
    batches, seen = [], 0
    for x, _ in train_l:
        batches.append(jnp.asarray(x))
        seen += len(x)
        if seen >= n:
            break
    return batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--recon-iters", type=int, default=800)
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--skip-resnet", action="store_true")
    ap.add_argument("--skip-repvgg", action="store_true")
    ap.add_argument("--skip-qat", action="store_true")
    ap.add_argument("--qat-epochs", type=int, default=20)
    args = ap.parse_args()

    real = (Path(args.data_dir) / "cifar-10-batches-py").is_dir()
    # synthetic fallback runs the de-saturated 'hard' profile (low-rank
    # class signal under strong noise) so fp32 lands well below 100%
    # and the ±0.5% criterion can actually discriminate
    kw = {} if real else {"synthetic_profile": "hard", "_n_classes": 100}
    n_classes = 10 if real else 100
    train_l = CIFAR10(args.data_dir, batch_size=args.batch, training=True,
                      **kw)
    eval_l = CIFAR10(args.data_dir, batch_size=args.batch, training=False,
                     **kw)
    loss_fn = get_loss("cross_entropy")
    metrics = {"accuracy": get_metric("accuracy")}
    stamp = time.strftime("%Y-%m-%d %H:%M")
    dataset_line = ("real CIFAR-10" if real else
                    "synthetic 100-class 'hard' fallback (zero-egress"
                    " container: no real dataset or pretrained checkpoint"
                    " is fetchable; low-rank class structure + noise"
                    " tuned so fp32 does NOT saturate — identical"
                    " pipeline and shapes; mount data/cifar-10-batches-py"
                    " and rerun for real-data numbers)")
    sections = []

    if not args.skip_resnet:
        model = get_model("cifar_resnet20", num_classes=n_classes)
        fp_vars, train_time = train_fp(model, train_l, eval_l, args.epochs)
        fp_m = evaluate(model, fp_vars, eval_l, loss_fn, metrics,
                        qmode="fp")
        cal = cal_set(train_l)
        m8, _, _ = ptq_retry(model, fp_vars, cal, eval_l, 8, loss_fn,
                             metrics, args.recon_iters)
        m4, _, _ = ptq_retry(model, fp_vars, cal, eval_l, 4, loss_fn,
                             metrics, args.recon_iters)
        # 4-bit best practice: MSE-optimal clipping (the reference's
        # 'l2loss' grid-search observer, ref: ops.py:169-196) + AdaRound
        m4a, _, _ = ptq_retry(model, fp_vars, cal, eval_l, 4, loss_fn,
                              metrics, args.recon_iters, recon="adaround",
                              wtype="l2loss_channel")
        fp_acc = fp_m["accuracy"] * 100
        a8, a4 = m8["accuracy"] * 100, m4["accuracy"] * 100
        a4a = m4a["accuracy"] * 100
        sections.append(f"""
## cifar_resnet20 — fp32 vs RepAPQ/FSPTQ PTQ ({stamp})

Dataset: {dataset_line}.
Backend: {jax.default_backend()} ({jax.devices()[0].device_kind}).
Protocol: {args.epochs}-epoch fp32 train (SGD+momentum, cosine decay,
1-epoch warmup, wd 1e-4, {train_time:.0f}s) → 1024-image calibration →
BN-statistics recalibration under quantization (training/ptq.py:
bn_recalibrate) → FSPTQ block reconstruction ({args.recon_iters}
iters/block, first-conv act quant off, 25% held-out best-iterate +
per-block teacher-agreement acceptance gate) → top-1 on the held-out
split.
Config: W8A8 = per-channel minmax weights + per-tensor unsigned minmax
activations; W4A8 = same with 4-bit weights (first conv + head kept
8-bit); the AdaRound row trains soft rounding during reconstruction
(quant/layers.py ADAROUND_*; ref: FSPTQuant/base.py:60-79).

| model | top-1 % | Δ vs fp32 |
|---|---|---|
| fp32 | {fp_acc:.2f} | — |
| W8A8 FSPTQ | {a8:.2f} | {a8 - fp_acc:+.2f} |
| W4A8 FSPTQ (minmax, round) | {a4:.2f} | {a4 - fp_acc:+.2f} |
| W4A8 FSPTQ (l2loss clip + AdaRound) | {a4a:.2f} | {a4a - fp_acc:+.2f} |

North-star criterion: W8A8 Δ ≥ -0.50 → {"**met**" if a8 - fp_acc >= -0.5
                                         else "**not met**"}.
""")

        if not args.skip_qat:
            # QAT evidence: LSQ and RootQ W4A4 fine-tuned from the SAME
            # fp32 checkpoint (ref: RootQ_train.py:23-106; the trainer
            # validates every epoch like quantization_aware_training_
            # trainer.py:96-109) — first recorded proof both QAT
            # families train to fp32-comparable top-1
            t0 = time.time()
            m_lsq = qat(model, fp_vars, train_l, eval_l, None,
                        args.qat_epochs, loss_fn, metrics)
            m_rq = qat(model, fp_vars, train_l, eval_l, "RootQ",
                       args.qat_epochs, loss_fn, metrics)
            al, ar = m_lsq["accuracy"] * 100, m_rq["accuracy"] * 100
            sections.append(f"""
## cifar_resnet20 — QAT W4A4: LSQ vs RootQ ({stamp})

Dataset: {dataset_line}.
Protocol: warm-start from the Section-1 fp32 checkpoint →
calibrate → {args.qat_epochs}-epoch QAT (SGD+momentum lr 0.01 cosine,
wt_alpha group lr 0.01, weight decay 1e-4), final model →
top-1 on the held-out split ({time.time() - t0:.0f}s for both rows).
W4A4 = 4-bit weights AND activations (first conv + head 8-bit) — the
harder QAT setting from the RootQ paper's tables.
ref: example/quantization/RootQ_train.py:23-106.

| model | top-1 % | Δ vs fp32 |
|---|---|---|
| fp32 | {fp_acc:.2f} | — |
| LSQ W4A4 QAT | {al:.2f} | {al - fp_acc:+.2f} |
| RootQ W4A4 QAT | {ar:.2f} | {ar - fp_acc:+.2f} |
""")

    if not args.skip_repvgg:
        model = get_model("RepVGG_A0", num_classes=n_classes)
        fp_vars, train_time = train_fp(model, train_l, eval_l, args.epochs)
        x0 = jnp.asarray(next(iter(train_l))[0])
        dmodel, dvars = repvgg_fuse(model, fp_vars, x0)
        fp_m = evaluate(dmodel, dvars, eval_l, loss_fn, metrics,
                        qmode="fp")
        cal = cal_set(train_l)
        m8, qm, qv = ptq_retry(dmodel, dvars, cal, eval_l, 8, loss_fn,
                               metrics, args.recon_iters)
        # the serve path: real-int8 execution of the reconstructed model,
        # plain ('int') and chained int8-resident ('intc', quant/chain.py)
        qv = prepare_deploy(qm, qv, sample_input=cal[0][:8])
        m8i = evaluate(qm, qv, eval_l, loss_fn, metrics, qmode="int")
        m8c = evaluate(qm, qv, eval_l, loss_fn, metrics, qmode="intc")
        fp_acc = fp_m["accuracy"] * 100
        a8, a8i = m8["accuracy"] * 100, m8i["accuracy"] * 100
        a8c = m8c["accuracy"] * 100
        sections.append(f"""
## RepVGG_A0 — branch-fuse → RepAPQ/FSPTQ W8A8 (flagship path, {stamp})

Dataset: {dataset_line}.  Input 32×32 (CIFAR-scale exercise of the
224-native architecture).
Protocol: {args.epochs}-epoch fp32 train of the 3-branch train form
({train_time:.0f}s) → repvgg_fuse to the single-conv deploy form
(exact, models/fuse.py) → 1024-image calibration → FSPTQ block
reconstruction ({args.recon_iters} iters/block) → top-1.
ref pipeline: example/quantization/FSPTQuant.py:35-108.
The last row runs the SAME quantized model through the real int8
execution path (qmode='int', quant/deploy.py) instead of fake-quant —
the serve configuration.

| model | top-1 % | Δ vs fused fp32 |
|---|---|---|
| fp32 (fused deploy form) | {fp_acc:.2f} | — |
| W8A8 FSPTQ (fake-quant eval) | {a8:.2f} | {a8 - fp_acc:+.2f} |
| W8A8 FSPTQ (real int8 execution) | {a8i:.2f} | {a8i - fp_acc:+.2f} |
| W8A8 FSPTQ (chained int8-resident, 'intc') | {a8c:.2f} | {a8c - fp_acc:+.2f} |

North-star criterion: W8A8 Δ ≥ -0.50 → {"**met**" if a8 - fp_acc >= -0.5
                                         else "**not met**"}.
""")

    out = Path(args.out)
    header = "# RESULTS — measured accuracy evidence\n"
    prev = out.read_text() if out.exists() else header
    out.write_text(prev + "".join(sections))
    print("".join(sections))
    print(f"appended to {out}")


if __name__ == "__main__":
    main()
