#!/usr/bin/env python
"""RepAPQ / FSPTQ entry point: branch-fuse → calibrate → per-block
reconstruction → evaluate → save.

ref: example/quantization/FSPTQuant.py:35-121
"""

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dlmc_quant_tpu.data import get_dataloader  # noqa: E402
from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.models.fuse import (  # noqa: E402
    efficientnet_deploy, ghostnet_deploy, merge_bn, mobilenet_deploy,
    repvgg_fuse, resnet_deploy)
from dlmc_quant_tpu.models.mobileone import mobileone_fuse  # noqa: E402
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402
from dlmc_quant_tpu.training.fsptq import FSPTQTrainer  # noqa: E402
from dlmc_quant_tpu.training.ptq import evaluate  # noqa: E402
from dlmc_quant_tpu.training.losses import get_loss  # noqa: E402
from dlmc_quant_tpu.training.metrics import get_metric  # noqa: E402
from dlmc_quant_tpu.utils.checkpoint import (load_checkpoint,  # noqa: E402
                                             save_checkpoint)
from dlmc_quant_tpu.utils.config import ConfigParser  # noqa: E402
from dlmc_quant_tpu.utils.logging import setup_logging  # noqa: E402

# every zoo family has a deploy conversion: reparam branch fusion for
# RepVGG/MobileOne, conv<->BN partner folds for the rest (models/fuse.py)
FUSERS = {"RepVGG": repvgg_fuse, "MobileOne": mobileone_fuse,
          "CifarResNet": resnet_deploy, "CifarResNetLarge": resnet_deploy,
          "MobileNetV2": mobilenet_deploy, "GhostNet": ghostnet_deploy,
          "EfficientNet": efficientnet_deploy}


def main():
    config = ConfigParser.from_args()
    logger = setup_logging(config.log_dir)

    loaders = {n: get_dataloader(s["type"], **(s.get("args") or {}))
               for n, s in config["dataloaders"].items()}
    train_l = loaders["train"]
    eval_l = loaders.get("eval")

    model = config.init_obj("arch", lambda t, **kw: get_model(t, **kw))
    x0 = jnp.asarray(next(iter(train_l))[0])
    variables = jax.jit(model.init)(jax.random.PRNGKey(config.seed), x0)
    if config.resume:
        variables, _ = load_checkpoint(config.resume, target=variables)

    # branch fusion + BN merge (ref: FSPTQuant.py:65-67)
    fuser = FUSERS.get(type(model).__name__)
    if fuser is not None and not getattr(model, "deploy", False):
        model, variables = fuser(model, variables, x0)
        logger.info("converted %s to deploy form", type(model).__name__)
    else:
        variables = merge_bn(model, variables, x0)
        logger.info("merged BN into convs")

    fp_model, fp_variables = model, variables

    scheme = scheme_from_dict(config["quantization"])
    qmodel = dataclasses.replace(model, scheme=scheme)
    qvars = flax.core.unfreeze(jax.jit(qmodel.init)(jax.random.PRNGKey(0), x0))
    flatq = flax.traverse_util.flatten_dict(qvars["params"])
    for k, v in flax.traverse_util.flatten_dict(variables["params"]).items():
        flatq[k] = v
    qvars["params"] = flax.traverse_util.unflatten_dict(flatq)

    # calibration sample (ref: FSPTQuant.py:26-33,93 get_train_sample)
    n_cal = int(config.get("train_sample_num", 1024))
    cal_batches, n = [], 0
    for x, _ in train_l:
        cal_batches.append(jnp.asarray(x))
        n += len(x)
        if n >= n_cal:
            break
    qvars = calibrate(qmodel, qvars, cal_batches,
                      observe_passes=len(cal_batches))

    tcfg = config.get("trainer", {})
    trainer = FSPTQTrainer(
        qmodel, qvars, fp_model, fp_variables, cal_batches,
        iters=int(tcfg.get("epochs", 2000)),
        batch_size=int(tcfg.get("recon_batch", 64)),
        lrs=tcfg.get("lrs"), logger=logger,
        # ref: fsptq_trainer.py:155-161 — act quant off on the first conv
        disable_first_act_quant=bool(
            tcfg.get("disable_first_act_quant", True)))
    out = trainer.train()
    qvars = out["variables"]
    qmodel = trainer.model          # scheme may carry the first-conv override

    loss_fn = get_loss(config.get("loss", "cross_entropy"))
    metric_fns = {m: get_metric(m)
                  for m in config.get("metrics", ["accuracy"])}
    if eval_l is not None:
        fp_m = evaluate(fp_model, fp_variables, eval_l, loss_fn, metric_fns,
                        qmode="fp")
        q_m = evaluate(qmodel, qvars, eval_l, loss_fn, metric_fns,
                       qmode="eval")
        logger.info("FP teacher: %s", fp_m)
        logger.info("RepAPQ quantized: %s", q_m)

    if config.save_dir is not None:
        save_checkpoint(config.save_dir / "fsptq_model", qvars,
                        metadata={"block_losses": out["block_losses"]})
        logger.info("saved to %s", config.save_dir)


if __name__ == "__main__":
    main()
