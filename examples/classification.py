#!/usr/bin/env python
"""Baseline classification training.

ref: example/baseline/classification.py:22-77 (incl. the outer repeat-run
loop for seed-variance eyeballing).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from dlmc_quant_tpu.data import get_dataloader  # noqa: E402
from dlmc_quant_tpu.models import get_model  # noqa: E402
from dlmc_quant_tpu.training.optimizers import build_optimizer  # noqa: E402
from dlmc_quant_tpu.training.schedulers import get_scheduler  # noqa: E402
from dlmc_quant_tpu.training.trainer import Trainer  # noqa: E402
from dlmc_quant_tpu.utils.config import ConfigParser  # noqa: E402
from dlmc_quant_tpu.utils.logging import setup_logging  # noqa: E402


def build_common(config, scheme=None):
    """Shared setup for all training CLIs: loaders, model, optimizer."""
    train_loader = config.init_obj("train_loader",
                                   lambda t, **kw: get_dataloader(t, **kw))
    valid_loader = None
    if "valid_loader" in config:
        valid_loader = config.init_obj(
            "valid_loader", lambda t, **kw: get_dataloader(t, **kw))
    elif train_loader.split_validation() is not None:
        valid_loader = train_loader.split_validation()

    model = config.init_obj("arch", lambda t, **kw: get_model(t, **kw),
                            scheme=scheme)
    x0, _ = next(iter(train_loader))
    variables = jax.jit(model.init)(jax.random.PRNGKey(config.seed),
                           jax.numpy.asarray(x0))

    sched_spec = config["lr_scheduler"]
    sched = get_scheduler(sched_spec["type"],
                          steps_per_epc=len(train_loader),
                          **(sched_spec.get("args") or {}))
    opt_spec = config["optimizer"]
    opt_args = dict(opt_spec.get("args") or {})
    opt_args.pop("lr", None)
    tx = build_optimizer(
        opt_spec["type"], sched,
        grad_clip=config.get("trainer", {}).get("grad_clip_param"),
        param_groups=opt_spec.get("param_groups"), **opt_args)
    return model, variables, tx, sched, train_loader, valid_loader


def main():
    config = ConfigParser.from_args()
    logger = setup_logging(config.log_dir)
    n_runs = int(config.get("n_runs", 1))  # ref: classification.py:75-77
    for run in range(n_runs):
        model, variables, tx, sched, train_l, valid_l = build_common(config)
        trainer = Trainer(
            model, variables, tx, sched, train_l, valid_l,
            config={**config["trainer"], "random_seed": config.seed + run},
            loss=config.get("loss", "cross_entropy"),
            metrics=config.get("metrics", ["accuracy"]),
            save_dir=config.save_dir, log_dir=config.log_dir,
            logger=logger, resume=config.resume)
        result = trainer.train()
        logger.info("run %d final: %s", run, result)


if __name__ == "__main__":
    main()
