#!/usr/bin/env python
"""QAT entry point (LSQ or RootQ, selected by the YAML quantization
section's quantization_type).

ref: example/quantization/quantization_aware_training.py and
RootQ_train.py:23-106 (incl. wt_alpha param-group LR and repeat runs).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from classification import build_common  # noqa: E402
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402
from dlmc_quant_tpu.training.qat import QATTrainer  # noqa: E402
from dlmc_quant_tpu.utils.config import ConfigParser  # noqa: E402
from dlmc_quant_tpu.utils.logging import setup_logging  # noqa: E402


def main():
    config = ConfigParser.from_args()
    logger = setup_logging(config.log_dir)
    scheme = scheme_from_dict(config["quantization"])

    # RootQ: wt_alpha gets its own LR (ref: RootQ_train.py:65-74)
    opt_spec = dict(config["optimizer"])
    alpha_lr = config.get("alpha_lr")
    if alpha_lr and not opt_spec.get("param_groups"):
        opt_spec["param_groups"] = [("wt_alpha", {"lr": float(alpha_lr)})]
        config.config["optimizer"] = opt_spec

    n_runs = int(config.get("n_runs", 1))  # ref: RootQ_train.py:103-105
    for run in range(n_runs):
        model, variables, tx, sched, train_l, valid_l = build_common(
            config, scheme=scheme)
        x0, _ = next(iter(train_l))
        variables = calibrate(model, variables, [jnp.asarray(x0)])
        trainer = QATTrainer(
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
