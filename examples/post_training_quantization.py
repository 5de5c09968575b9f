#!/usr/bin/env python
"""PTQ entry point: calibrate a model's quantizers and evaluate.

Usage:
    python examples/post_training_quantization.py \
        -c examples/configs/PTQ_resnet18_cifar10_w8a8.yaml

ref: example/quantization/post_training_quantization.py:22-116
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dlmc_quant_tpu.training.ptq import run_ptq
from dlmc_quant_tpu.utils.config import ConfigParser
from dlmc_quant_tpu.utils.logging import setup_logging


def main():
    config = ConfigParser.from_args()
    logger = setup_logging(config.log_dir)
    results = run_ptq(config, logger)
    logger.info("== PTQ summary ==")
    logger.info("fp32 : %s", results["fp32"])
    logger.info("quant: %s", results["quant"])


if __name__ == "__main__":
    main()
