#!/usr/bin/env python
"""Multi-host / multi-device data-parallel training (baseline or QAT).

The TPU-native replacement for the reference's DDP entry points
(ref: example/baseline/DDP_classification.py:26-77 and
example/quantization/DDP_RootQ_train.py:30-120): no mp.spawn, no NCCL
process groups — one process per host, `jax.distributed.initialize()`
for the multi-host rendezvous, a `Mesh('data')` over every device, the
batch sharded on the data axis, and the gradient all-reduce inserted by
XLA SPMD (riding ICI).  Per-host data sharding replaces
DistributedSampler (`DataLoader.shard`), and non-zero hosts get NoOp
logging/checkpointing exactly like the reference's rank gating.

Usage (identical single-host):
    python examples/distributed_training.py -c <config.yaml>
Multi-host (one invocation per host; coordinator from env or flags):
    python examples/distributed_training.py -c <cfg> \
        --coordinator host0:8476 --num-hosts 2 --host-id $ID
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from classification import build_common  # noqa: E402
from dlmc_quant_tpu.parallel.mesh import make_mesh  # noqa: E402
from dlmc_quant_tpu.quant.config import scheme_from_dict  # noqa: E402
from dlmc_quant_tpu.quant.layers import calibrate  # noqa: E402
from dlmc_quant_tpu.training.qat import QATTrainer  # noqa: E402
from dlmc_quant_tpu.training.trainer import Trainer  # noqa: E402
from dlmc_quant_tpu.utils.config import ConfigParser  # noqa: E402
from dlmc_quant_tpu.utils.logging import setup_logging  # noqa: E402


def _dist_args(argv):
    """Split off the distributed flags; the rest goes to ConfigParser."""
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (multi-host only)")
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--host-id", type=int, default=0)
    ns, rest = p.parse_known_args(argv)
    return ns, rest


def main(argv=None):
    dist, rest = _dist_args(sys.argv[1:] if argv is None else argv)
    if dist.num_hosts > 1:
        # multi-host rendezvous (ref DDP: init_process_group('nccl'),
        # MASTER_ADDR/PORT — DDP_RootQ_train.py:50-55)
        jax.distributed.initialize(
            coordinator_address=dist.coordinator,
            num_processes=dist.num_hosts, process_id=dist.host_id)

    config = ConfigParser.from_args(rest)
    logger = setup_logging(
        config.log_dir if jax.process_index() == 0 else None)
    logger.info("hosts=%d host_id=%d devices=%d local=%d",
                jax.process_count(), jax.process_index(),
                jax.device_count(), jax.local_device_count())

    scheme = None
    if config.get("quantization"):
        scheme = scheme_from_dict(config["quantization"])

    model, variables, tx, sched, train_l, valid_l = build_common(
        config, scheme=scheme)
    # per-host shard of the global dataset
    # (ref: DistributedSampler — DDP_RootQ_train.py:81-97)
    train_l = train_l.shard(jax.process_index(), jax.process_count())
    mesh = make_mesh()            # 1-D data mesh over every device

    trainer_cls = QATTrainer if scheme is not None else Trainer
    kwargs = dict(
        config={**config["trainer"], "random_seed": config.seed},
        loss=config.get("loss", "cross_entropy"),
        metrics=config.get("metrics", ["accuracy"]),
        mesh=mesh, save_dir=config.save_dir, log_dir=config.log_dir,
        logger=logger, resume=config.resume)
    if scheme is not None:
        x0, _ = next(iter(train_l))
        variables = calibrate(model, variables, [jnp.asarray(x0)])
    trainer = trainer_cls(model, variables, tx, sched, train_l, valid_l,
                          **kwargs)
    result = trainer.train()
    logger.info("final: %s", result)


if __name__ == "__main__":
    main()
