from dlmc_quant_tpu.training import losses, metrics, schedulers  # noqa: F401
