from dlmc_quant_tpu.ops import numerics, rootq_math  # noqa: F401
