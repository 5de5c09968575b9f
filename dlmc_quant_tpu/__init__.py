"""dlmc_quant_tpu — a TPU-native model-quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
DLMC-QUANT reference toolkit (PyTorch):

* fake-quantization (quantize-dequantize emulation) of conv/linear weights
  and activations at arbitrary bit-widths (per-tensor / per-channel /
  per-pixel, signed/unsigned),
* PTQ calibration observers (minmax / l2loss grid-search / l2norm
  fixed-point / output-reconstruction / percentile histograms) expressed as
  jitted ``init/update/finalize`` state machines,
* QAT with LSQ (learned step size) and RootQ (root-base surrogate
  gradient) estimators,
* FSPTQ / RepAPQ fast PTQ for reparameterized (branch-fused) models,
* REAL int8/int4 execution via fused Pallas dequant+matmul / dequant+conv
  kernels (the reference only emulates in fp32),
* a training/serving framework: YAML config, trainers, step-based LR
  schedules, checkpointing, metrics, and SPMD parallelism over a
  ``jax.sharding.Mesh`` (data-parallel training, tensor-sharded quantized
  inference with continuous batching).

Everything is new TPU-first code; reference files are cited in docstrings
as ``ref: <path>:<lines>`` (relative to the upstream repo) so behavioral
parity can be checked.
"""

__version__ = "0.1.0"

from dlmc_quant_tpu.ops import numerics  # noqa: F401
