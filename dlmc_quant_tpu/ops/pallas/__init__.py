"""Pallas TPU kernels: fused dequant matmul/conv for real int8/int4
execution (the reference has no native kernels at all — it emulates
quantization in fp32 through cuDNN; ref: SURVEY.md §2.9)."""
