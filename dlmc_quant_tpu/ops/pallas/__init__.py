"""Pallas TPU kernels (the reference has no native kernels at all — it
emulates quantization in fp32 through cuDNN; ref: SURVEY.md §2.9).

One kernel remains: rpconv, the row-major dx-grouped fused int8 conv —
exact, 138–145 TOP/s on RepVGG stage shapes, kept as the measured
reference point.  XLA's own int8 lowering won the deploy hot path
(186–354 TOP/s fence-corrected); see quant/deploy.py's engine-choice
note and git history for the kernels retired along the way (implicit-
GEMM qconv, channel-major cmconv, int8_matmul)."""
