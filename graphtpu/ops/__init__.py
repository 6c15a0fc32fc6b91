"""Hot-path kernels (XLA-fused formulations + Pallas where profitable).

The reference fork's native accelerator layer is the CUDA CDLP kernel file
(src/main/c/src/algorithms/cdlp_kernel.cu, five variants); this package is
its TPU counterpart: degree-bucketed padded slabs instead of per-row hash
tables (no atomics on TPU), row-local bitonic sorts in place of shared-mem
histograms, and Pallas kernels where XLA's stock lowering leaves
performance on the table.
"""
