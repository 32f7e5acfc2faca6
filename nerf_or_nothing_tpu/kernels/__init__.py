"""Pallas TPU kernels — the native hot path (replaces accelerated_functions.cu)."""
