"""Pallas TPU kernels for the hot dense-flow ops."""
