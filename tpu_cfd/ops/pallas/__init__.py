"""Pallas TPU kernels for profiled hot ops."""
