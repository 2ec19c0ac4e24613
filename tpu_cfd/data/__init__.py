"""Datasets, normalizers, GRF samplers, and data-generation drivers."""
