"""Discrete operators: finite differences, interpolation, spectral calculus,
fast diagonalization, and Pallas kernels for profiled hot spots."""
