"""Numerical operators: special functions, quadrature rules, Pallas kernels."""
