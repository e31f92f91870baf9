"""Scalar/statistical functions: distributions, regression kernels, transforms."""
