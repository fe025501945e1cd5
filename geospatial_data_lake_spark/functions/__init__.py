"""Scalar-function catalog and hashing kernels."""
