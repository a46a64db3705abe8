"""Scalar/vector function library (SURVEY §2.3 kernels as column builders)."""
