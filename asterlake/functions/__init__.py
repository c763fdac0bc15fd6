"""Scalar/column function helpers: surrogate keys, tolerant casts."""
