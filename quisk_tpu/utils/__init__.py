"""Utilities: jit-boundary packing, tracing, metrics."""
