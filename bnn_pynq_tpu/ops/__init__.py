"""Compute ops: bit packing, golden references, Pallas kernels."""
