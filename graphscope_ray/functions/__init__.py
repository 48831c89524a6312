"""Vectorized per-batch kernels used inside ``map_batches`` stages."""
