"""Scalar/vectorized functions used inside ``map_batches`` stages."""
