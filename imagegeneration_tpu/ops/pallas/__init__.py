"""Pallas TPU kernels with pure-XLA fallbacks."""
