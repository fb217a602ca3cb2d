"""Math ops: Pallas TPU kernels with pure-XLA fallbacks, matrix sqrt, etc."""
