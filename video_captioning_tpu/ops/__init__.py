"""Pallas TPU kernels (flag-gated; XLA paths remain reference semantics)."""
