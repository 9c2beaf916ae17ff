"""Pallas TPU kernels for the detection hot path."""
