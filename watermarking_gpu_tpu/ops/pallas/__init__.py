"""Fused Pallas TPU kernels for the stencil hot paths."""
