"""Sparse operator layer: multiply chains, SpMV/SpMM, SpGEMM."""

from .multiply import multiply, multiply_mv, multiply_chain, expansion_size

__all__ = ["multiply", "multiply_mv", "multiply_chain", "expansion_size"]
