"""Shared utilities: bit-reversal, profiling, checkpointing."""

from .bitrev import bit_reverse_indices, bit_reverse_int, bit_reverse_permute

__all__ = ["bit_reverse_indices", "bit_reverse_int", "bit_reverse_permute"]
