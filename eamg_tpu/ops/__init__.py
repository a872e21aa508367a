"""Pallas TPU kernels for the hot ops, with XLA-equivalent fallbacks."""

from .attention import flash_attention, xla_attention
from .ffn import fused_ffn

__all__ = ["flash_attention", "fused_ffn", "xla_attention"]
