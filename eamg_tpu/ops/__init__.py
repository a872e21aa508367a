"""Pallas TPU kernels for the hot ops, with XLA-equivalent fallbacks."""

from .attention import flash_attention, xla_attention
from .decode_attention import (flash_decode, flash_decode_sp,
                               flash_decode_vmem, xla_decode_attention)
from .ffn import fused_ffn

__all__ = ["flash_attention", "flash_decode", "flash_decode_sp",
           "flash_decode_vmem", "fused_ffn", "xla_attention",
           "xla_decode_attention"]
