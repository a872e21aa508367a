"""Compiled decode runtime: while-loop generation + on-device sampling."""

from .api import Generator
from .loop import generate_full, generate_kv
from .sampling import apply_top_k, sample_token, token_log_prob
from .speculative import generate_speculative

__all__ = ["Generator", "apply_top_k", "generate_full", "generate_kv",
           "generate_speculative", "sample_token", "token_log_prob"]
