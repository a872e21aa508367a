"""Compiled decode runtime: while-loop generation + on-device sampling."""

from .api import Generator
from .loop import generate_full, generate_kv
from .sampling import apply_top_k, sample_token, token_log_prob

__all__ = ["Generator", "apply_top_k", "generate_full", "generate_kv",
           "sample_token", "token_log_prob"]
