"""Compiled decode runtime: while-loop generation + on-device sampling."""

from .api import Generator
from .grammar import Grammar, grammar_for
from .loop import generate_full, generate_kv
from .ragged import generate_kv_ragged
from .sampling import apply_top_k, sample_token, token_log_prob
from .speculative import generate_prompt_lookup, generate_speculative
from .stream import stream_tokens

__all__ = ["Generator", "Grammar", "apply_top_k", "generate_full",
           "generate_kv", "generate_kv_ragged", "generate_prompt_lookup",
           "generate_speculative", "grammar_for", "sample_token",
           "stream_tokens", "token_log_prob"]
