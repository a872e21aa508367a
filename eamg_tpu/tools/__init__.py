"""Offline tools: corpus building/analysis, checkpoint conversion."""

from .analysis import analyze_corpus, write_report
from .corpus import build_corpus_csv

__all__ = ["analyze_corpus", "build_corpus_csv", "write_report"]
