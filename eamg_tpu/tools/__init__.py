"""Offline tools: corpus building/analysis, conversion, metrics, native IO."""

from .analysis import analyze_corpus, write_report
from .corpus import build_corpus_csv
from .metrics import classification_accuracy, estimate_bpm, tempo_mse

__all__ = ["analyze_corpus", "build_corpus_csv", "classification_accuracy",
           "estimate_bpm", "tempo_mse", "write_report"]
