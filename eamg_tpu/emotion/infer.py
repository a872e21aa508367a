"""Emotion inference: the reference's four prediction modes plus
segment-wise transition analysis (emotion_analysis/inference.py:12-94),
backed by either the Flax DistilBERT (when a converted checkpoint is
available) or the deterministic lexicon fallback.

Unlike the reference, nothing is loaded at import time and there is no
network call in the request path.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

import jax

from ..models import distilbert as db
from .config import ID2LABEL
from .lexicon import predict_label as _lex_predict, scores as _lex_scores
from .segment import segment_text


def _packaged_ckpt_dir() -> str:
    """The in-repo distilled checkpoint (emotion/ckpt_distilbert), if it
    has been trained and shipped; '' otherwise."""
    d = os.path.join(os.path.dirname(__file__), "ckpt_distilbert")
    return d if os.path.isfile(os.path.join(d, "params.pkl")) else ""


class EmotionClassifier:
    """predict / predict_all_labels / predict_top_k_labels /
    predict_labels_above_threshold / analyze_emotion_transitions."""

    def __init__(self, backend: str = "auto",
                 checkpoint_dir: str | None = None, max_length: int = 128):
        self.max_length = max_length
        # resolution order: explicit arg > env var > the in-repo distilled
        # checkpoint (trained by emotion/train_scratch.py)
        checkpoint_dir = (checkpoint_dir
                          or os.environ.get("EAMG_EMOTION_CKPT", "")
                          or _packaged_ckpt_dir())
        self.backend = backend
        self._params = self._cfg = self._tok = None
        self._probs_cache: dict[str, np.ndarray] = {}
        if backend in ("auto", "distilbert") and checkpoint_dir and \
                os.path.isdir(checkpoint_dir):
            self._load_distilbert(checkpoint_dir)
            self.backend = "distilbert"
        elif backend == "distilbert":
            raise FileNotFoundError(
                "distilbert backend requested but no checkpoint dir found")
        else:
            self.backend = "lexicon"

    def _load_distilbert(self, ckpt_dir: str) -> None:
        """Load a converted checkpoint dir: params.pkl (our pytree),
        config.pkl (DistilBertConfig kwargs), vocab.txt (WordPiece)."""
        with open(os.path.join(ckpt_dir, "config.pkl"), "rb") as f:
            self._cfg = db.DistilBertConfig(**pickle.load(f))
        with open(os.path.join(ckpt_dir, "params.pkl"), "rb") as f:
            raw = pickle.load(f)
        # checkpoints may store f16 to stay small; compute in f32. Pin the
        # tree on DEVICE once: host-resident numpy params re-upload ~7 MB
        # per call over the tunnel (measured 155 ms/classify; ~2 ms pinned)
        import jax.numpy as jnp

        self._params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            else jnp.asarray(x), raw)
        self._tok = db.WordPieceTokenizer(
            os.path.join(ckpt_dir, "vocab.txt"))
        self.max_length = min(self.max_length,
                              self._cfg.max_position_embeddings)

    # ------------------------------------------------------------ scoring

    def _probs(self, text: str) -> np.ndarray:
        if self.backend == "lexicon":
            sc = _lex_scores(text)
            return np.asarray([sc[ID2LABEL[i]] for i in range(len(ID2LABEL))])
        # deterministic forward -> memoize per text (round 5): the
        # tunnel's ~25 ms host-fetch RPC dominates classify latency
        # (34-53 ms of every serve request), so repeated prompts (demo
        # UI replays, multi-section prompts with recurring sentences)
        # skip the device round-trip entirely. Bounded FIFO, thread-safe
        # enough for the threaded server (worst case: a duplicate
        # forward, never a wrong value).
        cached = self._probs_cache.get(text)
        if cached is not None:
            return cached
        import jax
        import jax.numpy as jnp

        enc = self._tok.encode(text, self.max_length)
        logits = db.forward(self._params,
                            jnp.asarray(enc["input_ids"])[None],
                            jnp.asarray(enc["attention_mask"])[None],
                            self._cfg)
        probs = np.asarray(jax.nn.softmax(logits[0]))
        if len(self._probs_cache) >= 512:
            # tolerant eviction under the threaded server: another
            # thread may pop the same first key or mutate the dict
            # mid-iteration; losing one eviction is harmless
            try:
                self._probs_cache.pop(next(iter(self._probs_cache)),
                                      None)
            except (RuntimeError, StopIteration):
                pass
        self._probs_cache[text] = probs
        return probs

    # ---------------------------------------------------- reference modes

    def predict(self, text: str) -> str:
        """Argmax label (inference.py:12-22)."""
        if self.backend == "lexicon":
            return _lex_predict(text)
        return ID2LABEL[int(np.argmax(self._probs(text)))]

    def predict_all_labels(self, text: str) -> dict:
        """{label: score rounded 4dp} (inference.py:26-38)."""
        probs = self._probs(text)
        return {ID2LABEL[i]: round(float(p), 4) for i, p in enumerate(probs)}

    def predict_top_k_labels(self, text: str, k: int = 3) -> list:
        """[(label, score)] top-k, descending (inference.py:41-60)."""
        probs = self._probs(text)
        idx = np.argsort(-probs, kind="stable")[:k]
        return [(ID2LABEL[int(i)], round(float(probs[i]), 4)) for i in idx]

    def predict_labels_above_threshold(self, text: str,
                                       threshold: float = 0.2) -> list:
        """[(label, score)] with score > threshold, in id order
        (inference.py:62-80)."""
        probs = self._probs(text)
        return [(ID2LABEL[i], round(float(p), 4))
                for i, p in enumerate(probs) if float(p) > threshold]

    def analyze_emotion_transitions(self, text: str) -> list:
        """[(segment, label)] per sentence (inference.py:83-94, completed —
        the reference marked it 'not done yet')."""
        return [(seg, self.predict(seg)) for seg in segment_text(text)]


_default: EmotionClassifier | None = None


def default_classifier() -> EmotionClassifier:
    global _default
    if _default is None:
        _default = EmotionClassifier()
    return _default


def predict(text: str) -> str:
    """Module-level convenience mirroring ``inference.predict``."""
    return default_classifier().predict(text)
