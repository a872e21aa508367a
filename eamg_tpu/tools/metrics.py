"""Evaluation metrics: the paper's §10.4 ablation table reproductions.

The reference repo shipped no evaluation tooling (SURVEY.md §4) — PPL /
MSE-Tune / MOS were computed out-of-repo. Here:

- perplexity lives in ``decode/replay.py`` (teacher-forced);
- **tempo-conditioning error** ("MSE-Tune"): generate conditioned on a BPM
  control token, estimate the realized tempo from inter-onset intervals,
  report squared error of the (normalized) deviation;
- label accuracy helper for the classifier.
"""

from __future__ import annotations

import numpy as np

from ..midi.smf import MidiSong


def estimate_bpm(song: MidiSong, min_bpm: float = 40.0,
                 max_bpm: float = 250.0) -> float | None:
    """Estimate tempo from note onsets: the dominant inter-onset interval
    (mode of quantized IOIs) is taken as the beat or an integer
    subdivision; folded into [min_bpm, max_bpm]."""
    onsets = sorted({round(n.start, 3) for inst in song.instruments
                     for n in inst.notes})
    if len(onsets) < 4:
        return None
    iois = np.diff(onsets)
    iois = iois[(iois > 0.02) & (iois < 4.0)]
    if len(iois) == 0:
        return None
    # histogram over log-spaced bins; pick the modal interval
    hist, edges = np.histogram(iois, bins=48)
    mode = (edges[hist.argmax()] + edges[hist.argmax() + 1]) / 2
    bpm = 60.0 / mode
    while bpm > max_bpm:
        bpm /= 2.0
    while bpm < min_bpm:
        bpm *= 2.0
    return float(bpm)


def tempo_mse(pairs: list[tuple[float, float | None]]) -> float:
    """Mean squared *relative* tempo error over (target_bpm,
    estimated_bpm) pairs; beat/half/double-time ambiguity folded out.
    Pairs with no estimate are skipped."""
    errs = []
    for target, est in pairs:
        if est is None:
            continue
        candidates = [est, est * 2, est / 2]
        rel = min(abs(c - target) / target for c in candidates)
        errs.append(rel ** 2)
    return float(np.mean(errs)) if errs else float("nan")


def classification_accuracy(predict_fn, texts: list[str],
                            labels: list[int], id2label: dict) -> float:
    hits = sum(predict_fn(t) == id2label[l]
               for t, l in zip(texts, labels))
    return hits / max(len(texts), 1)
