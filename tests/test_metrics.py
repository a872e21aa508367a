"""Eval metrics + multihost helper tests."""

import numpy as np

from eamg_tpu.midi import Instrument, MidiSong, Note
from eamg_tpu.tools.metrics import (classification_accuracy, estimate_bpm,
                                    tempo_mse)


def song_at_bpm(bpm: float, n_notes: int = 32, jitter: float = 0.0,
                seed: int = 0) -> MidiSong:
    rng = np.random.default_rng(seed)
    beat = 60.0 / bpm
    song = MidiSong(initial_tempo=bpm)
    inst = Instrument(program=0)
    t = 0.0
    for _ in range(n_notes):
        start = t + rng.uniform(-jitter, jitter)
        inst.notes.append(Note(100, 60 + int(rng.integers(0, 12)),
                               max(start, 0.0), max(start, 0.0) + beat * 0.8))
        t += beat
    song.instruments.append(inst)
    return song


def test_estimate_bpm_clean():
    for bpm in (80.0, 120.0, 150.0):
        est = estimate_bpm(song_at_bpm(bpm))
        folded = min(abs(c - bpm) for c in (est, est * 2, est / 2))
        assert folded / bpm < 0.12, (bpm, est)


def test_estimate_bpm_too_few_notes():
    assert estimate_bpm(MidiSong()) is None


def test_tempo_mse():
    pairs = [(120.0, 121.0), (90.0, 45.2), (60.0, None)]
    mse = tempo_mse(pairs)
    assert 0 <= mse < 0.01  # half-time folded, None skipped
    assert np.isnan(tempo_mse([(100.0, None)]))


def test_classification_accuracy():
    id2label = {0: "joy", 1: "fear"}
    acc = classification_accuracy(
        lambda t: "joy" if "happy" in t else "fear",
        ["so happy", "scary night", "happy again"], [0, 1, 1], id2label)
    assert abs(acc - 2 / 3) < 1e-9


def test_multihost_single_process():
    from eamg_tpu.parallel.multihost import (broadcast_bytes,
                                             init_distributed,
                                             is_main_process)

    init_distributed()  # no coordinator -> no-op
    assert is_main_process()
    assert broadcast_bytes(b"vocab-blob") == b"vocab-blob"
