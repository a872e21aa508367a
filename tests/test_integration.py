"""The full reference user journey, end to end, on real MIDI data:

  .mid files -> corpus CSV (tokenize) -> train (mini preset) ->
  load checkpoint -> emotion-conditioned generation -> MIDI bytes ->
  WAV render.

This is the workflow the reference documents across README.md, train/ and
api_cache.py — here exercised as one test on the in-repo fixture.
"""

import json
import shutil

import numpy as np
import pytest

from eamg_tpu.decode import Generator
from eamg_tpu.emotion import EmotionClassifier, get_music_params
from eamg_tpu.midi import MidiSong
from eamg_tpu.serve import Pipeline
from eamg_tpu.tokenizer import Vocab
from eamg_tpu.tools.corpus import build_corpus_csv
from eamg_tpu.train.run import run_training
from eamg_tpu.utils import load_checkpoint


def test_full_user_journey(tmp_path, fixture_mid):
    # 1. corpus from real MIDI
    midi_dir = tmp_path / "midis"
    midi_dir.mkdir()
    for i in range(3):
        shutil.copy(fixture_mid, midi_dir / f"track{i}.mid")
    csv_path = tmp_path / "corpus.csv"
    stats = build_corpus_csv(str(midi_dir), str(csv_path))
    assert stats["written"] == 3

    # 2. train the mini preset on it (1 epoch; loss finite)
    out = run_training("mini", csv_path=str(csv_path),
                       out_dir=str(tmp_path / "ckpt"), epochs=1)
    assert np.isfinite(out["final_loss"])

    # 3. serve from the trained checkpoint through the full pipeline.
    # The fixture's analyzed key is "A major", so "excitement" (EATS key
    # A Major) maps onto a vocab-known control token...
    ckpt = load_checkpoint(str(tmp_path / "ckpt" / "final"))
    gen = Generator(ckpt["params"], ckpt["cfg"], Vocab(ckpt["vocab"]))
    pipe = Pipeline(gen, EmotionClassifier(backend="lexicon"))
    res = pipe.generate("I am thrilled and excited about tonight", seed=3)

    assert res.label == "excitement"
    # key + BPM control tokens resolved against the corpus vocab; only the
    # instrument the fixture never contained gets dropped
    assert all(t.startswith("[INSTRUMENT]") for t in res.dropped_tokens)
    assert any(t.startswith("[KEY_SIGNATURE]") for t in res.prompt_tokens)
    assert res.midi_bytes[:4] == b"MThd"
    assert res.wav_bytes[:4] == b"RIFF"
    # the generated MIDI parses and the prompt honored the EATS mapping
    song = MidiSong(res.midi_bytes)
    assert isinstance(song.get_end_time(), float)
    bpm_tok = res.prompt_tokens[1]
    assert bpm_tok.startswith("[BPM] ")
    # closest-vocab-BPM: the single fixture BPM (~173) is the only
    # [BPM] token in this tiny vocab
    assert 170 < float(bpm_tok.split()[-1]) < 176

    # ...while "joy" (C Major — absent from this corpus) degrades
    # gracefully: the unknown key token is dropped and reported (the
    # reference crashed with a KeyError here, api_cache.py:162)
    res_joy = pipe.generate("I am so happy and glad today", seed=3)
    assert res_joy.label == "joy"
    assert "[KEY_SIGNATURE] C major" in res_joy.dropped_tokens
    assert res_joy.midi_bytes[:4] == b"MThd"

    # 4. the vocabulary round-trips through the checkpoint
    assert "[START_SEQUENCE]" in ckpt["vocab"]
    assert any(t.startswith("[KEY_SIGNATURE]") for t in ckpt["vocab"])


def test_logging_utils():
    import io

    from eamg_tpu.utils.logging import JsonLogger, LatencyStats, timed

    buf = io.StringIO()
    logger = JsonLogger(stream=buf, component="test")
    logger.log("hello", n=3)
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "hello" and rec["n"] == 3
    assert rec["component"] == "test"

    stats = LatencyStats(window=4)
    for v in (0.01, 0.02, 0.03, 0.04, 0.05):
        stats.observe(v, tokens=10)
    s = stats.summary()
    assert s["count"] == 5 and s["tokens"] == 50
    assert s["p50_ms"] >= 20  # window keeps the last 4

    with timed(stats, logger, event="op") as h:
        h["tokens"] = 7
    assert stats.summary()["count"] == 6
    assert "op" in buf.getvalue()
