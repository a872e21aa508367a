"""Emotion layer tests: EATS table/mapping semantics, segmentation,
lexicon fallback, and the predict_* API surface."""

import random

import pytest

from eamg_tpu.emotion import (EATS, EmotionClassifier, ID2LABEL, NUM_LABELS,
                              get_music_params, segment_text)


def test_label_space():
    assert NUM_LABELS == 28
    assert ID2LABEL[0] == "admiration"
    assert ID2LABEL[27] == "neutral"
    assert len(set(ID2LABEL.values())) == 28


def test_lookup_table_contents():
    assert len(EATS) == 28
    joy = EATS["joy"]
    assert joy["bpm_min"] == 120 and joy["bpm_max"] == 150
    assert joy["key"] == "C Major"
    assert joy["instrument_families"] == ["Piano", "Strings", "Drums"]
    # unicode quirks preserved: ♭ in keys, U+00A0 in Chromatic Percussion
    assert EATS["love"]["key"] == "E♭ Major"
    assert "Chromatic\xa0Percussion" in EATS["curiosity"][
        "instrument_families"]


def test_get_music_params_contract():
    p = get_music_params("Joy", seed=0)
    assert p["emotion"] == "joy"
    assert EATS["joy"]["bpm_min"] <= p["bpm"] <= EATS["joy"]["bpm_max"]
    assert p["key"] == "C Major"
    assert p["inst_family"] in p["all_families"]
    assert p["all_families"] == EATS["joy"]["instrument_families"]


def test_get_music_params_seeded_reproducible():
    a = get_music_params("sadness", seed=7)
    b = get_music_params("sadness", seed=7)
    assert a == b
    # matches stdlib random semantics (randint then choice)
    rng = random.Random(7)
    assert a["bpm"] == rng.randint(60, 80)
    assert a["inst_family"] == rng.choice(["Piano", "Strings"])


def test_get_music_params_list_input():
    out = get_music_params(["joy", "fear"], seed=1)
    assert isinstance(out, list) and len(out) == 2
    assert out[0]["emotion"] == "joy" and out[1]["emotion"] == "fear"


def test_unknown_emotion_raises():
    with pytest.raises(ValueError):
        get_music_params("melancholy")


def test_segment_text():
    out = segment_text("I am happy. Dr. Smith agrees! Is that so? Yes.")
    assert out == ["I am happy.", "Dr. Smith agrees!", "Is that so?", "Yes."]
    assert segment_text("") == []
    assert segment_text("no terminator") == ["no terminator"]
    assert segment_text("Pi is 3.14 exactly. Next.") == [
        "Pi is 3.14 exactly.", "Next."]


def test_lexicon_predictions():
    clf = EmotionClassifier(backend="lexicon")
    assert clf.predict("I am so happy and glad today, what a sunny day") == \
        "joy"
    assert clf.predict("I am terrified and scared of the dark") == "fear"
    assert clf.predict("thank you so much, I really appreciate it") == \
        "gratitude"
    assert clf.predict("the weather report says rain at 3pm") == "neutral"


def test_predict_all_labels_shape():
    clf = EmotionClassifier(backend="lexicon")
    scores = clf.predict_all_labels("I love this so much")
    assert set(scores) == set(ID2LABEL.values())
    assert abs(sum(scores.values()) - 1.0) < 0.01
    assert max(scores, key=scores.get) == "love"


def test_predict_top_k():
    clf = EmotionClassifier(backend="lexicon")
    top = clf.predict_top_k_labels("I love this so much", k=3)
    assert len(top) == 3
    assert top[0][0] == "love"
    assert top[0][1] >= top[1][1] >= top[2][1]


def test_predict_above_threshold():
    clf = EmotionClassifier(backend="lexicon")
    out = clf.predict_labels_above_threshold("I love this", threshold=0.05)
    assert all(score > 0.05 for _, score in out)
    assert "love" in [lab for lab, _ in out]


def test_transitions():
    clf = EmotionClassifier(backend="lexicon")
    out = clf.analyze_emotion_transitions(
        "I am so happy today. But I am scared of tomorrow.")
    assert len(out) == 2
    assert out[0][1] == "joy" and out[1][1] == "fear"


def test_module_level_predict():
    """inference.predict-style module convenience (the reference's
    module-global pattern, without import-time model loading)."""
    from eamg_tpu.emotion import predict

    assert predict("I am so happy and glad today") == "joy"
    assert predict("I am terrified of the dark") == "fear"
