"""Tokenizer tests: Scheme A grammar, Scheme B explode, vocab dialects,
prompt assembly. Golden expectations are hand-derived from the reference
implementations (midi_tokenization.py, train_large*.py, api_cache.py)."""

import json

import pytest

from eamg_tpu.tokenizer import (END, PAD, START, SchemeB1, SchemeB2, SchemeB3,
                                Vocab, assemble_prompt, closest_bpm_token,
                                extract_data, key_to_idx, midi_tokenize,
                                normalize_key_signature, pitch_to_midi,
                                tokens_to_song)

SAMPLE_TOKENS = [
    "[START_SEQUENCE]",
    "[BPM] 120.0",
    "[KEY_SIGNATURE] A minor",
    "[INSTRUMENT] Violin",
    "[NOTE] [PITCH:C4] [START:0.12] [END:0.5] [DURATION:0.38]",
    "[NOTE] [PITCH:E4] [START:0.5] [END:1.0] [DURATION:0.5]",
    "[INSTRUMENT] Acoustic Grand Piano",
    "[NOTE] [PITCH:A3] [START:0.0] [END:2.0] [DURATION:2.0]",
    "[END_SEQUENCE]",
]


def test_midi_tokenize_fixture(fixture_mid):
    tokens = midi_tokenize(str(fixture_mid))
    assert tokens[0] == START and tokens[-1] == END
    assert tokens[1].startswith("[BPM] ")
    assert 170 < float(tokens[1].split()[-1]) < 176
    assert tokens[2].startswith("[KEY_SIGNATURE] ")
    inst_toks = [t for t in tokens if t.startswith("[INSTRUMENT]")]
    assert len(inst_toks) == 5
    note_toks = [t for t in tokens if t.startswith("[NOTE]")]
    assert len(note_toks) == 401
    # exact grammar: every note token matches the serving regex
    from eamg_tpu.tokenizer import NOTE_RE
    assert all(NOTE_RE.match(t) for t in note_toks)


def test_extract_data_shape(fixture_mid):
    data = extract_data(str(fixture_mid))
    assert set(data) == {"BPM", "Key Signature", "Instruments"}
    for name, notes in data["Instruments"].items():
        for n in notes:
            assert set(n) == {"name", "start", "end", "duration"}
            assert n["start"] == round(n["start"], 3)


def test_tokens_to_song_round_trip():
    song = tokens_to_song(SAMPLE_TOKENS)
    assert len(song.instruments) == 2
    v, p = song.instruments
    assert v.name == "Violin" and v.program == 40
    assert p.name == "Acoustic Grand Piano" and p.program == 0
    assert [(n.pitch, n.start, n.end) for n in v.notes] == [
        (60, 0.12, 0.5), (64, 0.5, 1.0)]
    assert [n.velocity for n in v.notes] == [100, 100]
    _, tempi = song.get_tempo_changes()
    assert tempi[0] == 120.0


def test_tokens_before_instrument_dropped():
    toks = ["[START_SEQUENCE]",
            "[NOTE] [PITCH:C4] [START:0.0] [END:1.0] [DURATION:1.0]",
            "[INSTRUMENT] Violin",
            "[NOTE] [PITCH:D4] [START:1.0] [END:2.0] [DURATION:1.0]"]
    song = tokens_to_song(toks)
    assert len(song.instruments) == 1
    assert [n.pitch for n in song.instruments[0].notes] == [62]


def test_unknown_instrument_gets_program_zero():
    song = tokens_to_song(["[INSTRUMENT] Kazoo Deluxe",
                           "[NOTE] [PITCH:C4] [START:0] [END:1] "
                           "[DURATION:1]"])
    assert song.instruments[0].program == 0
    assert song.instruments[0].name == "Kazoo Deluxe"


# ---------------------------------------------------------------- Scheme B

def test_scheme_b1_explode_exact():
    b1 = SchemeB1(seq_len=256)
    out = b1.explode(json.dumps(SAMPLE_TOKENS))
    # golden: hand-derived from train_large.py:39-55 at 10ms ticks
    assert out[:4] == ["[START_SEQUENCE]", "[BPM] 120.0",
                       "[KEY_SIGNATURE] A minor", "[INSTRUMENT] Violin"]
    assert out[4:13] == ["[NOTE]", "[PITCH]", "C4", "[START_T]", "12",
                         "[END_T]", "50", "[DUR_T]", "38"]
    assert out[-1] == "[END_SEQUENCE]"


def test_scheme_b1_truncation():
    b1 = SchemeB1(seq_len=6)
    out = b1.explode(json.dumps(SAMPLE_TOKENS))
    assert len(out) == 6


def test_scheme_b2_vocab_is_8324():
    b2 = SchemeB2()
    assert len(b2.vocab) == 8324  # paper §9.1 Table 4
    assert b2.vocab.tok2id["[PAD]"] == 0
    assert b2.vocab.tok2id["[NOTE]"] == 3
    assert b2.vocab.tok2id["P_0"] == 4
    assert b2.vocab.tok2id["T_0"] == 4 + 128
    assert b2.vocab.tok2id["DUR_0"] == 4 + 128 + 4096


def test_scheme_b2_explode_exact_strict_parity():
    """Reference bug reproduced: duration parsed as [:-2], losing its final
    digit ("0.38]" -> 0.3 -> DUR_6; "0.5]" -> "0." -> 0.0 -> DUR_0)."""
    b2 = SchemeB2()  # strict_parity=True default
    ids = b2.explode(json.dumps(SAMPLE_TOKENS))
    t2i = b2.vocab.tok2id
    assert ids[0] == t2i["[START_SEQ]"]
    assert ids[1:5] == [t2i["[NOTE]"], t2i["P_60"], t2i["T_2"], t2i["DUR_6"]]
    assert ids[5:9] == [t2i["[NOTE]"], t2i["P_64"], t2i["T_10"],
                        t2i["DUR_0"]]
    assert ids[-1] == t2i["[END_SEQ]"]


def test_scheme_b2_explode_corrected_mode():
    b2 = SchemeB2(strict_parity=False)
    ids = b2.explode(json.dumps(SAMPLE_TOKENS))
    t2i = b2.vocab.tok2id
    assert ids[1:5] == [t2i["[NOTE]"], t2i["P_60"], t2i["T_2"], t2i["DUR_8"]]
    assert ids[5:9] == [t2i["[NOTE]"], t2i["P_64"], t2i["T_10"],
                        t2i["DUR_10"]]


def test_scheme_b2_decode_to_song():
    b2 = SchemeB2()
    ids = b2.explode(json.dumps(SAMPLE_TOKENS))
    song = b2.decode_to_song(ids)
    notes = song.instruments[0].notes
    assert [(n.pitch, n.start) for n in notes] == [
        (60, 0.1), (64, 0.5), (57, 0.0)]


def test_scheme_b3_control_tokens():
    b3 = SchemeB3()
    assert len(b3.vocab) == 8324 + 231 + 24
    ids = b3.explode(json.dumps(SAMPLE_TOKENS))
    t2i = b3.vocab.tok2id
    assert ids[0] == t2i["[START_SEQ]"]
    assert ids[1] == t2i["BPM_120"]
    assert ids[2] == t2i["KEY_21"]  # A minor = 9 + 12
    assert ids[3] == t2i["[NOTE]"]


def test_scheme_b3_bpm_clamped():
    b3 = SchemeB3()
    ids = b3.explode(json.dumps(["[BPM] 999.0"]))
    assert ids[1] == b3.vocab.tok2id["BPM_250"]


def test_pitch_to_midi():
    assert pitch_to_midi("C4") == 60
    assert pitch_to_midi("A0") == 21
    assert pitch_to_midi("D-5") == 73   # '-' is a flat in the explode dialect
    assert pitch_to_midi("garbage") == 60
    assert pitch_to_midi("G9") == 127   # clamped from 127
    assert pitch_to_midi("B9") == 127   # clamped


def test_key_to_idx():
    assert key_to_idx("C major") == 0
    assert key_to_idx("A minor") == 21
    assert key_to_idx("B- Major") == 10
    assert key_to_idx("unparseable") == 0


# -------------------------------------------------------------- vocab

def test_vocab_dialects():
    seqs = [["b", "a", "c"]]
    v_mini = Vocab.from_sequences(seqs, pad_last=True)
    assert v_mini.tok2id == {"a": 0, "b": 1, "c": 2, "[PAD]": 3}
    v_large = Vocab.from_sequences(seqs, pad_last=False)
    assert v_large.tok2id == {"[PAD]": 0, "a": 1, "b": 2, "c": 3}
    assert v_large.decode(v_large.encode(["a", "c"])) == ["a", "c"]


# -------------------------------------------------------------- prompts

def make_serving_vocab():
    toks = [START, END, PAD, "[BPM] 100.0", "[BPM] 120.0", "[BPM] 140.5",
            "[KEY_SIGNATURE] A minor", "[INSTRUMENT] Violin"]
    return Vocab.from_list(toks)


def test_closest_bpm_token():
    v = make_serving_vocab()
    assert closest_bpm_token(v, 112) == "[BPM] 120.0"
    assert closest_bpm_token(v, 131) == "[BPM] 140.5"
    assert closest_bpm_token(v, 90) == "[BPM] 100.0"


def test_normalize_key_signature():
    assert normalize_key_signature("E♭ Major") == "[KEY_SIGNATURE] E- major"
    assert normalize_key_signature("C# Minor") == "[KEY_SIGNATURE] C# minor"
    assert normalize_key_signature("weird") == "[KEY_SIGNATURE] weird"


def test_assemble_prompt_reference_families():
    v = make_serving_vocab()
    mapping = {"bpm": 118, "key": "A Minor",
               "all_families": ["Strings", "Piano", "Drums"]}
    prompt = assemble_prompt(v, mapping)
    # Drums silently dropped (reference behavior, api_cache.py:152-156);
    # Piano maps to Acoustic Grand Piano.
    assert prompt == [START, "[BPM] 120.0", "[KEY_SIGNATURE] A minor",
                      "[INSTRUMENT] Violin",
                      "[INSTRUMENT] Acoustic Grand Piano"]


def test_assemble_prompt_full_gm():
    v = make_serving_vocab()
    mapping = {"bpm": 118, "key": "A Minor", "all_families": ["Drums"]}
    prompt = assemble_prompt(v, mapping, full_gm=True)
    assert "[INSTRUMENT] Taiko Drum" in prompt
