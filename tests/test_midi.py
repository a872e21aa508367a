"""MIDI codec tests: SMF parse/write round trip, GM tables, key analysis."""

import io

import numpy as np
import pytest

from eamg_tpu.midi import (GM_INSTRUMENT_NAMES, Instrument, MidiSong, Note,
                           analyze_key, instrument_name_to_program,
                           key_name_to_index, note_name_to_number,
                           note_number_to_name, program_to_family_name)


def test_note_names_round_trip():
    for n in range(128):
        assert note_name_to_number(note_number_to_name(n)) == n
    assert note_number_to_name(60) == "C4"
    assert note_number_to_name(61) == "C#4"
    assert note_name_to_number("C-1") == 0  # '-' binds to octave
    assert note_name_to_number("Db5") == 73
    assert note_name_to_number("D♭5") == 73
    assert note_name_to_number("F♯3") == 54
    with pytest.raises(ValueError):
        note_name_to_number("H2")


def test_gm_tables():
    assert len(GM_INSTRUMENT_NAMES) == 128
    assert instrument_name_to_program("Violin") == 40
    assert instrument_name_to_program("Acoustic Grand Piano") == 0
    assert instrument_name_to_program("Flute") == 73
    assert program_to_family_name(40) == "Strings"
    assert program_to_family_name(0) == "Piano"
    assert program_to_family_name(73) == "Pipe"


def test_parse_fixture(fixture_mid):
    song = MidiSong(str(fixture_mid))
    times, tempi = song.get_tempo_changes()
    assert times[0] == 0.0
    assert 170 < tempi[0] < 176  # fixture is ~173 BPM
    assert len(song.instruments) == 5
    assert sum(len(i.notes) for i in song.instruments) == 401
    assert song.get_end_time() > 30.0
    names = {song.instrument_display_name(i) for i in song.instruments}
    assert "Fretless Bass" in names


def test_write_round_trip(fixture_mid):
    song = MidiSong(str(fixture_mid))
    buf = io.BytesIO()
    song.write(buf)
    song2 = MidiSong(buf.getvalue())
    # Same multiset of note-on and note-off events (overlapping same-pitch
    # notes make the on/off *pairing* inherently ambiguous in SMF).
    def ons(s):
        return sorted((n.pitch, round(n.start, 4))
                      for i in s.instruments for n in i.notes)

    def offs(s):
        return sorted((n.pitch, round(n.end, 4))
                      for i in s.instruments for n in i.notes)

    assert ons(song) == ons(song2)
    assert offs(song) == offs(song2)
    t1, b1 = song.get_tempo_changes()
    t2, b2 = song2.get_tempo_changes()
    np.testing.assert_allclose(b1[0], b2[0], rtol=1e-4)


def test_write_from_scratch_and_tempo():
    song = MidiSong(initial_tempo=90.0)
    inst = Instrument(program=40, name="Violin")
    inst.notes.append(Note(velocity=100, pitch=69, start=0.5, end=1.25))
    inst.notes.append(Note(velocity=100, pitch=72, start=1.25, end=2.0))
    song.instruments.append(inst)
    buf = io.BytesIO()
    song.write(buf)
    rt = MidiSong(buf.getvalue())
    _, tempi = rt.get_tempo_changes()
    assert abs(tempi[0] - 90.0) < 0.01
    assert len(rt.instruments) == 1
    assert rt.instruments[0].program == 40
    assert rt.instruments[0].name == "Violin"
    got = [(n.pitch, round(n.start, 3), round(n.end, 3))
           for n in rt.instruments[0].notes]
    assert got == [(69, 0.5, 1.25), (72, 1.25, 2.0)]


def test_key_analysis_c_major_scale():
    song = MidiSong()
    inst = Instrument(program=0)
    for k, pitch in enumerate([60, 62, 64, 65, 67, 69, 71, 72]):
        inst.notes.append(Note(100, pitch, k * 0.5, (k + 1) * 0.5))
    # weight the tonic
    inst.notes.append(Note(100, 60, 4.0, 6.0))
    inst.notes.append(Note(100, 67, 4.0, 5.0))
    song.instruments.append(inst)
    assert analyze_key(song) == "C major"


def test_key_analysis_a_minor():
    song = MidiSong()
    inst = Instrument(program=0)
    # A harmonic minor flavour: emphasize A, C, E with G#
    seq = [57, 60, 64, 57, 56, 64, 60, 57, 69, 64]
    for k, pitch in enumerate(seq):
        inst.notes.append(Note(100, pitch, k * 0.5, (k + 1) * 0.5))
    inst.notes.append(Note(100, 57, 5.0, 7.0))
    song.instruments.append(inst)
    assert analyze_key(song) == "a minor"


def test_key_index():
    assert key_name_to_index("C major") == 0
    assert key_name_to_index("a minor") == 21
    assert key_name_to_index("B- major") == 10
    assert key_name_to_index("b♭ major") == 10
    assert key_name_to_index("F# minor") == 18
    assert key_name_to_index("gibberish") == 0


def test_fixture_key_is_stable(fixture_mid):
    song = MidiSong(str(fixture_mid))
    key = analyze_key(song)
    tonic, mode = key.split()
    assert mode in ("major", "minor")
    assert analyze_key(song) == key  # deterministic
