"""Synthesizer tests: note placement, envelopes, WAV output, determinism."""

import io
import wave as wave_mod

import numpy as np

from eamg_tpu.audio import SAMPLE_RATE, render_song, render_to_wav
from eamg_tpu.midi import Instrument, MidiSong, Note


def song_with(notes, program=0, is_drum=False):
    song = MidiSong(initial_tempo=120)
    inst = Instrument(program=program, is_drum=is_drum)
    inst.notes.extend(notes)
    song.instruments.append(inst)
    return song


def test_render_basic_note_a440():
    song = song_with([Note(100, 69, 0.1, 0.6)], program=73)  # Flute A4
    wave = render_song(song)
    assert wave.dtype == np.float32
    # silence before the note, energy during it
    assert np.abs(wave[:int(0.09 * SAMPLE_RATE)]).max() < 1e-6
    seg = wave[int(0.2 * SAMPLE_RATE):int(0.5 * SAMPLE_RATE)]
    assert np.abs(seg).max() > 0.01
    # dominant frequency ~440 Hz
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / SAMPLE_RATE)
    assert abs(freqs[int(np.argmax(spec))] - 440.0) < 5.0


def test_render_empty_song():
    wave = render_song(MidiSong())
    assert np.all(wave == 0.0)


def test_velocity_scales_amplitude():
    loud = render_song(song_with([Note(120, 60, 0.0, 0.5)]))
    soft = render_song(song_with([Note(30, 60, 0.0, 0.5)]))
    assert np.abs(loud).max() > 2.5 * np.abs(soft).max()


def test_no_clipping_many_notes():
    notes = [Note(120, 48 + (i % 24), 0.05 * i, 0.05 * i + 1.0)
             for i in range(64)]
    wave = render_song(song_with(notes))
    assert np.abs(wave).max() <= 1.0


def test_drum_renders_noise():
    wave = render_song(song_with([Note(100, 40, 0.0, 0.3)], program=116,
                                 is_drum=True))
    seg = wave[:int(0.2 * SAMPLE_RATE)]
    assert np.abs(seg).max() > 0.01
    # noise: flat-ish spectrum, no single dominant harmonic
    spec = np.abs(np.fft.rfft(seg))
    assert spec.max() < 20 * np.median(spec[spec > 0])


def test_deterministic_given_seed():
    song = song_with([Note(100, 60, 0.0, 0.5), Note(90, 64, 0.5, 1.0)])
    a = render_song(song, seed=3)
    b = render_song(song, seed=3)
    np.testing.assert_array_equal(a, b)


def test_wav_round_trip():
    song = song_with([Note(100, 69, 0.0, 0.4)], program=40)
    buf = io.BytesIO()
    render_to_wav(song, buf)
    buf.seek(0)
    w = wave_mod.open(buf, "rb")
    assert w.getframerate() == SAMPLE_RATE
    assert w.getnchannels() == 1
    assert w.getsampwidth() == 2
    frames = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert len(frames) > SAMPLE_RATE // 4
    assert np.abs(frames).max() > 100


def test_fixture_song_renders(fixture_mid):
    song = MidiSong(str(fixture_mid))
    # trim to the first 4 seconds of notes to keep the test fast
    for inst in song.instruments:
        inst.notes = [n for n in inst.notes if n.start < 4.0]
    song.instruments = [i for i in song.instruments if i.notes]
    wave = render_song(song)
    assert np.abs(wave).max() > 0.01
    assert np.isfinite(wave).all()

# ---------------------------------------------------------------- fluidsynth

def test_auto_render_falls_back_to_synth(monkeypatch):
    """Without a fluidsynth binary the auto adapter must produce the same
    bytes as the additive synth."""
    from eamg_tpu.audio import render_to_wav_auto

    monkeypatch.setenv("EAMG_NO_FLUIDSYNTH", "1")
    song = song_with([Note(100, 69, 0.0, 0.4)], program=40)
    a, b = io.BytesIO(), io.BytesIO()
    render_to_wav_auto(song, a, seed=1)
    render_to_wav(song, b, seed=1)
    assert a.getvalue() == b.getvalue()


def test_find_fluidsynth_env_override(tmp_path, monkeypatch):
    from eamg_tpu.audio import find_fluidsynth

    fake_bin = tmp_path / "fluidsynth"
    fake_bin.write_text("#!/bin/sh\n")
    fake_bin.chmod(0o755)
    sf2 = tmp_path / "gm.sf2"
    sf2.write_bytes(b"RIFF")
    monkeypatch.setenv("EAMG_FLUIDSYNTH", str(fake_bin))
    monkeypatch.setenv("EAMG_SOUNDFONT", str(sf2))
    assert find_fluidsynth() == (str(fake_bin), str(sf2))


def test_fluidsynth_render_when_available():
    """Runs the real CLI path only on hosts that have binary + soundfont
    (reference api_cache.py:234-235)."""
    import pytest

    from eamg_tpu.audio import find_fluidsynth, render_to_wav_fluidsynth

    found = find_fluidsynth()
    if found is None:
        pytest.skip("no fluidsynth binary / soundfont on this host")
    song = song_with([Note(100, 69, 0.0, 0.4)], program=40)
    buf = io.BytesIO()
    render_to_wav_fluidsynth(song, buf, *found)
    assert buf.getvalue()[:4] == b"RIFF"


def test_auto_render_recovers_from_broken_binary(tmp_path, monkeypatch):
    """A present-but-broken fluidsynth install must not break requests."""
    from eamg_tpu.audio import render_to_wav_auto

    fake_bin = tmp_path / "fluidsynth"
    fake_bin.write_text("#!/bin/sh\nexit 1\n")
    fake_bin.chmod(0o755)
    sf2 = tmp_path / "gm.sf2"
    sf2.write_bytes(b"RIFF")
    monkeypatch.delenv("EAMG_NO_FLUIDSYNTH", raising=False)
    monkeypatch.setenv("EAMG_FLUIDSYNTH", str(fake_bin))
    monkeypatch.setenv("EAMG_SOUNDFONT", str(sf2))
    song = song_with([Note(100, 69, 0.0, 0.4)], program=40)
    buf = io.BytesIO()
    render_to_wav_auto(song, buf, seed=1)
    assert buf.getvalue()[:4] == b"RIFF"  # fell back to the synth WAV
