"""C++ host synthesizer: same algorithm as the JAX renderer — tonal
content must match closely (drums share energy, not samples)."""

import numpy as np
import pytest

from eamg_tpu.audio import SAMPLE_RATE, render_song
from eamg_tpu.audio.native_synth import (native_synth_available,
                                         render_song_native)
from eamg_tpu.midi import Instrument, MidiSong, Note

pytestmark = pytest.mark.skipif(not native_synth_available(),
                                reason="no C++ toolchain")


def song_with(notes, program=0, is_drum=False):
    song = MidiSong(initial_tempo=120)
    inst = Instrument(program=program, is_drum=is_drum)
    inst.notes.extend(notes)
    song.instruments.append(inst)
    return song


def test_tonal_waveform_matches_jax():
    song = song_with([Note(100, 69, 0.1, 0.6), Note(90, 72, 0.5, 1.2),
                      Note(110, 60, 0.9, 1.5)], program=40)
    a = render_song(song, seed=0)
    b = render_song_native(song, seed=0)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    # same formulas, different float-op order: demand high correlation and
    # matched energy
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    ea, eb = float(np.sum(a ** 2)), float(np.sum(b ** 2))
    assert abs(ea - eb) / max(ea, 1e-9) < 0.02


def test_dominant_frequency():
    song = song_with([Note(100, 69, 0.0, 0.6)], program=73)  # A4 flute
    w = render_song_native(song)
    seg = w[int(0.1 * SAMPLE_RATE):int(0.5 * SAMPLE_RATE)]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / SAMPLE_RATE)
    assert abs(freqs[int(np.argmax(spec))] - 440.0) < 5.0


def test_drum_energy_matches():
    song = song_with([Note(100, 40, 0.0, 0.4)], program=116, is_drum=True)
    a = render_song(song, seed=1)
    b = render_song_native(song, seed=1)
    n = min(len(a), len(b))
    ea, eb = float(np.sum(a[:n] ** 2)), float(np.sum(b[:n] ** 2))
    # noise PRNGs differ; energy envelope must agree within ~3x
    assert 0.3 < ea / max(eb, 1e-9) < 3.0


def test_empty_song():
    w = render_song_native(MidiSong())
    assert np.all(w == 0.0)


def test_deterministic():
    song = song_with([Note(100, 60, 0.0, 0.5)], program=0)
    a = render_song_native(song, seed=2)
    b = render_song_native(song, seed=2)
    np.testing.assert_array_equal(a, b)
