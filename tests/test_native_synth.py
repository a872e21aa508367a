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


# ---- SF2 modulated-voice twin (VERDICT r3 #5: Python<->C++ parity) -----


def test_vel_modulator_helpers_match_python():
    from eamg_tpu.audio.native_synth import (vel2att_gain_native,
                                             vel2fc_hz_native)
    from eamg_tpu.audio.sf2 import (_abs_cents_to_hz, _cb_to_gain,
                                    vel_to_atten_cb, vel_to_fc_cents)

    for vel in (1, 17, 40, 64, 99, 127):
        for amt in (0.0, 480.0, 960.0):
            py = _cb_to_gain(vel_to_atten_cb(vel, amt))
            assert abs(vel2att_gain_native(vel, amt) - py) < 1e-12
        for fc_cents in (8321.0, 13500.0):
            for amt in (0.0, -1200.0, -2400.0):
                py = min(_abs_cents_to_hz(
                    fc_cents + vel_to_fc_cents(vel, amt)), 20000.0)
                assert abs(vel2fc_hz_native(fc_cents, vel, amt)
                           - py) / py < 1e-12


def test_sf2_voice_waveform_matches_device():
    """The C++ voice twin reproduces the device kernel (unfiltered path)
    sample-for-sample within float32 tolerance — looped read, envelope,
    velocity-modulated gain, vibrato."""
    import jax.numpy as jnp

    from eamg_tpu.audio.native_synth import sf2_voice_native
    from eamg_tpu.audio.sampler import Sf2Renderer, _render_voices
    from eamg_tpu.audio.sf2 import parse_sf2

    from sf2_fixture import build_test_sf2

    renderer = Sf2Renderer(parse_sf2(build_test_sf2()))
    # programs: plain sine, slow-attack saw, vibrato sine; assorted
    # velocities exercise the §8.4.1 gain through the row construction
    cases = [(0, 69, 0.7, 100), (40, 60, 0.9, 45), (42, 69, 1.2, 120)]
    for program, pitch, dur, vel in cases:
        song = song_with([Note(vel, pitch, 0.1, 0.1 + dur)],
                         program=program)
        rows, leftovers = renderer._voices_for(song)
        assert rows and not leftovers
        n_total = int(2.5 * SAMPLE_RATE)
        d_samples = int(2.2 * SAMPLE_RATE)
        row = rows[0]
        cols = [jnp.asarray(np.float32([row[i]])) for i in range(20)]
        dev = np.asarray(_render_voices(
            renderer.bank, cols[0], cols[1], cols[2], cols[3],
            cols[4] > 0.5, cols[5], cols[6], cols[7], cols[8], cols[9],
            cols[10], cols[11], cols[12], cols[13], cols[14], cols[15],
            cols[16], cols[17], cols[18], cols[19],
            n_total, d_samples, use_filter=False))
        host = sf2_voice_native(np.asarray(renderer.bank), row,
                                n_total, d_samples)
        peak = max(float(np.abs(dev).max()), 1e-9)
        assert float(np.abs(dev - host).max()) / peak < 2e-3, (
            program, vel)
