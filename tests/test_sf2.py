"""SoundFont parser + on-device sample renderer (audio/sf2.py,
audio/sampler.py) against an in-memory spec-valid fixture font.

Reference behavior being matched: FluidSynth + GM soundfont rendering at
api_cache.py:234-235 — here the same .sf2 artifact format plays through
XLA with no host binary."""

import numpy as np
import pytest

from eamg_tpu.audio.sampler import Sf2Renderer
from eamg_tpu.audio.sf2 import parse_sf2
from eamg_tpu.midi.smf import Instrument, MidiSong, Note

from sf2_fixture import RATE, build_test_sf2, dominant_freq


@pytest.fixture(scope="module")
def sf():
    return parse_sf2(build_test_sf2())


@pytest.fixture(scope="module")
def renderer(sf):
    return Sf2Renderer(sf)


def _song(program, pitch, dur, is_drum=False, velocity=100):
    song = MidiSong()
    inst = Instrument(program, is_drum=is_drum)
    inst.notes.append(Note(velocity, pitch, 0.1, 0.1 + dur))
    song.instruments.append(inst)
    return song


def test_parse_presets_and_voices(sf):
    assert set(sf.presets) == {(0, 0), (0, 40)}
    (v,) = sf.lookup(0, 0, 69, 100)
    assert v.root_key == 69 and v.loops and v.src_rate == RATE
    assert (v.key_lo, v.key_hi) == (0, 127)
    # the saw instrument's GLOBAL zone supplies a slow attack
    (vs,) = sf.lookup(0, 40, 60, 100)
    assert 0.15 < vs.attack < 0.22
    assert sf.lookup(0, 0, 69, 100)[0].attack < 0.01


def test_melodic_fallback_to_bank0(sf):
    # unknown melodic program falls back to bank 0 presets; program 7
    # has no preset at all -> empty
    assert sf.lookup(0, 7, 60, 100) == []
    # percussion never falls back to melodic bank 0
    assert sf.lookup(128, 0, 40, 100) == []


def test_render_reproduces_root_pitch(renderer):
    wave = renderer.render_song(_song(0, 69, 0.8))
    seg = wave[int(0.15 * RATE):int(0.75 * RATE)]
    assert np.abs(seg).max() > 0.01
    assert abs(dominant_freq(seg) - 440.0) < 6.0


def test_render_transposes_by_resampling(renderer):
    # one octave up: the same sample read twice as fast
    up = renderer.render_song(_song(0, 81, 0.8))
    seg = up[int(0.15 * RATE):int(0.75 * RATE)]
    assert abs(dominant_freq(seg) - 880.0) < 8.0
    # a non-octave interval too (E5 = 659.26 Hz from the A4 sample)
    e5 = renderer.render_song(_song(0, 76, 0.8))
    seg = e5[int(0.15 * RATE):int(0.75 * RATE)]
    assert abs(dominant_freq(seg) - 659.26) < 8.0


def test_loop_sustains_past_sample_end(renderer):
    # the source sine is 0.25 s; a 1.6 s held note must still be sounding
    # at t = 1.4 s because the loop wraps
    wave = renderer.render_song(_song(0, 69, 1.6))
    late = wave[int(1.3 * RATE):int(1.6 * RATE)]
    assert np.abs(late).max() > 0.01
    assert abs(dominant_freq(late) - 440.0) < 8.0


def test_release_silences_after_note_off(renderer):
    wave = renderer.render_song(_song(0, 69, 0.3), tail=1.0)
    # default release is ~1 ms: by 0.2 s after note-off, silence
    post = wave[int(0.7 * RATE):]
    assert np.abs(post).max() < 1e-4


def test_global_zone_attack_applies(renderer):
    wave = renderer.render_song(_song(40, 60, 0.8))
    early = np.abs(wave[int(0.1 * RATE):int(0.14 * RATE)]).max()
    sustained = np.abs(wave[int(0.4 * RATE):int(0.7 * RATE)]).max()
    # ~0.18 s attack: the first 40 ms are much quieter than the sustain
    assert early < 0.5 * sustained


def test_velocity_scales_gain(renderer):
    loud = renderer.render_song(_song(0, 69, 0.5, velocity=120))
    quiet = renderer.render_song(_song(0, 69, 0.5, velocity=40))
    assert np.abs(quiet).max() < 0.5 * np.abs(loud).max()


def test_unmatched_notes_fall_back_to_additive(renderer):
    # the fixture font has no percussion bank: a drum note must still
    # make sound (additive fallback), not silence
    wave = renderer.render_song(_song(0, 40, 0.5, is_drum=True))
    assert np.abs(wave).max() > 0.01


def test_auto_render_uses_sf2_when_no_binary(tmp_path, monkeypatch):
    from eamg_tpu.audio import fluidsynth as fsmod

    sf_path = tmp_path / "test.sf2"
    sf_path.write_bytes(build_test_sf2())
    monkeypatch.setenv("EAMG_SOUNDFONT", str(sf_path))
    monkeypatch.setenv("EAMG_FLUIDSYNTH", "/nonexistent/fluidsynth")
    monkeypatch.delenv("EAMG_NO_SF2", raising=False)
    fsmod._sf2_renderers.clear()

    out = tmp_path / "out.wav"
    fsmod.render_to_wav_auto(_song(0, 69, 0.8), str(out))
    data = out.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pcm = np.frombuffer(data[44:], "<i2").astype(np.float32) / 32768.0
    seg = pcm[int(0.15 * RATE):int(0.75 * RATE)]
    # 440 Hz sine proves the SAMPLED path ran (the additive synth would
    # stack 8 harmonics; its spectrum peaks away from a pure fundamental
    # only weakly, so also check the renderer cache was populated)
    assert abs(dominant_freq(seg) - 440.0) < 6.0
    assert len(fsmod._sf2_renderers) == 1


def test_render_to_wav_method(renderer, tmp_path):
    out = tmp_path / "direct.wav"
    renderer.render_to_wav(_song(0, 69, 0.5), str(out))
    assert out.read_bytes()[:4] == b"RIFF"
