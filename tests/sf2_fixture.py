"""Builds a tiny, spec-valid SoundFont 2 file in memory for tests.

Two sampled presets at 22050 Hz:
- (bank 0, program 0): a pure 440 Hz sine, root key 69 (A4), looped —
  playing key 69 must reproduce 440 Hz, key 81 must give 880 Hz;
- (bank 0, program 40): a 261.63 Hz sawtooth, root key 60 (C4), looped,
  with a slow attack set through a GLOBAL instrument zone (exercises
  global-zone merging) and a preset-level fine-tune offset of 0 cents.

No percussion bank, so drum notes exercise the renderer's additive
fallback path.
"""

from __future__ import annotations

import struct

import numpy as np

RATE = 22050


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\0" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _sine(freq: float, seconds: float) -> np.ndarray:
    t = np.arange(int(seconds * RATE)) / RATE
    return np.sin(2 * np.pi * freq * t)


def _saw(freq: float, seconds: float) -> np.ndarray:
    t = np.arange(int(seconds * RATE)) / RATE
    return 2.0 * ((t * freq) % 1.0) - 1.0


def build_test_sf2() -> bytes:
    # --- sample data: [sine | saw], each with loop points on whole
    # periods so looped playback stays phase-continuous
    sine = _sine(440.0, 0.25)
    saw = _saw(261.63, 0.25)
    pcm = np.concatenate([sine, saw])
    smpl = (np.clip(pcm, -1, 1) * 32000).astype("<i2").tobytes()

    per_sine = RATE / 440.0
    sine_loop = (int(10 * per_sine), int(100 * per_sine))
    per_saw = RATE / 261.63
    saw_loop = (len(sine) + int(5 * per_saw), len(sine) + int(60 * per_saw))

    def shdr_rec(name, start, end, ls, le, root):
        return struct.pack("<20sIIIIIBbHH", name, start, end, ls, le,
                           RATE, root, 0, 0, 1)  # type 1 = mono

    shdr = (shdr_rec(b"sine", 0, len(sine), *sine_loop, 69)
            + shdr_rec(b"saw", len(sine), len(sine) + len(saw),
                       *saw_loop, 60)
            + shdr_rec(b"EOS", 0, 0, 0, 0, 0))

    # --- instruments: zones are (keyRange?, sampleModes, sampleID)
    G_ATTACK, G_KEYRANGE, G_MODES, G_SID, G_INST = 34, 43, 54, 53, 41
    G_VIB2PITCH, G_FILTER_FC, G_VIBFREQ = 6, 8, 24

    def gen(oper, amount):
        return struct.pack("<Hh", oper, amount) if amount < 0 \
            else struct.pack("<HH", oper, amount)

    # inst 0 (sine): one zone, full key range, looped
    igen0 = gen(G_KEYRANGE, 0 | (127 << 8)) + gen(G_MODES, 1) + gen(G_SID, 0)
    # inst 1 (saw): GLOBAL zone carrying a ~0.18 s attack (timecents
    # 1200*log2(0.18) ~= -2969), then the sample zone
    igen1_glob = gen(G_ATTACK, -2969)
    igen1 = gen(G_KEYRANGE, 0 | (127 << 8)) + gen(G_MODES, 1) + gen(G_SID, 1)
    # inst 2 (filtered saw): initialFilterFc ~1 kHz
    # (1200*log2(1000/8.176) ~= 8321 absolute cents)
    igen2 = (gen(G_KEYRANGE, 0 | (127 << 8)) + gen(G_MODES, 1)
             + gen(G_FILTER_FC, 8321) + gen(G_SID, 1))
    # inst 3 (vibrato sine): 50-cent vibrato at ~5 Hz
    # (freqVibLFO = 1200*log2(5/8.176) ~= -851 absolute cents)
    igen3 = (gen(G_KEYRANGE, 0 | (127 << 8)) + gen(G_MODES, 1)
             + gen(G_VIB2PITCH, 50) + gen(G_VIBFREQ, -851)
             + gen(G_SID, 0))

    # inst 4 (flat-velocity sine): an imod record with the §8.4.1
    # identity and amount 0 SUPERSEDES the default velocity->attenuation
    # modulator (spec 9.5) — velocity must stop affecting loudness
    igen4 = gen(G_KEYRANGE, 0 | (127 << 8)) + gen(G_MODES, 1) + gen(G_SID, 0)

    igen = igen0 + igen1_glob + igen1 + igen2 + igen3 + igen4
    # ibag: zone -> (first gen index, first mod index); inst4's zone
    # owns imod record 0
    ibag = b"".join(struct.pack("<HH", g, m)
                    for g, m in ((0, 0), (3, 0), (4, 0), (7, 0),
                                 (11, 0), (16, 0), (19, 1)))
    # zones: inst0-z0, GLOB, inst1-z0, inst2-z0, inst3-z0, inst4-z0, EOZ
    inst = (struct.pack("<20sH", b"sine-inst", 0)
            + struct.pack("<20sH", b"saw-inst", 1)   # bags 1..2 (GLOB+zone)
            + struct.pack("<20sH", b"filt-inst", 3)
            + struct.pack("<20sH", b"vib-inst", 4)
            + struct.pack("<20sH", b"flat-inst", 5)
            + struct.pack("<20sH", b"EOI", 6))
    # imod: vel(concave, negative: 0x0502) -> initialAttenuation(48),
    # amount 0 = disable; then the terminal record
    imod = struct.pack("<HHhHH", 0x0502, 48, 0, 0, 0) + b"\0" * 10

    # --- presets (program 44 adds a preset-level §8.4.2 offset: pmod
    # amounts ADD to the instrument-level result, spec 9.5)
    pgen = (gen(G_INST, 0) + gen(G_INST, 1) + gen(G_INST, 2)
            + gen(G_INST, 3) + gen(G_INST, 4) + gen(G_INST, 0))
    pbag = b"".join(struct.pack("<HH", g, m)
                    for g, m in ((0, 0), (1, 0), (2, 0), (3, 0),
                                 (4, 0), (5, 0), (6, 1)))
    phdr = (struct.pack("<20sHHHIII", b"sine-preset", 0, 0, 0, 0, 0, 0)
            + struct.pack("<20sHHHIII", b"saw-preset", 40, 0, 1, 0, 0, 0)
            + struct.pack("<20sHHHIII", b"filt-preset", 41, 0, 2, 0, 0, 0)
            + struct.pack("<20sHHHIII", b"vib-preset", 42, 0, 3, 0, 0, 0)
            + struct.pack("<20sHHHIII", b"flat-preset", 43, 0, 4, 0, 0, 0)
            + struct.pack("<20sHHHIII", b"padd-preset", 44, 0, 5, 0, 0, 0)
            + struct.pack("<20sHHHIII", b"EOP", 0, 0, 6, 0, 0, 0))

    # pmod: vel(linear, negative: 0x0102) -> initialFilterFc(8),
    # -1200 cents ADDS to the -2400 default; then the terminal record
    pmod = struct.pack("<HHhHH", 0x0102, 8, -1200, 0, 0) + b"\0" * 10

    info = (_chunk(b"ifil", struct.pack("<HH", 2, 4))
            + _chunk(b"INAM", b"eamg test font\0")
            + _chunk(b"isng", b"EMU8000\0"))
    pdta = (_chunk(b"phdr", phdr) + _chunk(b"pbag", pbag)
            + _chunk(b"pmod", pmod) + _chunk(b"pgen", pgen)
            + _chunk(b"inst", inst) + _chunk(b"ibag", ibag)
            + _chunk(b"imod", imod) + _chunk(b"igen", igen)
            + _chunk(b"shdr", shdr))
    body = (b"sfbk" + _list(b"INFO", info)
            + _list(b"sdta", _chunk(b"smpl", smpl))
            + _list(b"pdta", pdta))
    return _chunk(b"RIFF", body)


def dominant_freq(wave: np.ndarray, rate: int = RATE) -> float:
    """Frequency of the largest FFT bin (DC excluded)."""
    spec = np.abs(np.fft.rfft(wave * np.hanning(len(wave))))
    spec[0] = 0.0
    return float(np.argmax(spec) * rate / len(wave))


def fixture_song():
    """The deterministic 4-program certification song used by the
    FluidSynth spectral-similarity tests and the golden-WAV cutter
    (tests/cut_golden_wav.py): one note per preset tier (plain sine,
    slow-attack saw, filtered saw, vibrato sine)."""
    from eamg_tpu.midi.smf import Instrument, MidiSong, Note

    song = MidiSong(initial_tempo=120.0)
    for prog, pitch in ((0, 69), (40, 60), (41, 64), (42, 72)):
        inst = Instrument(prog)
        inst.notes.append(Note(100, pitch, 0.1, 1.2))
        song.instruments.append(inst)
    return song
