"""TPU-side SoundFont sample playback: MIDI -> waveform with real GM
timbre, no host synth.

The reference's audio identity comes from FluidSynth playing the
FluidR3_GM soundfont (reference api_cache.py:234-235). audio/sf2.py
parses that artifact format; this module plays it as ONE jitted XLA
program per note chunk, mirroring audio/synth.py's dense-tile design:

- every (note x matched voice) renders into a [D]-sample tile: a
  fractional read position ramp (pitch ratio x output clock) gathers
  linearly-interpolated PCM out of the flat sample bank (loop-wrapped
  for sustained samples), shaped by the zone's DAHDSS+R envelope;
- tiles scatter-add onto the output timeline;
- shapes are static ([CHUNK, D] tiles, 5 s timeline buckets), so
  repeated requests reuse one compiled program, and the sample bank is
  uploaded to the device once per renderer.

Notes with no matching preset in the soundfont (e.g. a percussion-less
SF2) fall back to the additive synthesizer so a partial soundfont never
silences a song.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..midi.smf import Instrument, MidiSong
from .sf2 import SoundFont, load_sf2
from .synth import MAX_NOTE_SECONDS, SAMPLE_RATE
from .synth import render_song as _render_additive

_CHUNK = 128                     # voices per compiled render call
_MASTER_GAIN = 0.35


@partial(jax.jit, static_argnames=("n_total", "d_samples", "use_filter"))
def _render_voices(bank, pos0, end, loop_s, loop_e, loops, ratio,
                   t_start, dur, gain, delay, attack, hold, decay,
                   sustain, release, fc_hz, q_cb, vib_cents, vib_hz,
                   vib_delay, n_total, d_samples, use_filter=False):
    """[V] voice params -> [n_total] waveform (one chunk).

    All per-voice params are [V] float32 (loops is bool). ``bank`` is the
    flat sample array with a 1-sample interpolation guard at the end.
    ``use_filter`` (static; host gates it on any voice's fc being below
    open) enables the initialFilterFc/Q low-pass via an rfft magnitude
    multiply, so unfiltered fonts pay nothing.
    """
    V = pos0.shape[0]
    ramp = jnp.arange(d_samples, dtype=jnp.float32)        # [D]
    tt = ramp / SAMPLE_RATE                                # [D] seconds

    # vibrato LFO (vibLfoToPitch): the instantaneous rate is
    # ratio * 2^(c*sin(w(t-d))/1200); for |c| <= ~100 cents the linear
    # approximation 1 + c*ln2/1200*sin is within 0.2%, so the read
    # position is the analytic integral — no per-sample cumsum:
    # pos(t) = ratio*(t + (c*ln2/1200) * (1 - cos(w*(t-d))) / w)
    w = 2.0 * jnp.pi * jnp.maximum(vib_hz, 1e-3)[:, None]  # [V, 1]
    t_act = jnp.maximum(tt[None, :] - vib_delay[:, None], 0.0)
    vib_amp = vib_cents[:, None] * (jnp.log(2.0) / 1200.0)
    vib_pos = vib_amp * (1.0 - jnp.cos(w * t_act)) / w     # seconds
    # fractional source read positions, loop-wrapped for sustained zones
    sp = pos0[:, None] + (ramp[None, :]
                          + vib_pos * SAMPLE_RATE) * ratio[:, None]
    lw = jnp.maximum(loop_e - loop_s, 1.0)[:, None]
    wrapped = loop_s[:, None] + jnp.mod(sp - loop_s[:, None], lw)
    sp = jnp.where(loops[:, None] & (sp >= loop_e[:, None]), wrapped, sp)
    in_data = sp < (end[:, None] - 1.0)                    # room to interp
    sp = jnp.clip(sp, 0.0, bank.shape[0] - 2.0)
    i0 = jnp.floor(sp).astype(jnp.int32)
    frac = sp - i0.astype(jnp.float32)
    pcm = bank[i0] * (1.0 - frac) + bank[i0 + 1] * frac    # [V, D]

    # DAHDSS envelope on the output clock
    t1 = delay[:, None]
    t2 = t1 + attack[:, None]
    t3 = t2 + hold[:, None]
    ttb = tt[None, :]
    env = jnp.clip((ttb - t1) / jnp.maximum(attack[:, None], 1e-4),
                   0.0, 1.0)
    sus = sustain[:, None]
    dec = jnp.clip((ttb - t3) / jnp.maximum(decay[:, None], 1e-4),
                   0.0, 1.0)
    env = jnp.where(ttb > t3, 1.0 - (1.0 - sus) * dec, env)
    env = jnp.where((ttb > t2) & (ttb <= t3), 1.0, env)
    # release: linear fade from the held level after note-off
    durc = jnp.maximum(dur, 1e-3)[:, None]
    rel = jnp.maximum(ttb - durc, 0.0)
    env = env * jnp.clip(1.0 - rel / jnp.maximum(release[:, None], 1e-4),
                         0.0, 1.0)

    tiles = pcm * env * gain[:, None] * in_data            # [V, D]

    if use_filter:
        # initialFilterFc/Q: zero-phase magnitude filtering — each
        # voice's tile is multiplied in the frequency domain by the
        # 2nd-order resonant low-pass magnitude |H(f)| =
        # 1/sqrt((1-x^2)^2 + (x/Q)^2), x = f/fc, Q = 10^(cB/200).
        # Zero-phase differs from FluidSynth's IIR in phase only; the
        # spectral envelope (what test_sf2's similarity metric and ears
        # compare) matches. Voices with fc >= 19 kHz stay exactly open.
        freqs = jnp.fft.rfftfreq(d_samples, 1.0 / SAMPLE_RATE)  # [F]
        x = freqs[None, :] / jnp.maximum(fc_hz, 1.0)[:, None]   # [V, F]
        q_lin = jnp.clip(10.0 ** (q_cb / 200.0), 0.5, 100.0)[:, None]
        mag = jax.lax.rsqrt(jnp.square(1.0 - jnp.square(x))
                            + jnp.square(x / q_lin))
        mag = jnp.minimum(mag, q_lin)          # cap at the resonance peak
        mag = jnp.where(fc_hz[:, None] >= 19000.0, 1.0, mag)
        tiles = jnp.fft.irfft(jnp.fft.rfft(tiles, axis=1) * mag,
                              n=d_samples, axis=1).astype(jnp.float32)

    start_idx = jnp.round(t_start * SAMPLE_RATE).astype(jnp.int32)
    idx = start_idx[:, None] + jnp.arange(d_samples)[None, :]
    idx = jnp.clip(idx, 0, n_total - 1)
    out = jnp.zeros((n_total,), jnp.float32)
    return out.at[idx.reshape(-1)].add(tiles.reshape(-1))


class Sf2Renderer:
    """Plays a parsed SoundFont on the accelerator.

    The sample bank is uploaded once at construction (like the emotion
    classifier's pinned params); each render call is host-side voice
    resolution + a few fixed-shape device calls.
    """

    def __init__(self, sf: SoundFont | str):
        self.sf = load_sf2(sf) if isinstance(sf, str) else sf
        # +1 guard sample so i0+1 gathers stay in bounds
        self.bank = jnp.asarray(np.concatenate(
            [self.sf.samples.astype(np.float32), np.zeros(2, np.float32)]))

    def _voices_for(self, song: MidiSong):
        """(matched [per-voice param rows], [unmatched notes' Instrument
        clones]) — host-side preset/zone resolution."""
        from .sf2 import (_abs_cents_to_hz, _cb_to_gain, vel_to_atten_cb,
                          vel_to_fc_cents)

        rows = []
        leftovers: list[Instrument] = []
        for inst in song.instruments:
            bank_n = 128 if inst.is_drum else 0
            missing = None
            # §8.4.3 pitch-wheel -> pitch at the GM default ±2-semitone
            # range, applied statically per note (the bend value in
            # effect at note onset; the render path has no mid-note CC
            # stream). No bends (the detokenizer never emits them) = 0.
            bends = sorted((b.time, b.pitch)
                           for b in getattr(inst, "pitch_bends", []))
            b_times = [t for t, _ in bends]
            for n in inst.notes:
                bend_semis = 0.0
                if bends:
                    import bisect

                    k = bisect.bisect_right(b_times, n.start) - 1
                    if k >= 0:
                        bend_semis = bends[k][1] / 8192.0 * 2.0
                vs = self.sf.lookup(bank_n, int(inst.program),
                                    int(n.pitch), int(n.velocity))
                if not vs:
                    if missing is None:
                        missing = Instrument(inst.program, inst.is_drum,
                                             inst.name)
                        leftovers.append(missing)
                    missing.notes.append(n)
                    continue
                for v in vs:
                    # drum zones ignore note-off (one-shot); melodic dur
                    # is the held time, capped to the tile
                    dur = MAX_NOTE_SECONDS if inst.is_drum else min(
                        n.duration, MAX_NOTE_SECONDS)
                    semis = (int(n.pitch) - v.root_key) \
                        * (v.scale_tuning / 100.0) + bend_semis
                    ratio = (2.0 ** (semis / 12.0 + v.tune_cents / 1200.0)
                             * v.src_rate / SAMPLE_RATE)
                    # §8.4.1: velocity through the concave curve to
                    # attenuation (the font's amount; 960 cB default is
                    # exactly the old (vel/127)**2 gain)
                    vel_gain = _cb_to_gain(
                        vel_to_atten_cb(n.velocity, v.vel2att_cb))
                    # §8.4.2: velocity closes the low-pass — quiet notes
                    # lose brightness (the FluidR3 velocity dynamic)
                    fc_hz = min(_abs_cents_to_hz(
                        v.fc_cents
                        + vel_to_fc_cents(n.velocity, v.vel2fc_cents)),
                        20000.0)
                    rows.append((
                        float(v.start), float(v.end), float(v.loop_start),
                        float(v.loop_end), float(v.loops), float(ratio),
                        float(n.start), float(dur),
                        float(v.gain * vel_gain * _MASTER_GAIN),
                        float(v.delay), float(min(v.attack, 4.0)),
                        float(min(v.hold, 4.0)), float(min(v.decay, 8.0)),
                        float(v.sustain), float(min(v.release, 4.0)),
                        float(fc_hz), float(v.filter_q_cb),
                        float(v.vib_cents), float(v.vib_hz),
                        float(v.vib_delay)))
        return rows, leftovers

    def render_song(self, song: MidiSong, tail: float = 0.5,
                    seed: int = 0) -> np.ndarray:
        rows, leftovers = self._voices_for(song)
        end_time = song.get_end_time() + tail
        n_exact = max(int(np.ceil(end_time * SAMPLE_RATE)),
                      SAMPLE_RATE // 4)
        bucket = 5 * SAMPLE_RATE
        n_total = ((n_exact + bucket - 1) // bucket) * bucket
        d_samples = min(int((MAX_NOTE_SECONDS + 0.5) * SAMPLE_RATE),
                        n_total)
        out = np.zeros(n_total, np.float32)
        for c in range(0, len(rows), _CHUNK):
            chunk = rows[c:c + _CHUNK]
            arr = np.zeros((_CHUNK, 20), np.float32)
            arr[:, 15] = 20000.0          # padding voices: open filter
            arr[:, 18] = 8.176
            arr[:len(chunk)] = np.asarray(chunk, np.float32)
            cols = [jnp.asarray(arr[:, i]) for i in range(20)]
            loops = cols[4] > 0.5
            # static gate: fonts with every filter open (e.g. FluidR3's
            # many unfiltered zones, the additive fixture) skip the fft
            use_filter = bool((arr[:, 15] < 19000.0).any())
            out += np.asarray(_render_voices(
                self.bank, cols[0], cols[1], cols[2], cols[3], loops,
                cols[5], cols[6], cols[7], cols[8], cols[9], cols[10],
                cols[11], cols[12], cols[13], cols[14], cols[15],
                cols[16], cols[17], cols[18], cols[19],
                n_total, d_samples, use_filter=use_filter))
        if leftovers:
            fallback = MidiSong()
            fallback.instruments = leftovers
            add = _render_additive(fallback, seed=seed)
            out[:len(add)] += add[:n_total]
        out = out[:n_exact]
        peak = float(np.abs(out).max())
        if peak > 1.0:
            out = out / peak * 0.97
        return out

    def render_to_wav(self, song: MidiSong, path_or_file,
                      seed: int = 0) -> None:
        from .synth import write_wav

        write_wav(path_or_file, self.render_song(song, seed=seed))
