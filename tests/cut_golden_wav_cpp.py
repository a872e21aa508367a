"""Cut the committed golden WAV from the C++ voice twin (VERDICT r4 #7).

The fluidsynth binary has been absent on every host this repo has
touched, so the original golden (tests/cut_golden_wav.py) was never
cut and the spectral certification auto-skipped everywhere. The C++
voice twin (native/eamg_synth.cpp::eamg_sf2_voice) is itself
parity-tested sample-for-sample against the device kernel
(tests/test_native_synth.py::test_sf2_voice_waveform_matches_device),
so a golden cut from it pins the Python/JAX sampler against an
independent kernel implementation — committed, reproducible, and
runnable on THIS host:

    python tests/cut_golden_wav_cpp.py
    git add tests/golden/cpp_twin_fixture.wav

test_sf2.py::test_spectral_similarity_vs_committed_golden prefers the
fluidsynth golden when present and falls back to this one.
"""

import os
import sys
import wave as wavemod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "cpp_twin_fixture.wav")


def render_fixture_cpp() -> np.ndarray:
    """Fixture song rendered voice-by-voice through the C++ twin,
    mixed with the same geometry as Sf2Renderer.render_song (bucketed
    n_total, shared d_samples, final peak normalization). The twin
    skips the initialFilterFc stage (device-only rfft path), so the
    filtered voice's tile gets the SAME documented zero-phase
    magnitude low-pass applied here in numpy (sampler.py's |H(f)|)."""
    from eamg_tpu.audio.native_synth import sf2_voice_native
    from eamg_tpu.audio.sampler import Sf2Renderer
    from eamg_tpu.audio.sf2 import parse_sf2
    from eamg_tpu.audio.synth import MAX_NOTE_SECONDS, SAMPLE_RATE

    from sf2_fixture import build_test_sf2, fixture_song

    renderer = Sf2Renderer(parse_sf2(build_test_sf2()))
    song = fixture_song()
    rows, leftovers = renderer._voices_for(song)
    assert rows and not leftovers, (len(rows), leftovers)

    end_time = song.get_end_time() + 0.5
    n_exact = max(int(np.ceil(end_time * SAMPLE_RATE)), SAMPLE_RATE // 4)
    bucket = 5 * SAMPLE_RATE
    n_total = ((n_exact + bucket - 1) // bucket) * bucket
    d_samples = min(int((MAX_NOTE_SECONDS + 0.5) * SAMPLE_RATE), n_total)

    bank = np.asarray(renderer.bank)
    out = np.zeros(n_total, np.float32)
    for row in rows:
        voice = sf2_voice_native(bank, row, n_total, d_samples)
        fc_hz, q_cb = float(row[15]), float(row[16])
        if fc_hz < 19000.0:
            # sampler.py's zero-phase 2nd-order resonant low-pass
            # magnitude, applied to the voice's tile window
            start = int(round(float(row[6]) * SAMPLE_RATE))
            start = min(max(start, 0), n_total - 1)
            width = min(d_samples, n_total - start)
            tile = voice[start:start + width]
            freqs = np.fft.rfftfreq(width, 1.0 / SAMPLE_RATE)
            x = freqs / max(fc_hz, 1.0)
            q_lin = float(np.clip(10.0 ** (q_cb / 200.0), 0.5, 100.0))
            mag = 1.0 / np.sqrt(np.square(1.0 - np.square(x))
                                + np.square(x / q_lin))
            mag = np.minimum(mag, q_lin)
            tile = np.fft.irfft(np.fft.rfft(tile) * mag,
                                n=width).astype(np.float32)
            voice = voice.copy()
            voice[start:start + width] = tile
        out += voice
    out = out[:n_exact]
    peak = float(np.abs(out).max())
    if peak > 1.0:
        out = out / peak * 0.97
    return out


def main() -> None:
    from eamg_tpu.audio.synth import SAMPLE_RATE

    wave = render_fixture_cpp()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    pcm = np.clip(wave * 32767.0, -32768, 32767).astype("<i2")
    with wavemod.open(GOLDEN, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SAMPLE_RATE)
        w.writeframes(pcm.tobytes())
    print(f"golden written -> {GOLDEN} ({len(pcm)} frames)")


if __name__ == "__main__":
    main()
