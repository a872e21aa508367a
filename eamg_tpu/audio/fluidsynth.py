"""Optional host-FluidSynth rendering adapter.

The reference renders WAV by spawning the ``fluidsynth`` CLI with the
FluidR3_GM soundfont (reference api_cache.py:234-235, via midi2audio's
``fluidsynth -ni <sf2> <mid> -F <wav> -r <rate>`` invocation). On hosts
that have the binary and a GM soundfont, this adapter reproduces that
exact path for soundfont-quality timbre; otherwise rendering falls back
to the on-device additive synthesizer (audio/synth.py).

Discovery order for the soundfont: ``EAMG_SOUNDFONT`` env var, then the
reference's own location (``generate_music/FluidR3_GM.sf2`` relative to
cwd), then common system sf2 directories.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

from ..midi.smf import MidiSong
from .synth import SAMPLE_RATE, render_to_wav as _render_additive

_SF2_CANDIDATE_DIRS = (
    "generate_music",
    "/usr/share/sounds/sf2",
    "/usr/share/soundfonts",
    "/usr/local/share/soundfonts",
)


def find_fluidsynth() -> tuple[str, str] | None:
    """(binary, soundfont) when both are present on this host, else None."""
    binary = os.environ.get("EAMG_FLUIDSYNTH") or shutil.which("fluidsynth")
    if not binary or not os.path.exists(binary):
        return None
    sf2 = os.environ.get("EAMG_SOUNDFONT", "")
    if sf2 and os.path.isfile(sf2):
        return binary, sf2
    for d in _SF2_CANDIDATE_DIRS:
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.lower().endswith(".sf2"):
                return binary, os.path.join(d, name)
    return None


def render_to_wav_fluidsynth(song: MidiSong, path_or_file,
                             binary: str, soundfont: str,
                             sample_rate: int = SAMPLE_RATE) -> None:
    """Render through the fluidsynth CLI exactly like the reference's
    midi2audio call (api_cache.py:234-235): temp .mid in, .wav out."""
    with tempfile.TemporaryDirectory() as td:
        mid = os.path.join(td, "in.mid")
        wav = os.path.join(td, "out.wav")
        with open(mid, "wb") as f:
            song.write(f)
        subprocess.run(
            [binary, "-ni", soundfont, mid, "-F", wav,
             "-r", str(sample_rate)],
            check=True, capture_output=True, timeout=120)
        with open(wav, "rb") as f:
            data = f.read()
    if isinstance(path_or_file, (str, os.PathLike)):
        with open(path_or_file, "wb") as f:
            f.write(data)
    else:
        path_or_file.write(data)


def render_to_wav_auto(song: MidiSong, path_or_file, seed: int = 0) -> None:
    """FluidSynth when host has binary+soundfont, additive synth otherwise.

    Set ``EAMG_NO_FLUIDSYNTH=1`` to force the on-device synth even when the
    binary exists (e.g. for deterministic benchmarking).
    """
    if not os.environ.get("EAMG_NO_FLUIDSYNTH"):
        found = find_fluidsynth()
        if found is not None:
            try:
                render_to_wav_fluidsynth(song, path_or_file, *found)
                return
            except (subprocess.SubprocessError, OSError):
                pass  # broken host install: fall back to the synth
    _render_additive(song, path_or_file, seed=seed)
