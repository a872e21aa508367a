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


def find_soundfont() -> str | None:
    """Path to a .sf2 on this host: ``EAMG_SOUNDFONT``, the reference's
    own location, then common system soundfont dirs."""
    sf2 = os.environ.get("EAMG_SOUNDFONT", "")
    if sf2 and os.path.isfile(sf2):
        return sf2
    for d in _SF2_CANDIDATE_DIRS:
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.lower().endswith(".sf2"):
                return os.path.join(d, name)
    return None


def find_fluidsynth() -> tuple[str, str] | None:
    """(binary, soundfont) when both are present on this host, else None."""
    binary = os.environ.get("EAMG_FLUIDSYNTH") or shutil.which("fluidsynth")
    if not binary or not os.path.exists(binary):
        return None
    sf2 = find_soundfont()
    return (binary, sf2) if sf2 else None


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


_sf2_renderers: dict[str, object] = {}  # path -> Sf2Renderer (bank pinned)


def render_to_wav_auto(song: MidiSong, path_or_file, seed: int = 0) -> None:
    """Best available timbre for this host, in fidelity order:

    1. the fluidsynth CLI + a soundfont (the reference's exact render
       path, api_cache.py:234-235);
    2. a soundfont WITHOUT the binary: the on-device sample renderer
       (audio/sampler.py) plays the same .sf2 through XLA;
    3. neither: the on-device additive synthesizer.

    ``EAMG_NO_FLUIDSYNTH=1`` skips 1, ``EAMG_NO_SF2=1`` skips 2 (e.g.
    for deterministic benchmarking of the additive path).
    """
    if not os.environ.get("EAMG_NO_FLUIDSYNTH"):
        found = find_fluidsynth()
        if found is not None:
            try:
                render_to_wav_fluidsynth(song, path_or_file, *found)
                return
            except (subprocess.SubprocessError, OSError):
                pass  # broken host install: fall back
    if not os.environ.get("EAMG_NO_SF2"):
        sf2 = find_soundfont()
        if sf2 is not None:
            try:
                if sf2 not in _sf2_renderers:
                    from .sampler import Sf2Renderer

                    _sf2_renderers[sf2] = Sf2Renderer(sf2)
                _sf2_renderers[sf2].render_to_wav(song, path_or_file,
                                                  seed=seed)
                return
            except (ValueError, OSError):
                pass  # unparseable soundfont: fall back
    _render_additive(song, path_or_file, seed=seed)
