"""Audio rendering, in fidelity order: host FluidSynth (the reference's
exact path, when the binary+soundfont exist), the on-device SoundFont
sample renderer (any .sf2, no binary needed), and the on-device additive
synth (no artifacts needed at all)."""

from .fluidsynth import (find_fluidsynth, find_soundfont,
                         render_to_wav_auto, render_to_wav_fluidsynth)
from .sampler import Sf2Renderer
from .sf2 import SoundFont, load_sf2, parse_sf2
from .synth import (SAMPLE_RATE, render_song, render_to_wav, write_wav)

__all__ = ["SAMPLE_RATE", "render_song", "render_to_wav", "write_wav",
           "find_fluidsynth", "find_soundfont", "render_to_wav_auto",
           "render_to_wav_fluidsynth", "Sf2Renderer", "SoundFont",
           "load_sf2", "parse_sf2"]
