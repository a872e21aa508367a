"""Audio rendering: on-device additive synth (default) with an optional
host-FluidSynth adapter matching the reference's render path."""

from .fluidsynth import (find_fluidsynth, render_to_wav_auto,
                         render_to_wav_fluidsynth)
from .synth import (SAMPLE_RATE, render_song, render_to_wav, write_wav)

__all__ = ["SAMPLE_RATE", "render_song", "render_to_wav", "write_wav",
           "find_fluidsynth", "render_to_wav_auto",
           "render_to_wav_fluidsynth"]
