"""Device-side audio synthesis (FluidSynth replacement)."""

from .synth import (SAMPLE_RATE, render_song, render_to_wav, write_wav)

__all__ = ["SAMPLE_RATE", "render_song", "render_to_wav", "write_wav"]
