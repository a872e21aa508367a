"""Utilities: checkpointing, logging, timing."""

from .checkpoint import (CheckpointCadence, export_reference_pt,
                         load_checkpoint, save_checkpoint)

__all__ = ["CheckpointCadence", "export_reference_pt", "load_checkpoint",
           "save_checkpoint"]
