"""Serving layer: request pipeline + stdlib HTTP server."""

from .pipeline import (GenerationResult, Pipeline, demo_pipeline,
                       demo_pipeline_b3)
from .server import make_server, serve_forever_in_thread

__all__ = ["GenerationResult", "Pipeline", "demo_pipeline",
           "demo_pipeline_b3", "make_server", "serve_forever_in_thread"]
