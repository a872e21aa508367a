"""Serving layer: request pipeline + stdlib HTTP server."""

from .pipeline import GenerationResult, Pipeline, demo_pipeline
from .server import make_server, serve_forever_in_thread

__all__ = ["GenerationResult", "Pipeline", "demo_pipeline", "make_server",
           "serve_forever_in_thread"]
