"""Checkpointing: self-contained directory format + reference .pt export.

Superset of the reference payload ``{"model": state_dict, "vocab": tok2id
[, "cfg"|"hparams"]}`` (train/train_mini.py:82, train_large2.py:100-110):
we persist params, optimizer state, vocab, model/train configs, step and
RNG key, so resume continues optimization exactly (the reference dropped
optimizer state — resume restarted optimization, SURVEY.md §5.4).

Cadence helpers cover the reference's three flavors: every-N-steps
``latest`` overwrite (train_large.py:156-161), wall-clock every SAVE_HOURS
(train_large2.py:113-128), and per-epoch/final tags.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time

import jax
import numpy as np

from ..models.gpt import GPTConfig


def save_checkpoint(path: str, params: dict, vocab_tok2id: dict,
                    cfg: GPTConfig, opt_state=None, step: int = 0,
                    rng_key=None, extra: dict | None = None) -> None:
    """Write a self-contained checkpoint directory."""
    os.makedirs(path, exist_ok=True)
    params = jax.tree.map(np.asarray, params)
    with open(os.path.join(path, "params.pkl"), "wb") as f:
        pickle.dump(params, f)
    if opt_state is not None:
        opt_np = jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, opt_state)
        with open(os.path.join(path, "opt_state.pkl"), "wb") as f:
            pickle.dump(opt_np, f)
    meta = {
        "cfg": dataclasses.asdict(cfg),
        "step": step,
        "rng_key": (np.asarray(rng_key).tolist()
                    if rng_key is not None else None),
        "extra": extra or {},
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab_tok2id, f, ensure_ascii=False)


def load_checkpoint(path: str) -> dict:
    """-> {"params", "vocab", "cfg", "opt_state", "step", "rng_key",
    "extra"}."""
    with open(os.path.join(path, "params.pkl"), "rb") as f:
        params = pickle.load(f)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "vocab.json")) as f:
        vocab = json.load(f)
    opt_state = None
    opt_path = os.path.join(path, "opt_state.pkl")
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = pickle.load(f)
    rng = meta["rng_key"]
    return {
        "params": params,
        "vocab": vocab,
        "cfg": GPTConfig(**meta["cfg"]),
        "opt_state": opt_state,
        "step": meta["step"],
        "rng_key": np.asarray(rng, np.uint32) if rng is not None else None,
        "extra": meta["extra"],
    }


def export_reference_pt(path: str, params: dict, vocab_tok2id: dict,
                        cfg: GPTConfig, dialect: str = "trainer") -> None:
    """Write a torch ``.pt`` in the reference's trainer payload so reference
    tooling (api.py:30-55, generate_music/generate.py) can load our models.

    Thin alias for :func:`models.import_torch.export_reference_checkpoint`
    (the canonical exporter: f32 cast, full cfg payload, torch.save in a
    subprocess so torch never shares this process with XLA:CPU)."""
    from ..models.import_torch import export_reference_checkpoint

    export_reference_checkpoint(path, params, vocab_tok2id, cfg,
                                dialect=dialect)


class CheckpointCadence:
    """step-interval + wall-clock cadence tracker (reference flavors)."""

    def __init__(self, every_steps: int | None = None,
                 every_hours: float | None = None):
        self.every_steps = every_steps
        self.every_secs = every_hours * 3600 if every_hours else None
        self._last_wall = time.time()

    def should_save(self, step: int) -> bool:
        hit = False
        if self.every_steps and step > 0 and step % self.every_steps == 0:
            hit = True
        if self.every_secs and time.time() - self._last_wall >= \
                self.every_secs:
            hit = True
        if hit:
            self._last_wall = time.time()
        return hit
