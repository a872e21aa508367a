"""Orbax checkpoint backend (optional, ecosystem-standard).

The default checkpoint format (utils/checkpoint.py) is a self-contained
pickle+json directory. For production TPU fleets Orbax adds atomic writes,
async save and sharded-array support; this module mirrors the same payload
(params, opt_state, vocab, cfg, step) through
``orbax.checkpoint.PyTreeCheckpointer``. Both formats round-trip through
``load_any_checkpoint``.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from ..models.gpt import GPTConfig


def save_checkpoint_orbax(path: str, params: dict, vocab_tok2id: dict,
                          cfg: GPTConfig, opt_state=None, step: int = 0,
                          extra: dict | None = None) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"),
                   jax.tree.map(np.asarray, params), force=True)
        if opt_state is not None:
            # optax states are nested namedtuples, which orbax restores as
            # plain dicts; persist the ordered leaf list instead so any
            # structure can be rebuilt against a template (coerce_opt_state)
            leaves = [np.asarray(x) for x in jax.tree.leaves(opt_state)]
            ckptr.save(os.path.join(path, "opt_state"),
                       {"leaves": leaves}, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"cfg": dataclasses.asdict(cfg), "step": step,
                   "extra": extra or {}, "format": "orbax"}, f)
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab_tok2id, f, ensure_ascii=False)


def load_checkpoint_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "vocab.json")) as f:
        vocab = json.load(f)
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"))
        opt_state = None
        if os.path.isdir(os.path.join(path, "opt_state")):
            opt_state = ckptr.restore(os.path.join(path, "opt_state"))
    return {"params": params, "vocab": vocab,
            "cfg": GPTConfig(**meta["cfg"]), "opt_state": opt_state,
            "step": meta["step"], "extra": meta["extra"]}


def coerce_opt_state(restored, template):
    """Rebuild an optax state structure (nested namedtuples) from a
    restored opt_state payload. Accepts the ordered-leaves format written
    by :func:`save_checkpoint_orbax` or any pytree with the same leaf
    order; ``template`` is a freshly-initialized state of the right
    structure (``optimizer.init(params)``)."""
    if isinstance(restored, dict) and set(restored) == {"leaves"}:
        leaves = [restored["leaves"][k]
                  for k in sorted(restored["leaves"],
                                  key=lambda s: int(s))] \
            if isinstance(restored["leaves"], dict) else restored["leaves"]
    else:
        leaves = jax.tree.leaves(restored)
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, leaves)


def load_any_checkpoint(path: str) -> dict:
    """Dispatch on the on-disk format (orbax vs pickle directory)."""
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("format") == "orbax":
                return load_checkpoint_orbax(path)
    from .checkpoint import load_checkpoint

    return load_checkpoint(path)
