"""End-to-end training runs mirroring the four reference trainers.

preset -> (scheme, geometry, hyperparams):
- ``mini``    = train/train_mini.py    (Scheme A, d256 h4 L2, batch 8)
- ``large``   = train/train_large.py   (Scheme B1, d256 h8 L4, accum 8)
- ``large2``  = train/train_large2.py  (Scheme B2 fixed 8324 vocab, d512 L6)
- ``no_inst`` = train/train_no_inst.py (Scheme B3 + BPM/KEY controls)
- ``paper``   = Table-5 recipe on the large2 geometry

Checkpoint cadence covers all three reference flavors (SURVEY.md §5.4):
every-N-steps ``latest`` overwrite, wall-clock hours, per-epoch + final.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax

from ..models import init_params, preset as model_preset
from ..tokenizer import SchemeB1, SchemeB2, SchemeB3, Vocab
from ..utils.checkpoint import CheckpointCadence, save_checkpoint
from .data import batches, iter_csv_tokens, packed_batches, synthetic_corpus
from .trainer import TrainConfig, Trainer, reference_preset

PRESET_SCHEME = {"mini": "a", "large": "b1", "large2": "b2",
                 "no_inst": "b3", "paper": "b2"}


def encode_corpus_csv(csv_path: str, scheme: str, seq_len: int,
                      max_rows: int | None = None):
    """CSV -> (encoded id rows, Vocab) without ever holding the raw JSON
    strings: at Lakh scale the ``tokens`` column is ~100 GB of text but
    only ~0.3 GB of int32 ids. Fixed-vocab schemes (b2/b3) go through the
    native C++ parser when built (native/eamg_native.cpp) and keep the
    ids as one [rows, seq_len] matrix with zero-copy row views;
    data-dependent vocabs (a/b1) stream the CSV twice — pass 1 builds the
    vocab, pass 2 encodes — exactly the reference's rank-0 recipe
    (train/train_large.py:61-77), with each row encoded to a compact
    int32 array as it streams."""
    import numpy as _np

    if scheme in ("b2", "b3"):
        from ..tools.native_loader import explode_csv

        ids, lens = explode_csv(csv_path, scheme=scheme, seq_len=seq_len,
                                max_rows=max_rows)
        vocab = (SchemeB3 if scheme == "b3"
                 else SchemeB2)(seq_len=seq_len).vocab
        return [ids[i, :lens[i]] for i in range(ids.shape[0])], vocab
    if scheme == "a":
        vocab = Vocab.from_sequences(
            (json.loads(js)
             for js in iter_csv_tokens(csv_path, max_rows=max_rows)),
            pad_last=True)
        encoded = [_np.asarray(vocab.encode(json.loads(js)[:seq_len]),
                               _np.int32)
                   for js in iter_csv_tokens(csv_path, max_rows=max_rows)]
        return encoded, vocab
    if scheme == "b1":
        b1 = SchemeB1(seq_len=seq_len)
        vocab = Vocab.from_sequences(
            (b1.explode(js)
             for js in iter_csv_tokens(csv_path, max_rows=max_rows)),
            pad_last=False)
        encoded = [_np.asarray(vocab.encode(b1.explode(js)), _np.int32)
                   for js in iter_csv_tokens(csv_path, max_rows=max_rows)]
        return encoded, vocab
    raise ValueError(f"unknown scheme {scheme!r}")


def encode_corpus(rows: list[str], scheme: str, seq_len: int):
    """JSON token rows -> (encoded id lists, Vocab)."""
    if scheme == "a":
        seqs = [json.loads(js) for js in rows]
        vocab = Vocab.from_sequences(seqs, pad_last=True)  # mini dialect
        encoded = [vocab.encode(s[:seq_len]) for s in seqs]
    elif scheme == "b1":
        b1 = SchemeB1(seq_len=seq_len)
        exploded = [b1.explode(js) for js in rows]
        vocab = Vocab.from_sequences(exploded, pad_last=False)
        encoded = [vocab.encode(s) for s in exploded]
    elif scheme == "b2":
        b2 = SchemeB2(seq_len=seq_len)
        vocab = b2.vocab
        encoded = [b2.explode(js) for js in rows]
    elif scheme == "b3":
        b3 = SchemeB3(seq_len=seq_len)
        vocab = b3.vocab
        encoded = [b3.explode(js) for js in rows]
    else:
        raise ValueError(f"unknown scheme {scheme!r}")
    return encoded, vocab


def run_training(preset: str, csv_path: str | None = None,
                 synthetic_rows: int | None = None,
                 max_rows: int | None = None, out_dir: str = "ckpt_out",
                 scheme: str | None = None, epochs: int | None = None,
                 save_every_steps: int = 500,
                 save_hours: float | None = None, mesh=None,
                 seed: int = 0, log_every: int = 0, log_fn=print,
                 resume_from: str | None = None,
                 corrected: bool = False,
                 geometry: dict | None = None,
                 tp: bool = False, fsdp: bool = False,
                 pack: bool = False) -> dict:
    """``geometry``: optional overrides for the preset's model shape —
    any of d_model / n_head / n_layer / seq_len (e.g. to train a compact
    shippable demo model on a large-preset recipe).
    ``pack``: sequence packing (data.pack_rows) — several whole songs per
    row with block-diagonal attention + per-segment positions; implies
    the corrected causal architecture."""
    import dataclasses as _dc

    scheme = scheme or PRESET_SCHEME[preset]
    tcfg = reference_preset(preset)
    if epochs is not None:
        tcfg = TrainConfig(**{**tcfg.__dict__, "epochs": epochs})

    rows = None if csv_path else synthetic_corpus(synthetic_rows or 256,
                                                  seed=seed)

    geometry = {k: v for k, v in (geometry or {}).items() if v}
    geom = model_preset(preset if preset != "paper" else "large2",
                        vocab_size=1)  # placeholder vocab, rebuilt below
    seq_len = geometry.get("seq_len", geom.seq_len)
    if csv_path:
        encoded, vocab = encode_corpus_csv(csv_path, scheme, seq_len,
                                           max_rows=max_rows)
    else:
        encoded, vocab = encode_corpus(rows, scheme, seq_len)
    cfg = model_preset(preset if preset != "paper" else "large2",
                       vocab_size=len(vocab))
    if geometry:
        if "seq_len" in geometry and cfg.pos_rows is not None:
            # presets with an explicit pos table size tie it to seq_len;
            # pos_rows=None keeps tracking seq_len-1 automatically
            geometry["pos_rows"] = geometry["seq_len"]
        cfg = _dc.replace(cfg, **geometry)
    if corrected or pack:
        # corrected architecture: causal attention, no reference quirks —
        # required for speculative decoding, request coalescing, and
        # packed rows (segment isolation is causal by construction)
        import dataclasses

        cfg = dataclasses.replace(cfg, causal=True, batch_first_bug=False,
                                  pos_broadcast_bug=False)
    # Time-chunked CE measured FASTER at every batch size on large
    # vocabularies (round-3 train-step study, DESIGN.md §3.8: 15.3 ->
    # 14.2 ms at the reference batch-16 flagship geometry — the [B,T,V]
    # logits round-trip never hits HBM), on top of being the OOM fix for
    # big batches. Grad-exact (tested); incompatible with the MoE aux
    # loss, so MoE runs keep the monolithic head.
    loss_chunk = 73 if cfg.vocab_size >= 4096 and not cfg.n_experts \
        else None
    tcfg = TrainConfig(**{**tcfg.__dict__, "pad_id": vocab.pad_id,
                          "tp": tp, "fsdp": fsdp, "pack": pack,
                          "loss_chunk": loss_chunk})

    if resume_from:
        # crash-resume with optimizer state and step count intact — the
        # reference restarted optimization from scratch (SURVEY.md §5.3)
        import jax.numpy as jnp

        from ..utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(resume_from)
        assert ckpt["cfg"] == cfg, (
            f"checkpoint config {ckpt['cfg']} != run config {cfg}")
        trainer = Trainer(cfg, tcfg, ckpt["params"], mesh=mesh)
        if ckpt["opt_state"] is not None:
            trainer.opt_state = jax.tree.map(
                lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
                ckpt["opt_state"])
        trainer.step = ckpt["step"]
    else:
        params = init_params(jax.random.PRNGKey(seed), cfg)
        trainer = Trainer(cfg, tcfg, params, mesh=mesh)
    cadence = CheckpointCadence(every_steps=save_every_steps,
                                every_hours=save_hours)

    os.makedirs(out_dir, exist_ok=True)

    def save(tag):
        save_checkpoint(os.path.join(out_dir, tag), trainer.params,
                        vocab.tok2id, cfg, opt_state=trainer.opt_state,
                        step=trainer.step,
                        extra={"preset": preset, "scheme": scheme})

    from .prefetch import PrefetchIterator

    # with a mesh, Trainer.train_step device_puts with the right sharding —
    # prefetch then only overlaps host-side batch prep
    staging = (lambda b: b) if mesh is not None else None

    last_m = None
    for epoch in range(tcfg.epochs):
        if pack:
            epoch_batches = (
                b for b in packed_batches(
                    encoded, cfg.seq_len, vocab.pad_id, tcfg.micro_batch,
                    tcfg.accum_steps, drop_last=False,
                    shuffle_seed=seed + epoch))
        else:
            epoch_batches = (
                (x, y, None) for x, y in batches(
                    encoded, cfg.seq_len, vocab.pad_id, tcfg.micro_batch,
                    tcfg.accum_steps,
                    drop_last=False,  # small corpora must still train
                    shuffle_seed=seed + epoch))
        for x, y, seg in PrefetchIterator(epoch_batches, depth=2,
                                          device_put=staging):
            # async metrics: blocking on loss every step costs a ~25 ms
            # tunnel RPC and serializes the dispatch stream — fetch only
            # where a number is actually printed/saved
            last_m = trainer.train_step(x, y, seg=seg, sync=False)
            if log_every and trainer.step % log_every == 0:
                log_fn(f"[{preset}] epoch {epoch + 1}/{tcfg.epochs} "
                       f"step {trainer.step}: "
                       f"loss={float(last_m['loss']):.4f}")
            if cadence.should_save(trainer.step):
                save("latest")
        save(f"ep{epoch + 1}")
    save("final")
    last_loss = float(last_m["loss"]) if last_m is not None else float("nan")
    return {"steps": trainer.step, "final_loss": last_loss,
            "vocab_size": len(vocab), "out_dir": out_dir}
