"""§10.4 ablation harness: the paper's PPL / MSE-Tune table, one command.

The reference computed its ablation table (paper §10.4: full / −KV cache /
−emotion control tokens / −fine duration bins) with out-of-repo tooling
(SURVEY.md §4). This runner trains the three model variants, evaluates
held-out perplexity and tempo-conditioning MSE for all four rows, and emits
a markdown table with the same row structure. Runs on the synthetic
tempo-locked corpus by default; pass ``csv_path`` to reproduce at paper
scale on the real Lakh CSV (drop-in: same ``tokens`` column schema).

Row semantics:
- **full**: Scheme-B3 (50 ms bins, BPM/KEY control tokens), KV-cache decode.
- **− KV cache**: the *same trained model* decoded through the uncached
  O(T²) re-encode path (reference api.py:77-92). With our exactly-
  equivalent cache the teacher-forced PPL is identical by construction
  (the reference saw 1.17→1.18 only because its KV server remaps post-LN
  weights into a pre-LN arch, SURVEY §2.3.3); the cost shows up in the
  ms/token column, mirroring the paper's 0.45 vs 0.29 ms headline.
- **− emotion tokens**: retrained with the BPM/KEY control prefix stripped
  from the training data (explode without controls); generation cannot be
  conditioned, so MSE-Tune degrades (paper: 0.026 → 0.041).
- **− fine bins**: retrained at 200 ms onset/duration buckets instead of
  50 ms; timing quantization degrades both PPL and MSE (paper: fourth row).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class AblationRow:
    name: str
    ppl: float
    mse_tune: float
    ms_per_token: float
    train_steps: int = 0
    final_loss: float = float("nan")
    notes: str = ""


@dataclass
class AblationConfig:
    # data
    csv_path: str | None = None        # real Lakh corpus (paper scale)
    n_rows: int = 384                  # synthetic rows when csv_path absent
    max_rows: int | None = None        # cap on CSV rows
    eval_frac: float = 0.125
    # Gaussian micro-timing on synthetic onsets/offsets (ms). Real Lakh
    # is performance MIDI: human jitter is what makes 200 ms buckets
    # DEGRADE PPL (paper §10.4's −fine-bins row) instead of trivially
    # winning on a grid-pure corpus. 0 keeps the old grid-pure corpus.
    jitter_ms: float = 0.0
    # BPM set for the synthetic corpus. A set whose half-beats are exact
    # 50 ms multiples (e.g. (60, 75, 100, 120, 150)) makes the 50 ms
    # tokenization DETERMINISTIC while 200 ms buckets phase-alias —
    # the regime (sequenced/quantized MIDI, most of Lakh) where the
    # paper's −fine-bins degradation appears. None = uniform 60..180
    # (incommensurate: both resolutions alias).
    bpm_set: tuple | None = None
    # Motif-structured corpus (train/data.py grid_song): durations come
    # from a shared motif library, so the EXACT rhythm identifies which
    # motif is playing and therefore the continuation. This is the
    # mechanism that makes fine bins win on real music: the per-token
    # entropy they pay encoding precise timing is repaid by a sharper
    # CONTEXT for later predictions; iid-duration corpora can never show
    # it (coarse bins win the pure rate trade there).
    motif_corpus: bool = False
    # model geometry (small-by-default; paper scale = large2 geometry)
    seq_len: int = 96
    d_model: int = 128
    n_head: int = 4
    n_layer: int = 2
    # training
    epochs: int = 4
    micro_batch: int = 16
    lr: float = 3e-4
    seed: int = 0
    # MSE-Tune generation
    bpm_targets: tuple = (70, 90, 110, 130, 150, 180)
    gen_batch: int = 4
    dtype: str = "float32"
    log_fn: object = field(default=print)


def _train_variant(rows, scheme, strip_controls, acfg: AblationConfig):
    """Train one model variant; returns (params, cfg, vocab, eval_ids,
    steps, final_loss)."""
    import jax

    from ..models.gpt import GPTConfig, init_params
    from ..train.data import batches, pad_rows
    from ..train.trainer import TrainConfig, Trainer
    from ..tokenizer.scheme_b import SchemeB2

    explode = (lambda js: SchemeB2.explode(scheme, js)) if strip_controls \
        else scheme.explode
    encoded = [explode(js) for js in rows]
    n_eval = max(1, int(len(encoded) * acfg.eval_frac))
    train_ids, eval_ids = encoded[n_eval:], encoded[:n_eval]

    vocab = scheme.vocab
    cfg = GPTConfig(vocab_size=len(vocab), seq_len=acfg.seq_len,
                    d_model=acfg.d_model, n_head=acfg.n_head,
                    n_layer=acfg.n_layer, causal=True, dtype=acfg.dtype)
    tcfg = TrainConfig(lr=acfg.lr, micro_batch=acfg.micro_batch,
                       epochs=acfg.epochs, pad_id=vocab.pad_id)
    params = init_params(jax.random.PRNGKey(acfg.seed), cfg)
    trainer = Trainer(cfg, tcfg, params)
    loss = float("nan")
    for epoch in range(tcfg.epochs):
        for x, y in batches(train_ids, cfg.seq_len, vocab.pad_id,
                            tcfg.micro_batch, drop_last=False,
                            shuffle_seed=acfg.seed + epoch):
            loss = trainer.train_step(x, y, sync=False)["loss"]
    loss = float(loss)

    eval_padded = pad_rows(eval_ids, cfg.seq_len, vocab.pad_id)
    return trainer.params, cfg, vocab, eval_padded, trainer.step, loss


def _mse_and_speed(params, cfg, scheme, acfg: AblationConfig,
                   conditioned: bool, use_cache: bool):
    """Generate at each target BPM; returns (mse_tune, ms_per_token)."""
    from ..decode.api import Generator
    from ..tokenizer.scheme_b import key_to_idx
    from .metrics import estimate_bpm, tempo_mse

    gen = Generator(params, cfg, scheme.vocab, eos_token="[END_SEQ]")
    key_idx = key_to_idx("C major")
    pairs, total_tokens, total_s = [], 0, 0.0
    for bi, bpm in enumerate(acfg.bpm_targets):
        if conditioned:
            prompt = scheme.control_prefix(bpm, key_idx)
        else:
            prompt = [scheme.vocab.tok2id["[START_SEQ]"]]
        kwargs = dict(temperature=1.0, top_k=50, seed=acfg.seed + bi,
                      batch=acfg.gen_batch, use_cache=use_cache)
        if bi == 0:
            gen.generate_ids(prompt, **kwargs)  # compile outside the clock
        t0 = time.perf_counter()
        out = gen.generate_ids(prompt, **kwargs)
        dt = time.perf_counter() - t0
        total_s += dt
        total_tokens += out.shape[0] * max(out.shape[1] - len(prompt), 1)
        for row in out:
            song = scheme.decode_to_song(row)
            pairs.append((float(bpm), estimate_bpm(song)))
    ms_per_token = 1000.0 * total_s / max(total_tokens, 1)
    return tempo_mse(pairs), ms_per_token


def run_ablation(acfg: AblationConfig | None = None) -> list[AblationRow]:
    acfg = acfg or AblationConfig()
    from ..decode.replay import perplexity
    from ..tokenizer.scheme_b import SchemeB3
    from ..train.data import iter_csv_tokens, synthetic_corpus

    log = acfg.log_fn
    if acfg.csv_path:
        rows = list(iter_csv_tokens(acfg.csv_path, max_rows=acfg.max_rows))
    elif acfg.motif_corpus:
        import json as _json
        import random as _random

        from ..train.data import grid_song, motif_library

        _rng = _random.Random(acfg.seed)
        lib = motif_library(40, seed=7)
        bpms = acfg.bpm_set or (60, 75, 100, 120, 150)
        rows = [_json.dumps(grid_song(_rng, lib,
                                      bpm=float(_rng.choice(bpms)),
                                      max_units=40))
                for _ in range(acfg.n_rows)]
    else:
        rows = synthetic_corpus(acfg.n_rows, seed=acfg.seed,
                                tempo_locked=True,
                                jitter_ms=acfg.jitter_ms,
                                bpm_set=acfg.bpm_set)
    kind = ("csv" if acfg.csv_path else
            "synthetic motif-grid" if acfg.motif_corpus else
            "synthetic tempo-locked")
    log(f"[ablate] corpus: {len(rows)} rows ({kind}"
        f"{f', jitter {acfg.jitter_ms:g} ms' if acfg.jitter_ms else ''})")

    variants = {
        "full": (SchemeB3(seq_len=acfg.seq_len, res_ms=50), False),
        "- emotion tokens": (SchemeB3(seq_len=acfg.seq_len, res_ms=50),
                             True),
        "- fine bins": (SchemeB3(seq_len=acfg.seq_len, res_ms=200), False),
    }
    trained = {}
    for name, (scheme, strip) in variants.items():
        t0 = time.perf_counter()
        trained[name] = _train_variant(rows, scheme, strip, acfg)
        log(f"[ablate] trained {name!r}: {trained[name][4]} steps, "
            f"loss {trained[name][5]:.3f} "
            f"({time.perf_counter() - t0:.0f}s)")

    out = []
    for name, use_cache, src in (("full", True, "full"),
                                 ("- KV cache", False, "full"),
                                 ("- emotion tokens", True,
                                  "- emotion tokens"),
                                 ("- fine bins", True, "- fine bins")):
        params, cfg, vocab, eval_ids, steps, loss = trained[src]
        scheme, strip = variants[src]
        ppl = perplexity(params, cfg, eval_ids, pad_id=vocab.pad_id)
        mse, ms_tok = _mse_and_speed(params, cfg, scheme, acfg,
                                     conditioned=not strip,
                                     use_cache=use_cache)
        note = {"full": "KV-cache decode",
                "- KV cache": "same model, uncached O(T²) decode",
                "- emotion tokens": "no BPM/KEY controls (unconditioned)",
                "- fine bins": "200 ms buckets (vs 50 ms)"}[name]
        row = AblationRow(name=name, ppl=ppl, mse_tune=mse,
                          ms_per_token=ms_tok, train_steps=steps,
                          final_loss=loss, notes=note)
        log(f"[ablate] {name}: PPL {ppl:.3f}  MSE-Tune {mse:.4f}  "
            f"{ms_tok:.3f} ms/token")
        out.append(row)
    return out


def markdown_table(rows: list[AblationRow]) -> str:
    """Paper-§10.4-shaped table (MOS omitted: it needs human raters)."""
    lines = ["| Model | PPL ↓ | MSE-Tune ↓ | ms/token ↓ | notes |",
             "|---|---|---|---|---|"]
    for r in rows:
        lines.append(f"| {r.name} | {r.ppl:.3f} | {r.mse_tune:.4f} | "
                     f"{r.ms_per_token:.3f} | {r.notes} |")
    return "\n".join(lines)
