"""Streaming generation: fixed-size compiled chunks, tokens visible early.

The one-while_loop design (decode/loop.py) gives peak throughput but the
host sees nothing until the program returns. For interactive serving —
progress display, early cancellation — generation can instead run as a
sequence of compiled ``chunk``-step programs with the KV cache carried
between calls as device arrays. Each chunk costs one dispatch; tokens reach
the host every ``chunk`` steps.

Greedy streams are bit-identical to the one-shot loop (tested); sampled
streams are seed-reproducible run-to-run.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.gpt import GPTConfig, decode_step, init_kv_cache, prefill
from .grammar import grammar_mask, grammar_step, scan_prompt_state
from .loop import _norm_grammar, _norm_penalties
from .sampling import apply_no_repeat_ngram, sample_token, token_counts


@partial(jax.jit, static_argnames=("cfg", "max_len"))
def start_stream(params: dict, prompt: jax.Array, prompt_len,
                 cfg: GPTConfig, max_len: int):
    """Prefill; returns (logits_at_last_prompt_pos [B, V], cache)."""
    B, P = prompt.shape
    cache = init_kv_cache(cfg, B, max_len)
    logits, cache = prefill(params, prompt, cfg, cache,
                            prompt_len=prompt_len)
    last_logits = jax.lax.dynamic_slice_in_dim(logits, prompt_len - 1, 1,
                                               axis=1)[:, 0]
    return last_logits, cache


def decode_chunk(params: dict, last: jax.Array, done: jax.Array,
                 rng: jax.Array, cache: dict, cfg: GPTConfig,
                 chunk: int = 32, temperature: float = 1.0,
                 top_k: int = 50, eos_id: int = -1, pad_id: int = 0,
                 greedy: bool = False, mask_value: float = -1e10,
                 top_p: float = 1.0, min_p: float = 0.0,
                 penalties: tuple | None = None,
                 counts: jax.Array | None = None,
                 no_repeat_ngram: int = 0,
                 ngram_state: tuple | None = None,
                 grammar=None, grammar_state: tuple | None = None):
    """Thin host wrapper — traced top_p/min_p/penalties, static on/off
    bits (see loop.py). With penalties, pass the running occurrence
    ``counts`` ([B, V], carried between chunks like the cache); returns
    them updated as the sixth value (None when penalties are off). With
    ``no_repeat_ngram`` (static, 0 = off), pass ``ngram_state`` =
    (buf [B, W], pos [B]) — the token history carried between chunks —
    returned updated as the seventh value (None when off). With
    ``grammar`` (Grammar or arrays pytree), pass ``grammar_state`` =
    (gstate [B], budget_left [B]) — returned updated as the eighth
    value (None when off)."""
    use_top_p = top_p is not None and float(top_p) < 1.0
    use_min_p = min_p is not None and float(min_p) > 0.0
    rep_p, freq_p, pres_p, use_pen = _norm_penalties(penalties)
    garr, use_gram = _norm_grammar(grammar)
    ngram = int(no_repeat_ngram or 0)
    if use_pen:
        assert counts is not None, "penalties need the counts state"
    else:
        counts = jnp.zeros((last.shape[0], 1), jnp.float32)  # placeholder
    if ngram:
        assert ngram_state is not None, \
            "no_repeat_ngram needs the (buf, pos) history state"
        buf, pos = ngram_state
    else:
        buf = jnp.zeros((last.shape[0], 1), jnp.int32)       # placeholder
        pos = jnp.zeros((last.shape[0],), jnp.int32)
    if use_gram:
        assert grammar_state is not None, \
            "grammar needs the (gstate, budget_left) state"
        gstate, budget = grammar_state
    else:
        gstate = jnp.zeros((last.shape[0],), jnp.int32)      # placeholder
        budget = jnp.zeros((last.shape[0],), jnp.int32)
    (toks, last, done, rng, cache, counts, buf, pos, gstate,
     budget) = _decode_chunk(
        params, last, done, rng, cache, cfg, chunk, temperature, top_k,
        eos_id, pad_id, greedy, mask_value,
        float(top_p) if use_top_p else 1.0, use_top_p,
        float(min_p) if use_min_p else 0.0, use_min_p,
        rep_p, freq_p, pres_p, use_pen, counts, ngram, buf, pos,
        garr, use_gram, gstate, budget)
    return (toks, last, done, rng, cache,
            (counts if use_pen else None),
            ((buf, pos) if ngram else None),
            ((gstate, budget) if use_gram else None))


@partial(jax.jit, static_argnames=("cfg", "chunk", "top_k", "greedy",
                                   "mask_value", "use_top_p", "use_min_p",
                                   "use_penalties", "no_repeat_ngram",
                                   "use_grammar"))
def _decode_chunk(params: dict, last: jax.Array, done: jax.Array,
                  rng: jax.Array, cache: dict, cfg: GPTConfig,
                  chunk: int = 32, temperature: float = 1.0,
                  top_k: int = 50, eos_id: int = -1, pad_id: int = 0,
                  greedy: bool = False, mask_value: float = -1e10,
                  top_p=1.0, use_top_p: bool = False,
                  min_p=0.0, use_min_p: bool = False,
                  rep_p=1.0, freq_p=0.0, pres_p=0.0,
                  use_penalties: bool = False, counts=None,
                  no_repeat_ngram: int = 0, buf=None, pos=None,
                  grammar=None, use_grammar: bool = False,
                  gstate=None, budget=None):
    """Run ``chunk`` decode steps; finished rows emit PAD. Returns
    (tokens [B, chunk], last, done, rng, cache, counts, buf, pos,
    gstate, budget)."""
    if no_repeat_ngram:
        cols = jnp.arange(buf.shape[1])[None, :]

    def body(carry, _):
        last, done, rng, cache, counts, buf, pos, gstate, budget = carry
        active = ~done
        rng, sub = jax.random.split(rng)
        logits, cache = decode_step(params, last[:, None], cache, cfg)
        if no_repeat_ngram:
            logits = apply_no_repeat_ngram(logits, buf, pos,
                                           no_repeat_ngram, mask_value)
        if use_grammar:
            logits = grammar_mask(logits, gstate, grammar,
                                  budget_left=budget)
        nxt = sample_token(sub, logits, temperature, top_k, mask_value,
                           greedy, top_p=top_p, use_top_p=use_top_p,
                           min_p=min_p, use_min_p=use_min_p,
                           counts=counts if use_penalties else None,
                           repetition_penalty=rep_p,
                           frequency_penalty=freq_p,
                           presence_penalty=pres_p,
                           use_penalties=use_penalties)
        out = jnp.where(done, pad_id, nxt).astype(jnp.int32)
        new_done = done | (nxt == eos_id)
        new_last = jnp.where(done, last, nxt)
        if use_penalties:
            counts = counts + ((nxt[:, None] == jnp.arange(
                cfg.vocab_size)[None, :]) & active[:, None]).astype(
                jnp.float32)
        if no_repeat_ngram:
            # masked one-hot write (see ragged.py: the vmapped-scatter
            # form compiles pathologically on the remote helper)
            hit = (cols == pos[:, None]) & active[:, None]
            buf = jnp.where(hit, nxt[:, None].astype(jnp.int32), buf)
            pos = pos + active.astype(jnp.int32)
        if use_grammar:
            gstate = grammar_step(gstate, nxt, grammar, active=active)
            budget = budget - active.astype(jnp.int32)
        return (new_last, new_done, rng, cache, counts, buf, pos,
                gstate, budget), out

    (last, done, rng, cache, counts, buf, pos, gstate,
     budget), toks = jax.lax.scan(
        body, (last, done, rng, cache, counts, buf, pos, gstate, budget),
        None, length=chunk)
    return (toks.swapaxes(0, 1), last, done, rng, cache, counts, buf, pos,
            gstate, budget)


def stream_tokens(params: dict, cfg: GPTConfig, prompt_ids: list[int],
                  max_len: int, chunk: int = 32, temperature: float = 1.0,
                  top_k: int = 50, eos_id: int = -1, pad_id: int = 0,
                  greedy: bool = False, seed: int = 0, bucket: int = 64,
                  top_p: float = 1.0, min_p: float = 0.0,
                  penalties: tuple | None = None,
                  no_repeat_ngram: int = 0, grammar=None):
    """Python generator yielding token ids one at a time (batch 1).

    First sampled token comes from the prefill logits (efficient mode);
    subsequent tokens arrive in compiled ``chunk``-step batches.
    """
    p = len(prompt_ids)
    if p >= max_len:
        # No slot left to generate into (reference: zero loop iterations,
        # api_cache.py:166); the cache would otherwise overflow.
        return
    width = max(bucket, 1)
    while width < p:
        width *= 2
    width = min(width, max_len)
    prompt = np.full((1, width), pad_id, np.int32)
    prompt[0, :p] = prompt_ids
    rng = jax.random.PRNGKey(seed)
    # cache is sized max_len + chunk so a final partial chunk can overshoot
    last_logits, cache = start_stream(params, jnp.asarray(prompt), p, cfg,
                                      max_len + chunk)

    rep_p, freq_p, pres_p, use_pen = _norm_penalties(penalties)
    garr, use_gram = _norm_grammar(grammar)
    ngram = int(no_repeat_ngram or 0)
    counts = token_counts(
        jnp.asarray(prompt), jnp.arange(width)[None, :] < p,
        cfg.vocab_size) if use_pen else None
    ngram_state = None
    if ngram:
        # history buffer sized like the cache (max_len + chunk) so the
        # final partial chunk's overshoot writes stay in bounds
        hbuf = jnp.zeros((1, max_len + chunk), jnp.int32)
        hbuf = jax.lax.dynamic_update_slice(hbuf, jnp.asarray(prompt),
                                            (0, 0))
        last_logits = apply_no_repeat_ngram(last_logits, hbuf, p, ngram)
    grammar_state = None
    if use_gram:
        gstate = scan_prompt_state(garr, jnp.asarray(prompt), p)
        gbudget = jnp.full((1,), max_len - p, jnp.int32)
        last_logits = grammar_mask(last_logits, gstate, garr,
                                   budget_left=gbudget)
    rng, sub = jax.random.split(rng)
    first = sample_token(sub, last_logits, temperature, top_k, -1e10,
                         greedy, top_p=top_p,
                         use_top_p=top_p is not None and float(top_p) < 1.0,
                         min_p=min_p,
                         use_min_p=min_p is not None and float(min_p) > 0.0,
                         counts=counts, repetition_penalty=rep_p,
                         frequency_penalty=freq_p, presence_penalty=pres_p,
                         use_penalties=use_pen)
    if use_pen:
        counts = counts + (first[:, None] == jnp.arange(
            cfg.vocab_size)[None, :]).astype(jnp.float32)
    if ngram:
        hbuf = jax.lax.dynamic_update_slice(
            hbuf, first[:, None].astype(jnp.int32), (0, p))
        ngram_state = (hbuf, jnp.full((1,), p + 1, jnp.int32))
    if use_gram:
        grammar_state = (grammar_step(gstate, first, garr), gbudget - 1)
    tok = int(first[0])
    yield tok
    if tok == eos_id:
        return
    produced = p + 1
    last = first
    done = first == eos_id
    while produced < max_len:
        (toks, last, done, rng, cache, counts, ngram_state,
         grammar_state) = decode_chunk(
            params, last, done, rng, cache, cfg, chunk=chunk,
            temperature=temperature, top_k=top_k, eos_id=eos_id,
            pad_id=pad_id, greedy=greedy, top_p=top_p, min_p=min_p,
            penalties=penalties, counts=counts,
            no_repeat_ngram=ngram, ngram_state=ngram_state,
            grammar=grammar, grammar_state=grammar_state)
        for t in np.asarray(toks)[0]:
            t = int(t)
            if produced >= max_len:
                return
            yield t
            produced += 1
            if t == eos_id:
                return
        if bool(np.asarray(done)[0]):
            return
