"""Compiled autoregressive generation: one ``lax.while_loop`` per request.

Replaces the reference's per-token Python loops (api_cache.py:166-182 hot
loop; api.py:81-91 uncached loop) with single compiled programs:

- :func:`generate_kv` — KV-cache decode. The cache lives in HBM as a
  preallocated ``[L, B, H, max_len, Dh]`` buffer updated with
  ``dynamic_update_slice``; sampling (temperature / top-k / categorical) is
  fused on-device; early exit on ``[END_SEQUENCE]`` via the loop predicate.
- :func:`generate_full` — the uncached O(T²) ablation path: each step
  re-encodes the whole prefix (reference ``sample()``), expressed as a
  fixed-shape masked forward so XLA compiles ONCE instead of once per
  length.

Reference-exactness flags:
- ``refeed_last_prompt=True`` reproduces sample_kvcache verbatim: the
  warm-up logits are discarded and the first loop iteration re-feeds the
  final prompt token, duplicating it in the cache (api_cache.py:162-168).
  False samples directly from the prefill logits (efficient mode).
- EOS is appended before stopping, like the reference (api_cache.py:179-182).

Shapes are static: ``max_len`` and ``top_k`` compile into the program;
per-request prompt lengths are handled by padding the prompt buffer and
masking (bucketed compilation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.gpt import GPTConfig, decode_step, forward_masked, prefill
from ..models.gpt import init_kv_cache
from .grammar import (Grammar, grammar_mask, grammar_step,
                      scan_prompt_state)
from .grammar import placeholder as _grammar_placeholder
from .sampling import (_penalties_on, apply_no_repeat_ngram, sample_token,
                       token_counts)


def _norm_grammar(grammar):
    """Grammar | arrays-dict | None -> (device pytree, static on/off)."""
    if grammar is None:
        return _grammar_placeholder(), False
    if isinstance(grammar, Grammar):
        return grammar.arrays(), True
    return grammar, True


def _norm_penalties(penalties):
    """(rep, freq, pres) or None -> (rep, freq, pres, use_penalties) with
    the static on/off bit decided host-side (neutral tuple compiles the
    counts state out entirely, keeping the default program unchanged)."""
    if penalties is None:
        return 1.0, 0.0, 0.0, False
    rep_p, freq_p, pres_p = penalties
    use = _penalties_on(rep_p, freq_p, pres_p)
    if not use:
        return 1.0, 0.0, 0.0, False
    return (float(rep_p) if rep_p is not None else 1.0,
            float(freq_p) if freq_p is not None else 0.0,
            float(pres_p) if pres_p is not None else 0.0, True)


def generate_kv(params: dict, prompt: jax.Array, prompt_len, rng: jax.Array,
                cfg: GPTConfig, max_len: int, temperature: float = 1.0,
                top_k: int = 50, eos_id: int = -1, pad_id: int = 0,
                greedy: bool = False, refeed_last_prompt: bool = True,
                mask_value: float = -1e10, approx_top_k: bool = False,
                top_k_impl: str = "bitsearch", presplit_keys: bool = False,
                top_p: float = 1.0, min_p: float = 0.0,
                penalties: tuple | None = None,
                no_repeat_ngram: int = 0, grammar=None):
    """Thin host wrapper: top_p/min_p/penalties stay TRACED operands
    (client-supplied floats must not each trigger a fresh multi-minute
    remote compile); only the on/off bits are static.

    ``penalties``: optional (repetition, frequency, presence) tuple —
    see sampling.apply_penalties. None or the neutral (1, 0, 0) compiles
    the penalty state out of the loop entirely.
    ``grammar``: optional decode.grammar.Grammar (or its ``arrays()``
    pytree) — constrains every sampled token to the scheme's FSM, with
    budget-aware closing so streams end with a complete note + EOS. The
    tables are traced; only the on/off bit is static."""
    use_top_p = top_p is not None and float(top_p) < 1.0
    use_min_p = min_p is not None and float(min_p) > 0.0
    rep_p, freq_p, pres_p, use_pen = _norm_penalties(penalties)
    garr, use_gram = _norm_grammar(grammar)
    return _generate_kv(params, prompt, prompt_len, rng, cfg, max_len,
                        temperature, top_k, eos_id, pad_id, greedy,
                        refeed_last_prompt, mask_value, approx_top_k,
                        top_k_impl, presplit_keys,
                        float(top_p) if use_top_p else 1.0, use_top_p,
                        float(min_p) if use_min_p else 0.0, use_min_p,
                        rep_p, freq_p, pres_p, use_pen,
                        int(no_repeat_ngram or 0), garr, use_gram)


@partial(jax.jit, static_argnames=("cfg", "max_len", "top_k", "greedy",
                                   "refeed_last_prompt", "mask_value",
                                   "approx_top_k", "top_k_impl", "eos_id",
                                   "presplit_keys", "use_top_p",
                                   "use_min_p", "use_penalties",
                                   "no_repeat_ngram", "use_grammar"))
def _generate_kv(params: dict, prompt: jax.Array, prompt_len, rng: jax.Array,
                 cfg: GPTConfig, max_len: int, temperature: float = 1.0,
                 top_k: int = 50, eos_id: int = -1, pad_id: int = 0,
                 greedy: bool = False, refeed_last_prompt: bool = True,
                 mask_value: float = -1e10, approx_top_k: bool = False,
                 top_k_impl: str = "bitsearch", presplit_keys: bool = False,
                 top_p=1.0, use_top_p: bool = False,
                 min_p=0.0, use_min_p: bool = False,
                 rep_p=1.0, freq_p=0.0, pres_p=0.0,
                 use_penalties: bool = False, no_repeat_ngram: int = 0,
                 grammar=None, use_grammar: bool = False):
    """KV-cache generation.

    prompt: [B, P] int32, padded to a static bucket P; prompt_len: scalar
    number of real prompt tokens (same for all rows). Returns
    (tokens [B, max_len], n_tokens scalar) where positions >= n_tokens are
    pad_id.

    ``eos_id`` is static: a negative value compiles the EOS bookkeeping
    (done mask, write masking, the all-rows-done loop predicate) out of the
    hot loop entirely — fixed-length generation (measured ~13 µs/step on
    v5e). ``presplit_keys=True`` draws all per-step PRNG keys with one
    ``jax.random.split`` before the loop instead of one split per step;
    sampled streams remain deterministic per seed but differ from the
    per-step-split sequence.
    """
    B, P = prompt.shape
    # Without the pos-broadcast quirk, decode_step reads params["pos"][t]
    # for t up to max_len-1; trainer presets allocate only seq_len-1 rows
    # (train/train_large2.py:87), so decoding to seq_len would silently
    # clamp the last position lookup.
    assert cfg.pos_broadcast_bug or max_len <= cfg.n_pos, (
        f"max_len={max_len} exceeds the positional table "
        f"(n_pos={cfg.n_pos}); cap decode length at cfg.n_pos")
    cache = init_kv_cache(cfg, B, max_len)
    logits0, cache = prefill(params, prompt, cfg, cache,
                             prompt_len=prompt_len)

    buf = jnp.full((B, max_len), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.where(jnp.arange(P)[None, :] < prompt_len, prompt,
                       pad_id).astype(jnp.int32), (0, 0))

    done0 = jnp.zeros((B,), bool)
    counts0 = token_counts(
        prompt, jnp.arange(P)[None, :] < prompt_len,
        cfg.vocab_size) if use_penalties else None
    gstate0 = scan_prompt_state(grammar, prompt,
                                prompt_len) if use_grammar else None
    if refeed_last_prompt:
        # Reference mode: discard warm-up logits; first step re-feeds the
        # last prompt token.
        last0 = jax.lax.dynamic_slice_in_dim(
            prompt.astype(jnp.int32), prompt_len - 1, 1, axis=1)[:, 0]
        pos0 = prompt_len
        rng0 = rng
    else:
        # Efficient mode: the warm-up logits at the last real prompt
        # position directly yield the first token.
        rng0, sub = jax.random.split(rng)
        # dynamic_slice, NOT take_along_axis: a gather whose index is
        # broadcast across the vocab axis lowers to a ~25 ms scalar-core
        # gather on this backend (measured; amortized ~50 us/step)
        last_logits = jax.lax.dynamic_slice_in_dim(
            logits0, prompt_len - 1, 1, axis=1)[:, 0]
        if no_repeat_ngram:
            last_logits = apply_no_repeat_ngram(
                last_logits, buf, prompt_len, no_repeat_ngram, mask_value)
        if use_grammar:
            last_logits = grammar_mask(last_logits, gstate0, grammar,
                                       budget_left=max_len - prompt_len)
        first = sample_token(sub, last_logits, temperature, top_k,
                             mask_value, greedy, approx_top_k, top_k_impl,
                             top_p, use_top_p, min_p, use_min_p,
                             counts=counts0, repetition_penalty=rep_p,
                             frequency_penalty=freq_p,
                             presence_penalty=pres_p,
                             use_penalties=use_penalties)
        buf = jax.lax.dynamic_update_slice(buf, first[:, None],
                                           (0, prompt_len))
        done0 = first == eos_id
        last0 = first
        pos0 = prompt_len + 1
        if use_penalties:
            counts0 = counts0 + (first[:, None] == jnp.arange(
                cfg.vocab_size)[None, :]).astype(jnp.float32)
        if use_grammar:
            gstate0 = grammar_step(gstate0, first, grammar)

    track_eos = eos_id >= 0           # static: compiled in or out
    if presplit_keys and not greedy:
        step_keys = jax.random.split(rng0, max_len)       # [max_len, 2]

    def cond(state):
        pos, done = state[1], state[3]
        if track_eos:
            return jnp.logical_and(pos < max_len, ~jnp.all(done))
        return pos < max_len

    def body(state):
        buf, pos, last, done, rng, cache = state[:6]
        idx = 6
        counts = state[idx] if use_penalties else None
        idx += int(use_penalties)
        gstate = state[idx] if use_grammar else None
        active = ~done                      # rows still generating
        if greedy:
            sub = rng
        elif presplit_keys:
            sub = step_keys[pos]
        else:
            rng, sub = jax.random.split(rng)
        logits, cache = decode_step(params, last[:, None], cache, cfg)
        if no_repeat_ngram:
            logits = apply_no_repeat_ngram(logits, buf, pos,
                                           no_repeat_ngram, mask_value)
        if use_grammar:
            logits = grammar_mask(logits, gstate, grammar,
                                  budget_left=max_len - pos)
        nxt = sample_token(sub, logits, temperature, top_k, mask_value,
                           greedy, approx_top_k, top_k_impl, top_p,
                           use_top_p, min_p, use_min_p, counts=counts,
                           repetition_penalty=rep_p, frequency_penalty=freq_p,
                           presence_penalty=pres_p,
                           use_penalties=use_penalties)
        if track_eos:
            write = jnp.where(done, pad_id, nxt).astype(jnp.int32)
            done = jnp.logical_or(done, nxt == eos_id)
        else:
            write = nxt.astype(jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, write[:, None], (0, pos))
        out = (buf, pos + 1, nxt, done, rng, cache)
        if use_penalties:
            counts = counts + ((nxt[:, None] == jnp.arange(
                cfg.vocab_size)[None, :]) & active[:, None]).astype(
                jnp.float32)
            out = out + (counts,)
        if use_grammar:
            out = out + (grammar_step(gstate, nxt, grammar, active=active),)
        return out

    state0 = (buf, jnp.asarray(pos0, jnp.int32), last0, done0, rng0, cache)
    if use_penalties:
        state0 = state0 + (counts0,)
    if use_grammar:
        state0 = state0 + (gstate0,)
    res = jax.lax.while_loop(cond, body, state0)
    return res[0], res[1]


def generate_full(params: dict, prompt: jax.Array, prompt_len,
                  rng: jax.Array, cfg: GPTConfig, max_len: int,
                  temperature: float = 1.0, top_k: int = 50,
                  eos_id: int = -1, pad_id: int = 0, greedy: bool = False,
                  mask_value: float = -1e10, approx_top_k: bool = False,
                  top_k_impl: str = "bitsearch", top_p: float = 1.0,
                  min_p: float = 0.0, penalties: tuple | None = None,
                  no_repeat_ngram: int = 0, grammar=None):
    """Thin host wrapper — see generate_kv: traced top_p/min_p/penalties/
    grammar tables, static on/off bits; static no_repeat_ngram."""
    use_top_p = top_p is not None and float(top_p) < 1.0
    use_min_p = min_p is not None and float(min_p) > 0.0
    rep_p, freq_p, pres_p, use_pen = _norm_penalties(penalties)
    garr, use_gram = _norm_grammar(grammar)
    return _generate_full(params, prompt, prompt_len, rng, cfg, max_len,
                          temperature, top_k, eos_id, pad_id, greedy,
                          mask_value, approx_top_k, top_k_impl,
                          float(top_p) if use_top_p else 1.0, use_top_p,
                          float(min_p) if use_min_p else 0.0, use_min_p,
                          rep_p, freq_p, pres_p, use_pen,
                          int(no_repeat_ngram or 0), garr, use_gram)


@partial(jax.jit, static_argnames=("cfg", "max_len", "top_k", "greedy",
                                   "mask_value", "approx_top_k",
                                   "top_k_impl", "use_top_p", "use_min_p",
                                   "use_penalties", "no_repeat_ngram",
                                   "use_grammar"))
def _generate_full(params: dict, prompt: jax.Array, prompt_len,
                   rng: jax.Array, cfg: GPTConfig, max_len: int,
                   temperature: float = 1.0, top_k: int = 50,
                   eos_id: int = -1, pad_id: int = 0, greedy: bool = False,
                   mask_value: float = -1e10, approx_top_k: bool = False,
                   top_k_impl: str = "bitsearch", top_p=1.0,
                   use_top_p: bool = False, min_p=0.0,
                   use_min_p: bool = False, rep_p=1.0, freq_p=0.0,
                   pres_p=0.0, use_penalties: bool = False,
                   no_repeat_ngram: int = 0, grammar=None,
                   use_grammar: bool = False):
    """Uncached generation (reference ``sample()``, api.py:77-92): each step
    re-encodes the whole prefix bidirectionally. One fixed-shape compile:
    the forward always sees [B, max_len-1] with a validity mask."""
    B, P = prompt.shape
    T = max_len - 1  # the reference never re-encodes the final token
    buf = jnp.full((B, max_len), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.where(jnp.arange(P)[None, :] < prompt_len, prompt,
                       pad_id).astype(jnp.int32), (0, 0))

    counts0 = token_counts(
        prompt, jnp.arange(P)[None, :] < prompt_len,
        cfg.vocab_size) if use_penalties else None
    gstate0 = scan_prompt_state(grammar, prompt,
                                prompt_len) if use_grammar else None

    def cond(state):
        pos, done = state[1], state[2]
        return jnp.logical_and(pos < max_len, ~jnp.all(done))

    def body(state):
        buf, pos, done, rng = state[:4]
        idx = 4
        counts = state[idx] if use_penalties else None
        idx += int(use_penalties)
        gstate = state[idx] if use_grammar else None
        active = ~done
        rng, sub = jax.random.split(rng)
        logits = forward_masked(params, buf[:, :T], cfg, valid_len=pos)
        last_logits = jax.lax.dynamic_slice_in_dim(logits, pos - 1, 1,
                                                   axis=1)[:, 0]
        if no_repeat_ngram:
            last_logits = apply_no_repeat_ngram(
                last_logits, buf, pos, no_repeat_ngram, mask_value)
        if use_grammar:
            last_logits = grammar_mask(last_logits, gstate, grammar,
                                       budget_left=max_len - pos)
        nxt = sample_token(sub, last_logits, temperature, top_k, mask_value,
                           greedy, approx_top_k, top_k_impl, top_p,
                           use_top_p, min_p, use_min_p, counts=counts,
                           repetition_penalty=rep_p, frequency_penalty=freq_p,
                           presence_penalty=pres_p,
                           use_penalties=use_penalties)
        write = jnp.where(done, pad_id, nxt).astype(jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, write[:, None], (0, pos))
        done = jnp.logical_or(done, nxt == eos_id)
        out = (buf, pos + 1, done, rng)
        if use_penalties:
            counts = counts + ((nxt[:, None] == jnp.arange(
                cfg.vocab_size)[None, :]) & active[:, None]).astype(
                jnp.float32)
            out = out + (counts,)
        if use_grammar:
            out = out + (grammar_step(gstate, nxt, grammar, active=active),)
        return out

    state0 = (buf, jnp.asarray(prompt_len, jnp.int32),
              jnp.zeros((B,), bool), rng)
    if use_penalties:
        state0 = state0 + (counts0,)
    if use_grammar:
        state0 = state0 + (gstate0,)
    res = jax.lax.while_loop(cond, body, state0)
    return res[0], res[1]
