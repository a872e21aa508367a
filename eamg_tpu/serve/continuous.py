"""Continuous batching: requests join and leave a RUNNING ragged decode.

The window batcher (serve/batcher.py) groups requests that arrive within
10 ms; anything landing mid-decode waits out the running generation
(~0.5 s for 512 tokens). Here the engine owns a persistent device-resident
decode state — a fixed pool of row slots over one shared ragged KV cache —
and advances it in compiled ``chunk``-step programs. Between chunks the
host admits queued requests into free slots (a compiled per-row prefill
scatters the new row's K/V into the shared cache) and harvests finished
rows, so a request arriving mid-decode starts within ~one chunk instead of
one full generation. The reference handled requests strictly serially
(api_cache.py:186-241 module-scope model + uvicorn worker).

Correctness contract (tested): every row's token stream is bit-identical
to the same request decoded alone through decode/ragged.py — per-row PRNG
keys advance once per step of *that row's* life, independent of batch
composition, admission timing, or chunk boundaries.

Throughput: host syncs are pipelined — chunk k+1 is dispatched before
chunk k's flags are fetched, so the ~25 ms tunnel RPC latency overlaps
device compute (depth-1 lookahead; harvest therefore lags completion by
at most one chunk), and each harvest is ONE packed host fetch
(buf+pos+done concatenated on device by ``_pack_snapshot``) instead of
three — the fixed per-fetch RPC, not bytes, is what the tunnel charges.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..decode.api import Generator, _bucket
from ..decode.grammar import (Grammar, grammar_mask, grammar_step,
                              scan_prompt_state)
from ..decode.grammar import placeholder as _grammar_placeholder
from ..decode.ragged import (decode_block_ragged, decode_step_ragged,
                             init_ragged_cache, prefill_ragged)
from ..decode.sampling import (apply_min_p, apply_no_repeat_ngram,
                               apply_penalties, apply_top_k, apply_top_p,
                               sample_token, token_counts)

_split_rows = jax.vmap(lambda k: jax.random.split(k))

_NEUTRAL_PEN = (1.0, 0.0, 0.0)   # (repetition, frequency, presence) = off


class EngineOverloaded(RuntimeError):
    """Raised at submit time when the engine's admission queue is full.

    The reference had no admission control at all — uvicorn simply queued
    requests without bound (api_cache.py:186). A production server must
    shed load instead: the HTTP layer maps this to 503 + Retry-After so
    clients back off while in-flight rows keep their latency."""


def _sample_rows(rngs, logits, temps, top_k, mask_value, greedy,
                 top_p=1.0, top_ps=None, min_ps=None, counts=None,
                 rep_ps=None, freq_ps=None, pres_ps=None):
    """Per-row key AND per-row temperature (rows are independent requests).
    Bit-matches decode/ragged.py's _sample_per_row for equal temperature.
    ``top_ps``/``min_ps`` ([B] traced, per-row mode) override the
    engine-wide ``top_p``; rows at 1.0/0.0 are exact no-ops (the filters
    select per row), preserving the bit-match-solo contract for
    unfiltered requests. ``counts`` + per-row penalty values ([B]) apply
    the anti-repetition transforms first (elementwise per row, so
    applying on the batch == per-row); neutral rows are bit-exact
    no-ops too."""
    if counts is not None:
        logits = apply_penalties(logits, counts, rep_ps[:, None],
                                 freq_ps[:, None], pres_ps[:, None],
                                 enabled=True)
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if top_ps is not None:
        return jax.vmap(
            lambda k, lg, t, pp, mp: sample_token(
                k, lg[None], t, top_k, mask_value, greedy, top_p=pp,
                use_top_p=True, min_p=mp, use_min_p=True)[0]
        )(rngs, logits, temps, top_ps,
          min_ps if min_ps is not None else jnp.zeros_like(top_ps))
    return jax.vmap(
        lambda k, lg, t: sample_token(k, lg[None], t, top_k, mask_value,
                                      greedy, top_p=top_p)[0]
    )(rngs, logits, temps)


def _medusa_dist(logits, temp, top_k, greedy, top_p, min_p,
                 use_top_p, use_min_p):
    """speculative._dist with TRACED filter values (static use flags):
    bit-identical outputs to solo medusa's _dist for matching on/off
    configuration — the engine keeps per-row temp/top_p/min_p traced so
    every request shares one compiled chunk program."""
    if greedy:
        return jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1])
    masked = apply_top_k(logits / temp, top_k)
    masked = apply_top_p(masked, top_p, enabled=use_top_p)
    masked = apply_min_p(masked, min_p, enabled=use_min_p)
    return jax.nn.softmax(masked, axis=-1)


def init_state(cfg, slots: int, max_len: int,
               per_row_sampling: bool = False,
               no_repeat_ngram: int = 0, grammar: bool = False,
               medusa: bool = False):
    """Device-resident engine state; free slots start done with no budget.
    Per-row-sampling mode additionally carries the anti-repetition state:
    occurrence counts ([slots, V]) and per-row penalty values — gated on
    the mode so the default engine program is unchanged. An engine with
    ``no_repeat_ngram`` != 0 carries a per-row on/off bit (the ban size n
    itself is compiled into the chunk program); a grammar-enabled engine
    likewise carries per-row FSM states + an on/off bit."""
    state = {
        "cache": init_ragged_cache(cfg, slots, max_len),
        "buf": jnp.zeros((slots, max_len), jnp.int32),
        "pos": jnp.zeros((slots,), jnp.int32),
        "last": jnp.zeros((slots,), jnp.int32),
        "done": jnp.ones((slots,), bool),
        "rngs": jnp.zeros((slots, 2), jnp.uint32),
        "row_max": jnp.zeros((slots,), jnp.int32),
        "temps": jnp.ones((slots,), jnp.float32),
        "top_ps": jnp.ones((slots,), jnp.float32),
        "min_ps": jnp.zeros((slots,), jnp.float32),
    }
    if per_row_sampling:
        state["counts"] = jnp.zeros((slots, cfg.vocab_size), jnp.float32)
        state["rep_ps"] = jnp.ones((slots,), jnp.float32)
        state["freq_ps"] = jnp.zeros((slots,), jnp.float32)
        state["pres_ps"] = jnp.zeros((slots,), jnp.float32)
    if no_repeat_ngram:
        state["ngram_on"] = jnp.zeros((slots,), bool)
    if grammar:
        state["gstate"] = jnp.zeros((slots,), jnp.int32)
        state["gram_on"] = jnp.zeros((slots,), bool)
    if medusa:
        # per-row medusa mode: the last verified token's hidden state
        # (head-proposal input; zeros at admission = solo h0 contract)
        # and the per-row medusa bit. Keys gate the medusa chunk paths
        # structurally (trace-time `"med_on" in state`).
        state["h_last"] = jnp.zeros((slots, cfg.d_model), cfg.jnp_dtype)
        state["med_on"] = jnp.zeros((slots,), bool)
    return state


@partial(jax.jit, static_argnames=("cfg", "top_k", "greedy", "mask_value",
                                   "eos_id", "pad_id", "top_p",
                                   "per_row_sampling", "no_repeat_ngram",
                                   "use_grammar", "medusa_row"))
def admit_row(params, state, prompt, plen, slot, key, rmax, temp,
              cfg, top_k=50, greedy=False, mask_value=-1e10,
              eos_id=-1, pad_id=0, top_p=1.0, row_top_p=1.0,
              per_row_sampling=False, row_min_p=0.0,
              row_penalties=_NEUTRAL_PEN, no_repeat_ngram=0,
              row_ngram_on=False, grammar=None, use_grammar=False,
              row_gram_on=False, medusa_row=False):
    """Prefill ONE request into slot ``slot`` of the running state.

    prompt: [1, P] (P = host-side power-of-two bucket, so admissions reuse
    a handful of compiled programs). Reproduces generate_kv_ragged's
    startup exactly: split key once, sample the first token from the
    prefill logits, write it at position plen. ``medusa_row`` (static)
    instead mirrors decode/medusa._medusa_init's startup bit-exactly:
    the same single key split, but the first token drawn via the
    _dist-form categorical (solo medusa's op sequence) and the row's
    proposal hidden state zeroed (solo h0 contract)."""
    max_len = state["buf"].shape[1]
    row_cache = init_ragged_cache(cfg, 1, prompt.shape[1])
    logits0, row_cache = prefill_ragged(params, prompt, plen[None], cfg,
                                        row_cache)

    cache = state["cache"]
    ks, vs = list(cache["k"]), list(cache["v"])
    zero = jnp.asarray(0, jnp.int32)
    for li in range(cfg.n_layer):
        ks[li] = jax.lax.dynamic_update_slice(
            ks[li], row_cache["k"][li].astype(ks[li].dtype),
            (slot, zero, zero, zero))
        vs[li] = jax.lax.dynamic_update_slice(
            vs[li], row_cache["v"][li].astype(vs[li].dtype),
            (slot, zero, zero, zero))
    lengths = cache["lengths"].at[slot].set(plen)

    key2 = jax.random.split(key)
    rng_next, sub = key2[0], key2[1]
    P = prompt.shape[1]
    onehot = (jnp.arange(P) == plen - 1).astype(logits0.dtype)[None]
    last_logits = jnp.einsum("bpv,bp->bv", logits0, onehot)
    if no_repeat_ngram:
        last_logits = apply_no_repeat_ngram(
            last_logits, prompt.astype(jnp.int32), plen, no_repeat_ngram,
            mask_value, row_on=jnp.asarray(row_ngram_on, bool)[None])
    if use_grammar:
        gs_row = scan_prompt_state(grammar, prompt, plen)        # [1]
        gram_on = jnp.asarray(row_gram_on, bool)[None]
        last_logits = grammar_mask(last_logits, gs_row, grammar,
                                   budget_left=(rmax - plen)[None],
                                   row_on=gram_on)
    rep_p, freq_p, pres_p = (jnp.asarray(v, jnp.float32)
                             for v in row_penalties)
    row_counts = token_counts(
        prompt, jnp.arange(P)[None, :] < plen,
        cfg.vocab_size) if per_row_sampling else None   # [1, V]
    if medusa_row:
        # solo medusa's first-token ops (decode/medusa._medusa_init):
        # _dist over the last prefill logits, then categorical on
        # log(dist + 1e-30) — NOT sample_token's gumbel-on-logits form
        # (different float values flip near-ties; parity demands the
        # exact op sequence)
        tp = (jnp.asarray(row_top_p, jnp.float32) if per_row_sampling
              else jnp.asarray(top_p, jnp.float32))
        mp = (jnp.asarray(row_min_p, jnp.float32) if per_row_sampling
              else jnp.asarray(0.0, jnp.float32))
        use_tp = True if per_row_sampling else float(top_p) < 1.0
        first_dist = _medusa_dist(last_logits, temp, top_k, greedy,
                                  tp, mp, use_tp, per_row_sampling)[0]
        first = jnp.argmax(first_dist).astype(jnp.int32) if greedy else \
            jax.random.categorical(
                sub, jnp.log(first_dist + 1e-30)).astype(jnp.int32)
    else:
        first = _sample_rows(
            sub[None], last_logits, temp[None], top_k, mask_value, greedy,
            top_p,
            jnp.asarray(row_top_p, jnp.float32)[None] if per_row_sampling
            else None,
            jnp.asarray(row_min_p, jnp.float32)[None] if per_row_sampling
            else None,
            row_counts, rep_p[None] if per_row_sampling else None,
            freq_p[None] if per_row_sampling else None,
            pres_p[None] if per_row_sampling else None)[0]

    # buffer row: prompt, then (when a slot remains) the first token
    active0 = plen < rmax
    row = jnp.full((max_len,), pad_id, jnp.int32)
    row = jax.lax.dynamic_update_slice(row, prompt[0].astype(jnp.int32),
                                       (zero,))
    row = jnp.where(jnp.arange(max_len) < plen, row, pad_id)
    wpos = jnp.minimum(plen, max_len - 1)
    row = jax.lax.dynamic_update_slice(
        row, jnp.where(active0, first, row[wpos])[None], (wpos,))

    new = {
        "cache": {"k": tuple(ks), "v": tuple(vs), "lengths": lengths},
        "buf": jax.lax.dynamic_update_slice(state["buf"], row[None],
                                            (slot, zero)),
        "pos": state["pos"].at[slot].set(
            jnp.where(active0, plen + 1, plen)),
        "last": state["last"].at[slot].set(first),
        "done": state["done"].at[slot].set((first == eos_id) | ~active0),
        "rngs": state["rngs"].at[slot].set(rng_next),
        "row_max": state["row_max"].at[slot].set(rmax),
        "temps": state["temps"].at[slot].set(temp),
        "top_ps": state["top_ps"].at[slot].set(
            jnp.asarray(row_top_p, jnp.float32)),
        "min_ps": state["min_ps"].at[slot].set(
            jnp.asarray(row_min_p, jnp.float32)),
    }
    if per_row_sampling:
        # prompt occurrences + the first sampled token (when written);
        # matches generate_kv_ragged's startup counts exactly
        row_c = row_counts[0] + (
            (first == jnp.arange(cfg.vocab_size)) & active0).astype(
            jnp.float32)
        new["counts"] = state["counts"].at[slot].set(row_c)
        new["rep_ps"] = state["rep_ps"].at[slot].set(rep_p)
        new["freq_ps"] = state["freq_ps"].at[slot].set(freq_p)
        new["pres_ps"] = state["pres_ps"].at[slot].set(pres_p)
    if no_repeat_ngram:
        new["ngram_on"] = state["ngram_on"].at[slot].set(
            jnp.asarray(row_ngram_on, bool))
    if use_grammar:
        gs_next = grammar_step(gs_row, first[None], grammar,
                               active=active0[None])[0]
        new["gstate"] = state["gstate"].at[slot].set(gs_next)
        new["gram_on"] = state["gram_on"].at[slot].set(
            jnp.asarray(row_gram_on, bool))
    if "med_on" in state:
        new["h_last"] = state["h_last"].at[slot].set(
            jnp.zeros((cfg.d_model,), cfg.jnp_dtype))
        new["med_on"] = state["med_on"].at[slot].set(bool(medusa_row))
    return new


@partial(jax.jit, static_argnames=("cfg", "chunk", "top_k", "greedy",
                                   "mask_value", "eos_id", "pad_id",
                                   "top_p", "per_row_sampling",
                                   "no_repeat_ngram", "use_grammar"))
def ragged_chunk(params, state, cfg, chunk=64, top_k=50, greedy=False,
                 mask_value=-1e10, eos_id=-1, pad_id=0, top_p=1.0,
                 per_row_sampling=False, no_repeat_ngram=0,
                 grammar=None, use_grammar=False):
    """Advance every live row ``chunk`` steps (done/free rows are inert).
    Same per-step math as generate_kv_ragged's while_loop body."""
    max_len = state["buf"].shape[1]

    cols = jnp.arange(max_len)[None, :]

    def body(carry, _):
        if per_row_sampling:
            (buf, pos, last, done, rngs, cache, row_max, temps,
             counts) = carry[:9]
        else:
            buf, pos, last, done, rngs, cache, row_max, temps = carry[:8]
            counts = None
        gstate = carry[-1] if use_grammar else None
        keys = _split_rows(rngs)
        rngs, subs = keys[:, 0], keys[:, 1]
        logits, new_cache = decode_step_ragged(params, last, cache, cfg)
        if no_repeat_ngram:
            logits = apply_no_repeat_ngram(logits, buf, pos,
                                           no_repeat_ngram, mask_value,
                                           row_on=state["ngram_on"])
        if use_grammar:
            logits = grammar_mask(logits, gstate, grammar,
                                  budget_left=row_max - pos,
                                  row_on=state["gram_on"])
        nxt = _sample_rows(subs, logits, temps, top_k, mask_value, greedy,
                           top_p,
                           state["top_ps"] if per_row_sampling else None,
                           state["min_ps"] if per_row_sampling else None,
                           counts,
                           state["rep_ps"] if per_row_sampling else None,
                           state["freq_ps"] if per_row_sampling else None,
                           state["pres_ps"] if per_row_sampling else None)
        active = ~(done | (pos >= row_max))
        write = jnp.where(active, nxt, pad_id).astype(jnp.int32)
        # masked one-hot write (identical values to a per-row
        # dynamic_update_slice; the vmapped-scatter form compiles 2-3x
        # slower on this backend's remote-compile helper — measured 155 s
        # vs 240-500 s fresh for the whole chunk program)
        hit = (cols == pos[:, None]) & active[:, None]
        buf = jnp.where(hit, write[:, None], buf)
        cache = {"k": new_cache["k"], "v": new_cache["v"],
                 "lengths": jnp.where(active, new_cache["lengths"],
                                      cache["lengths"])}
        pos = jnp.where(active, pos + 1, pos)
        done = done | (active & (nxt == eos_id)) | (pos >= row_max)
        last = jnp.where(active, nxt, last)
        out = (buf, pos, last, done, rngs, cache, row_max, temps)
        if per_row_sampling:
            counts = counts + ((nxt[:, None] == jnp.arange(
                cfg.vocab_size)[None, :]) & active[:, None]).astype(
                jnp.float32)
            out = out + (counts,)
        if use_grammar:
            out = out + (grammar_step(gstate, nxt, grammar, active=active),)
        return out, None

    carry0 = (state["buf"], state["pos"], state["last"], state["done"],
              state["rngs"], state["cache"], state["row_max"],
              state["temps"])
    if per_row_sampling:
        carry0 = carry0 + (state["counts"],)
    if use_grammar:
        carry0 = carry0 + (state["gstate"],)
    carry, _ = jax.lax.scan(body, carry0, None, length=chunk)
    buf, pos, last, done, rngs, cache, row_max, temps = carry[:8]
    new_state = {"cache": cache, "buf": buf, "pos": pos, "last": last,
                 "done": done, "rngs": rngs, "row_max": row_max,
                 "temps": temps, "top_ps": state["top_ps"],
                 "min_ps": state["min_ps"]}
    if per_row_sampling:
        new_state["counts"] = carry[8]
        new_state["rep_ps"] = state["rep_ps"]
        new_state["freq_ps"] = state["freq_ps"]
        new_state["pres_ps"] = state["pres_ps"]
    if no_repeat_ngram:
        new_state["ngram_on"] = state["ngram_on"]
    if use_grammar:
        new_state["gstate"] = carry[-1]
        new_state["gram_on"] = state["gram_on"]
    if "med_on" in state:
        # medusa-enabled engine running a plain chunk (no live medusa
        # rows): h_last is only read by medusa rows, which the worker
        # never routes here — pass through untouched
        new_state["h_last"] = state["h_last"]
        new_state["med_on"] = state["med_on"]
    return new_state


@partial(jax.jit, static_argnames=("cfg", "chunk", "gamma", "top_k",
                                   "greedy", "mask_value", "eos_id",
                                   "pad_id", "top_p", "per_row_sampling",
                                   "no_repeat_ngram", "use_grammar"))
def medusa_chunk(params, hw, hb, state, cfg, chunk=16, gamma=4,
                 top_k=50, greedy=False, mask_value=-1e10, eos_id=-1,
                 pad_id=0, top_p=1.0, per_row_sampling=False,
                 no_repeat_ngram=0, grammar=None, use_grammar=False):
    """Advance every live row ``chunk`` VERIFY steps with per-row medusa
    (VERDICT r3 #3: speculation that survives concurrency).

    Rows with ``med_on`` run decode/medusa._make_medusa_body's math
    vmapped over the shared ragged cache: gamma head proposals from the
    row's carried hidden state, one ragged block verify
    (decode_block_ragged), per-row Leviathan acceptance, multi-token
    masked buffer writes, and the cache-length rewind to the accepted
    prefix. Rows WITHOUT it follow the plain chunk's exact op sequence
    (same single key split per step, same _sample_rows call) on the
    block's first-query logits, so plain rows keep the bit-match-solo
    contract inside a medusa chunk; medusa rows bit-match their solo
    generate_medusa stream (same per-row rng op sequence — one split
    per step greedy, two sampled). The premium: every row pays the
    (gamma+1)-query block step; the worker therefore dispatches this
    program only while a live medusa row exists."""
    max_len = state["buf"].shape[1]
    cols = jnp.arange(max_len)[None, :]
    med = state["med_on"]
    idxw = jnp.arange(gamma + 1)[None, :]               # [1, g+1]
    use_tp_static = True if per_row_sampling else float(top_p) < 1.0

    def body(carry, _):
        if per_row_sampling:
            (buf, pos, last, done, rngs, cache, row_max, temps,
             h_last, counts) = carry[:10]
        else:
            (buf, pos, last, done, rngs, cache, row_max, temps,
             h_last) = carry[:9]
            counts = None
        gstate = carry[-1] if use_grammar else None
        B = last.shape[0]
        active = ~(done | (pos >= row_max))

        # ---- shared first split (solo medusa's sub_d == plain's subs)
        keys = _split_rows(rngs)
        rng1, sub1 = keys[:, 0], keys[:, 1]

        # ---- gamma head proposals from the carried hidden state ------
        hk = h_last[:, None, :] + jax.nn.silu(
            jnp.einsum("gde,be->bgd", hw, h_last) + hb[None])
        head_lg = (hk.astype(jnp.float32) @ params["head"]["w"].T
                   + params["head"]["b"])               # [B, g, V]
        tp = state["top_ps"] if per_row_sampling else \
            jnp.full((B,), top_p, jnp.float32)
        mp = state["min_ps"] if per_row_sampling else \
            jnp.zeros((B,), jnp.float32)
        if greedy:
            d = jnp.argmax(head_lg, -1).astype(jnp.int32)   # [B, g]
            q = None
        else:
            q = jax.vmap(lambda lg, t, p_, m_: _medusa_dist(
                lg, t, top_k, greedy, p_, m_, use_tp_static,
                per_row_sampling))(head_lg, temps, tp, mp)  # [B, g, V]
            d = jax.vmap(lambda k, qq: jax.random.categorical(
                k, jnp.log(qq + 1e-30), axis=-1))(sub1, q).astype(
                jnp.int32)

        # ---- one ragged block verify over the shared cache ------------
        block = jnp.concatenate([last[:, None], d], axis=1)  # [B, g+1]
        logits_t, h_block, newc = decode_block_ragged(params, block,
                                                      cache, cfg)

        # ---- plain rows: the plain chunk's exact sampling path --------
        plain_logits = logits_t[:, 0]
        if no_repeat_ngram:
            plain_logits = apply_no_repeat_ngram(
                plain_logits, buf, pos, no_repeat_ngram, mask_value,
                row_on=state["ngram_on"])
        if use_grammar:
            plain_logits = grammar_mask(plain_logits, gstate, grammar,
                                        budget_left=row_max - pos,
                                        row_on=state["gram_on"])
        nxt_plain = _sample_rows(
            sub1, plain_logits, temps, top_k, mask_value, greedy, top_p,
            state["top_ps"] if per_row_sampling else None,
            state["min_ps"] if per_row_sampling else None,
            counts,
            state["rep_ps"] if per_row_sampling else None,
            state["freq_ps"] if per_row_sampling else None,
            state["pres_ps"] if per_row_sampling else None)

        # ---- medusa rows: per-row Leviathan acceptance ----------------
        if greedy:
            t_all = jnp.argmax(logits_t, -1).astype(jnp.int32)  # [B,g+1]
            acc = d == t_all[:, :gamma]
            n = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), 1)
            t_new = jnp.sum(t_all * jax.nn.one_hot(
                n, gamma + 1, dtype=jnp.int32), axis=1)
            rng_med = rng1           # greedy consumes only the one split
        else:
            p = jax.vmap(lambda lg, t, p_, m_: _medusa_dist(
                lg, t, top_k, greedy, p_, m_, use_tp_static,
                per_row_sampling))(logits_t, temps, tp, mp)  # [B,g+1,V]
            keys3 = jax.vmap(lambda k: jax.random.split(k, 3))(rng1)
            rng2, sub_u, sub_r = keys3[:, 0], keys3[:, 1], keys3[:, 2]
            onehot_d = jax.nn.one_hot(d, cfg.vocab_size)
            p_d = jnp.sum(p[:, :gamma] * onehot_d, -1)       # [B, g]
            q_d = jnp.sum(q * onehot_d, -1)
            u = jax.vmap(lambda k: jax.random.uniform(k, (gamma,)))(sub_u)
            acc = u < jnp.minimum(1.0, p_d / jnp.maximum(q_d, 1e-30))
            n = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), 1)
            sel_n = jax.nn.one_hot(n, gamma + 1)             # [B, g+1]
            p_n = jnp.einsum("bw,bwv->bv", sel_n, p)
            sel_q = jax.nn.one_hot(jnp.minimum(n, gamma - 1), gamma)
            q_n = jnp.where((n < gamma)[:, None],
                            jnp.einsum("bw,bwv->bv", sel_q, q), 0.0)
            residual = jnp.maximum(p_n - q_n, 0.0)
            rsum = jnp.sum(residual, -1, keepdims=True)
            residual = jnp.where(rsum > 1e-12,
                                 residual / jnp.maximum(rsum, 1e-30), p_n)
            t_new = jax.vmap(lambda k, r: jax.random.categorical(
                k, jnp.log(r + 1e-30)))(sub_r, residual).astype(jnp.int32)
            rng_med = rng2

        # ---- per-row window of emitted tokens -------------------------
        d_ext = jnp.concatenate([d, d[:, -1:]], axis=1)      # [B, g+1]
        win_med = jnp.where(
            idxw < n[:, None], d_ext,
            jnp.where(idxw == n[:, None], t_new[:, None],
                      pad_id)).astype(jnp.int32)
        big = gamma + 2
        e = jnp.min(jnp.where((win_med == eos_id) & (idxw <= n[:, None]),
                              idxw, big), axis=1)
        limit_med = jnp.minimum(n + 1, e + 1)
        window = jnp.where(med[:, None], win_med,
                           jnp.where(idxw == 0, nxt_plain[:, None],
                                     pad_id)).astype(jnp.int32)
        limit = jnp.where(med, limit_med, 1)
        done_step = jnp.where(med, e <= n, nxt_plain == eos_id)
        limit = jnp.where(active, limit, 0)
        # budget-clamped writes (solo clamps its output buffer instead)
        wlimit = jnp.clip(jnp.minimum(limit, row_max - pos), 0,
                          gamma + 1)

        offs = cols - pos[:, None]                           # [B, M]
        hit = (offs >= 0) & (offs < wlimit[:, None])
        sel3 = offs[:, :, None] == idxw[:, None, :]          # [B, M, g+1]
        take = jnp.sum(jnp.where(sel3, window[:, None, :], 0), -1)
        buf = jnp.where(hit, take, buf)

        lsel = jax.nn.one_hot(limit - 1, gamma + 1,
                              dtype=jnp.int32)               # [B, g+1]
        last_new = jnp.sum(window * lsel, axis=1)
        h_new = jnp.einsum("bw,bwd->bd", lsel.astype(h_block.dtype),
                           h_block)
        new_pos = pos + wlimit
        # wlimit = min(limit, row_max - pos), so new_pos >= row_max
        # exactly when the unclamped pos + limit crosses the budget —
        # the same done condition as the plain chunk and solo medusa
        done = done | (active & done_step) | (new_pos >= row_max)
        last = jnp.where(active, last_new, last)
        h_last = jnp.where((active & med)[:, None], h_new, h_last)
        rngs = jnp.where(med[:, None], rng_med, rng1)
        cache = {"k": newc["k"], "v": newc["v"],
                 "lengths": jnp.where(active, new_pos - 1,
                                      cache["lengths"])}
        pos = new_pos
        out = (buf, pos, last, done, rngs, cache, row_max, temps, h_last)
        if per_row_sampling:
            counts = counts + (
                (nxt_plain[:, None] == jnp.arange(cfg.vocab_size)[None])
                & (active & ~med)[:, None]).astype(jnp.float32)
            out = out + (counts,)
        if use_grammar:
            out = out + (grammar_step(gstate, nxt_plain, grammar,
                                      active=active & ~med),)
        return out, None

    carry0 = (state["buf"], state["pos"], state["last"], state["done"],
              state["rngs"], state["cache"], state["row_max"],
              state["temps"], state["h_last"])
    if per_row_sampling:
        carry0 = carry0 + (state["counts"],)
    if use_grammar:
        carry0 = carry0 + (state["gstate"],)
    carry, _ = jax.lax.scan(body, carry0, None, length=chunk)
    (buf, pos, last, done, rngs, cache, row_max, temps,
     h_last) = carry[:9]
    new_state = {"cache": cache, "buf": buf, "pos": pos, "last": last,
                 "done": done, "rngs": rngs, "row_max": row_max,
                 "temps": temps, "top_ps": state["top_ps"],
                 "min_ps": state["min_ps"], "h_last": h_last,
                 "med_on": state["med_on"]}
    if per_row_sampling:
        new_state["counts"] = carry[9]
        new_state["rep_ps"] = state["rep_ps"]
        new_state["freq_ps"] = state["freq_ps"]
        new_state["pres_ps"] = state["pres_ps"]
    if no_repeat_ngram:
        new_state["ngram_on"] = state["ngram_on"]
    if use_grammar:
        new_state["gstate"] = carry[-1]
        new_state["gram_on"] = state["gram_on"]
    return new_state


@jax.jit
def _pack_snapshot(state):
    """Pack everything the harvest reads into ONE array — [slots,
    max_len+2]: token buffer, then pos, then done. The tunnel charges a
    ~25 ms fixed RPC per host fetch regardless of size, and a chunk's
    device time is comparable (~20 ms at flagship batch 8), so fetching
    buf/pos/done separately made the HOST the engine's throughput bound;
    one packed fetch per chunk removes two of the three RPCs."""
    return jnp.concatenate(
        [state["buf"], state["pos"][:, None],
         state["done"][:, None].astype(jnp.int32)], axis=1)


@dataclass
class _Pending:
    prompt_ids: list
    temperature: float
    seed: int
    max_len: int
    submitted: float
    top_p: float = 1.0
    min_p: float = 0.0
    penalties: tuple = _NEUTRAL_PEN   # (repetition, frequency, presence)
    ngram: int = 0               # no_repeat_ngram_size (0 = off)
    grammar: bool = False        # FSM-constrained decoding for this row
    medusa: bool = False         # per-row multi-token medusa decoding
    admit_seq: int = -1          # chunks dispatched when the row joined
    started: float | None = None
    finished: float | None = None
    event: threading.Event = field(default_factory=threading.Event)
    result: list | None = None
    error: Exception | None = None
    # streaming consumers get ("tokens", delta)/("done", result)/
    # ("error", exc) items; emitted = buffer positions already delivered
    stream_q: queue.Queue | None = None
    emitted: int = 0
    # set by the client thread (stream closed / submit timed out); the
    # worker frees the slot at the next chunk boundary
    cancelled: bool = False


class ContinuousBatcher:
    """Persistent decode engine with slot admission.

    top_k/top_p/greedy are engine-wide (compiled into the chunk program);
    temperature and seed are per-request. Requests longer than the engine's
    max_len budget return the prompt unchanged (reference semantics,
    api_cache.py:166)."""

    def __init__(self, generator: Generator, slots: int = 8,
                 chunk: int = 64, max_len: int | None = None,
                 top_k: int = 50, greedy: bool = False,
                 mask_value: float = -1e10, max_queue: int = 256,
                 top_p: float = 1.0, per_row_sampling: bool = False,
                 no_repeat_ngram: int = 0, grammar=None,
                 medusa_heads: dict | None = None):
        # per_row_sampling compiles per-row top-p AND min-p filtering into
        # the chunk program; rows at the neutral values (1.0 / 0.0) are
        # exact no-ops, so unfiltered requests still bit-match solo runs
        assert generator.cfg.causal and not generator.cfg.pos_broadcast_bug,\
            "continuous batching requires the corrected causal config"
        self.gen = generator
        self.slots = slots
        self.chunk = chunk
        self.top_k, self.greedy, self.mask_value = top_k, greedy, mask_value
        self.top_p = float(top_p)
        self.per_row_sampling = bool(per_row_sampling)
        # engine-wide ban size n compiled into the chunk program; rows
        # carry a traced on/off bit, so ngram and plain requests share
        # the decode (plain rows stay bit-exact)
        self.no_repeat_ngram = int(no_repeat_ngram or 0)
        # FSM grammar (decode/grammar.py): the TABLE is engine-wide (one
        # scheme per served model); each row carries a traced on/off bit,
        # so constrained and plain requests share the chunk program and
        # plain rows stay bit-exact
        self.use_grammar = grammar is not None
        self._garr = (grammar.arrays() if isinstance(grammar, Grammar)
                      else grammar) if self.use_grammar \
            else _grammar_placeholder()
        self.max_len = min(max_len or generator.cfg.seq_len,
                           generator.max_supported_len())
        # per-row medusa (VERDICT r3 #3): heads stacked once; the worker
        # dispatches the medusa chunk program only while a live medusa
        # row exists, so pure-plain traffic never pays the block-verify
        # premium. Medusa needs pos-table headroom for the block
        # overshoot (solo generate_medusa's assert), so the engine
        # budget shrinks by gamma when heads are installed.
        self.medusa = medusa_heads is not None
        if self.medusa:
            from ..decode.medusa import _stack_heads

            self._hw, self._hb = _stack_heads(medusa_heads)
            self.gamma = int(self._hw.shape[0])
            self.max_len = min(self.max_len,
                               generator.cfg.n_pos - self.gamma)
            # a verify step emits up to gamma+1 tokens; keep harvest
            # cadence roughly one plain chunk's worth of tokens
            self.chunk_med = max(4, chunk // (1 + self.gamma // 2))
        # admission control: requests queued beyond the live slots; 0 =
        # unbounded (benchmarks that deliberately flood the engine)
        self.max_queue = max_queue
        self.state = init_state(generator.cfg, slots, self.max_len,
                                per_row_sampling=self.per_row_sampling,
                                no_repeat_ngram=self.no_repeat_ngram,
                                grammar=self.use_grammar,
                                medusa=self.medusa)
        self._q: queue.Queue = queue.Queue()
        self._cancels: queue.Queue = queue.Queue()
        self._live: dict[int, _Pending] = {}
        self._free = list(range(slots))
        # host-side mirror of which live slots run medusa (avoids a
        # device fetch per cycle when picking the chunk program)
        self._med_slots: set[int] = set()
        self._busy = False   # worker between dequeue and _live insertion
        from collections import deque

        # bounded: a long-running server must not grow per-request state
        self.stats = {"chunks": 0, "admitted": 0, "served": 0,
                      "cancelled": 0, "rejected": 0,
                      "join_delay_ms": deque(maxlen=4096)}
        self._stop = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- client

    def accepts(self, top_k: int | None = None,
                greedy: bool | None = None,
                top_p: float | None = None,
                min_p: float | None = None,
                penalties: tuple | None = None,
                no_repeat_ngram: int | None = None,
                grammar: bool = False, medusa: bool = False) -> bool:
        """Whether a request's sampling params match the compiled engine
        (top_k/greedy are engine-wide; top_p/min_p/penalties are
        engine-wide unless the engine runs per-row sampling mode; a
        nonzero no_repeat_ngram must equal the engine's compiled ban
        size; a grammar request needs a grammar-enabled engine; callers
        fall back to a solo decode on mismatch instead of erroring)."""
        return ((top_k is None or top_k == self.top_k)
                and (greedy is None or greedy == self.greedy)
                and (self.per_row_sampling or top_p is None
                     or float(top_p) == self.top_p)
                and (self.per_row_sampling or min_p is None
                     or float(min_p) == 0.0)
                and (self.per_row_sampling or penalties is None
                     or tuple(float(v) for v in penalties) == _NEUTRAL_PEN)
                and (not no_repeat_ngram
                     or int(no_repeat_ngram) == self.no_repeat_ngram)
                and (not grammar or self.use_grammar)
                and (not medusa or self.medusa))

    def idle(self) -> bool:
        """True when the engine has no live or queued work. A batch-1
        request joining an empty engine pays the per-chunk packed
        harvest RPCs alone (~25 ms x n_chunks on the tunnel — measured
        2-3x the solo compiled decode for a ~500-token song), so the
        pipeline serves lone requests solo and routes them here only
        when concurrency exists (round-5 adaptive routing; outputs are
        bit-identical either way, pinned by the engine parity tests)."""
        return not self._live and self._q.empty() and not self._busy

    def _validate_params(self, top_k, greedy, top_p, min_p, penalties,
                         no_repeat_ngram=0, grammar=False, medusa=False):
        if grammar and not self.use_grammar:
            raise ValueError(
                "engine was built without a grammar table; construct "
                "ContinuousBatcher(grammar=...) for constrained requests")
        if medusa:
            if not self.medusa:
                raise ValueError(
                    "engine was built without medusa heads; construct "
                    "ContinuousBatcher(medusa_heads=...) for medusa "
                    "requests")
            # same exclusions as the solo medusa path (history-dependent
            # logit transforms break the acceptance math)
            pen = (tuple(float(v) for v in penalties)
                   if penalties is not None else _NEUTRAL_PEN)
            if pen != _NEUTRAL_PEN or no_repeat_ngram or grammar:
                raise ValueError(
                    "medusa rows reject penalties / no_repeat_ngram / "
                    "grammar (serve/pipeline.py contract)")
        if top_k is not None and top_k != self.top_k:
            raise ValueError(
                f"engine compiled for top_k={self.top_k}, got {top_k}")
        if greedy is not None and greedy != self.greedy:
            raise ValueError(
                f"engine compiled for greedy={self.greedy}, got {greedy}")
        if top_p is not None and not self.per_row_sampling \
                and float(top_p) != self.top_p:
            raise ValueError(
                f"engine compiled for top_p={self.top_p}, got {top_p}")
        if min_p and not self.per_row_sampling:
            raise ValueError(
                "engine needs per_row_sampling mode for min_p requests")
        pen = (tuple(float(v) for v in penalties)
               if penalties is not None else _NEUTRAL_PEN)
        if pen != _NEUTRAL_PEN and not self.per_row_sampling:
            raise ValueError(
                "engine needs per_row_sampling mode for penalty requests")
        if no_repeat_ngram and int(no_repeat_ngram) != self.no_repeat_ngram:
            raise ValueError(
                f"engine compiled for no_repeat_ngram="
                f"{self.no_repeat_ngram}, got {no_repeat_ngram}")
        return pen

    def submit(self, prompt_ids: list[int], temperature: float = 1.0,
               seed: int | None = None, max_len: int | None = None,
               timeout: float = 600.0, top_k: int | None = None,
               greedy: bool | None = None,
               top_p: float | None = None,
               min_p: float | None = None,
               penalties: tuple | None = None,
               no_repeat_ngram: int = 0, grammar: bool = False,
               medusa: bool = False) -> list:
        pen = self._validate_params(top_k, greedy, top_p, min_p, penalties,
                                    no_repeat_ngram, grammar, medusa)
        ml = int(min(max_len or self.max_len, self.max_len))
        if len(prompt_ids) >= ml:
            return list(prompt_ids)  # zero generation steps (reference)
        req = _Pending(list(prompt_ids), float(temperature),
                       int(seed) if seed is not None
                       else int(time.time_ns() % 2**31), ml,
                       submitted=time.monotonic(),
                       top_p=float(top_p) if top_p is not None else 1.0,
                       min_p=float(min_p) if min_p is not None else 0.0,
                       penalties=pen,
                       ngram=int(no_repeat_ngram or 0),
                       grammar=bool(grammar), medusa=bool(medusa))
        self._enqueue(req)
        if not req.event.wait(timeout):
            self._request_cancel(req)  # free the slot; nobody is waiting
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def submit_stream(self, prompt_ids: list[int], temperature: float = 1.0,
                      seed: int | None = None, max_len: int | None = None,
                      timeout: float = 600.0, top_k: int | None = None,
                      greedy: bool | None = None,
                      top_p: float | None = None,
                      min_p: float | None = None,
                      penalties: tuple | None = None,
                      no_repeat_ngram: int = 0, grammar: bool = False,
                      medusa: bool = False):
        """Generator yielding lists of newly generated token ids as the
        engine's chunks complete — the streaming twin of :meth:`submit`.

        The concatenated deltas equal ``submit()``'s result minus the
        prompt echo, bit-identically (same per-row PRNG contract; tokens
        surface one harvest — at most two chunks — after they are
        generated). Over-length prompts stream zero deltas (reference
        zero-steps semantics, api_cache.py:166). ``timeout`` bounds the
        wait for EACH delta, not the whole generation.

        Validation and enqueue happen EAGERLY at call time (submit()'s
        contract) — mismatched sampling params raise here, and the
        request joins the decode whether or not the returned generator
        is ever pulled; this function just builds the request and
        returns the consuming generator."""
        pen = self._validate_params(top_k, greedy, top_p, min_p, penalties,
                                    no_repeat_ngram, grammar, medusa)
        ml = int(min(max_len or self.max_len, self.max_len))
        if len(prompt_ids) >= ml:
            return iter(())  # zero generation steps
        req = _Pending(list(prompt_ids), float(temperature),
                       int(seed) if seed is not None
                       else int(time.time_ns() % 2**31), ml,
                       submitted=time.monotonic(),
                       top_p=float(top_p) if top_p is not None else 1.0,
                       min_p=float(min_p) if min_p is not None else 0.0,
                       penalties=pen,
                       ngram=int(no_repeat_ngram or 0),
                       grammar=bool(grammar), medusa=bool(medusa))
        req.stream_q = queue.Queue()
        req.emitted = len(prompt_ids)
        self._enqueue(req)
        return self._consume_stream(req, timeout)

    def overloaded(self) -> bool:
        """Cheap admission pre-check (the SSE path must decide before it
        commits to a 200 + event-stream response)."""
        return bool(self.max_queue) and self._q.qsize() >= self.max_queue

    def _enqueue(self, req: _Pending):
        """Admission control: bound the number of not-yet-admitted
        requests. qsize() is approximate under concurrency, but the only
        consumer is the single worker thread, so it never *under*counts
        waiting requests — the bound cannot be silently exceeded by more
        than the handful of racing producers."""
        if self.overloaded():
            self.stats["rejected"] += 1
            raise EngineOverloaded(
                f"engine admission queue full "
                f"({self.max_queue} requests waiting)")
        self._q.put(req)

    def _consume_stream(self, req: "_Pending", timeout: float):
        try:
            while True:
                try:
                    kind, payload = req.stream_q.get(timeout=timeout)
                except queue.Empty:
                    self._request_cancel(req)
                    raise TimeoutError("generation timed out") from None
                if kind == "tokens":
                    yield payload
                elif kind == "done":
                    return
                else:
                    raise payload
        except GeneratorExit:
            # consumer closed the stream (e.g. SSE client disconnected):
            # free the row so queued requests get the slot
            self._request_cancel(req)
            raise

    def _request_cancel(self, req: _Pending):
        """Mark ``req`` cancelled (client thread). The worker frees its
        slot at the next chunk boundary; if the request is still queued,
        admission skips it. No device work is needed: a zombie row decodes
        inertly in its slot (fixed-batch compute) until ``admit_row``
        overwrites every per-slot field on re-admission."""
        req.cancelled = True
        self._cancels.put(req)

    def drain(self, timeout: float = 30.0) -> bool:
        """Graceful shutdown, phase 1: stop the caller from admitting (the
        HTTP layer has already stopped accepting) and wait for queued +
        in-flight rows to finish. Returns True when the engine went idle
        within ``timeout``. Requires three consecutive idle polls: _busy
        covers the dequeue->admit window, and the confirmation polls close
        the instruction-level gap between the worker's q.get() returning
        and _busy going up."""
        deadline = time.monotonic() + timeout
        idle = 0
        while time.monotonic() < deadline:
            if self._q.qsize() == 0 and not self._live and not self._busy:
                idle += 1
                if idle >= 3:
                    return True
            else:
                idle = 0
            time.sleep(0.05)
        return (self._q.qsize() == 0 and not self._live
                and not self._busy)

    def run_detached(self, prompt_ids: list[int],
                     temperature: float = 1.0, seed: int | None = None,
                     max_len: int | None = None, top_p: float = 1.0,
                     min_p: float = 0.0) -> list:
        """One request through the engine's EXACT compiled programs on a
        private state — byte-identical to an engine row on any backend
        (same jitted admit/chunk programs; different programs flip
        near-tie argmaxes on TPU, the §3.6 precision lesson, which is
        why a separate one-shot solo program is NOT equivalent there) —
        but with every chunk dispatched back-to-back and ONE final
        packed fetch instead of a ~25 ms harvest RPC per chunk.

        Used by the pipeline's idle-engine adaptive route. NOT
        thread-safe (the caller holds the pipeline's single-permit solo
        gate); does not touch the worker's live state."""
        # same admission contract as submit(): per-row sampling values
        # on a non-per-row engine must REJECT, not silently no-op
        self._validate_params(None, None, top_p, min_p, None)
        ml = int(min(max_len or self.max_len, self.max_len))
        if len(prompt_ids) >= ml:
            return list(prompt_ids)   # zero generation steps (reference)
        if getattr(self, "_detached_state", None) is None:
            # same geometry/flags as the worker's state => same compiled
            # programs (admission into slot 0 replaces the slot's entire
            # device state, so the private state is reusable; rows 1+
            # stay permanently free/inert)
            self._detached_state = init_state(
                self.gen.cfg, self.slots, self.max_len,
                per_row_sampling=self.per_row_sampling,
                no_repeat_ngram=self.no_repeat_ngram,
                grammar=self.use_grammar, medusa=self.medusa)
        p = len(prompt_ids)
        width = min(_bucket(p), self.max_len)
        prompt = np.full((1, width), self.gen.pad_id, np.int32)
        prompt[0, :p] = prompt_ids
        state = admit_row(
            self.gen.params, self._detached_state, jnp.asarray(prompt),
            jnp.asarray(p, jnp.int32), jnp.asarray(0, jnp.int32),
            jax.random.PRNGKey(int(seed) if seed is not None
                               else int(time.time_ns() % 2**31)),
            jnp.asarray(ml, jnp.int32),
            jnp.asarray(float(temperature), jnp.float32),
            self.gen.cfg, top_k=self.top_k, greedy=self.greedy,
            mask_value=self.mask_value, eos_id=self.gen.eos_id,
            pad_id=self.gen.pad_id, top_p=self.top_p,
            row_top_p=float(top_p),
            per_row_sampling=self.per_row_sampling,
            row_min_p=float(min_p), row_penalties=_NEUTRAL_PEN,
            no_repeat_ngram=self.no_repeat_ngram, row_ngram_on=False,
            grammar=self._garr, use_grammar=self.use_grammar,
            row_gram_on=False, medusa_row=False)
        # upper bound of chunks; a done row is inert in later chunks
        # (tested engine property), so over-dispatching is exact. For
        # LONG budgets (>= 6 chunks) one midpoint done-check (an extra
        # ~25 ms packed fetch) bounds the dead full-batch device time
        # for early-EOS songs at roughly half the budget; short budgets
        # skip it — the flagship serves 4-chunk songs that run
        # near-full-length (median 493/511), where the fetch would be a
        # pure ~25 ms tax (measured serving distribution, BENCHMARKS).
        n_chunks = max(-(-(ml - p - 1) // self.chunk), 0)
        for ci in range(n_chunks):
            state = ragged_chunk(
                self.gen.params, state, self.gen.cfg, chunk=self.chunk,
                top_k=self.top_k, greedy=self.greedy,
                mask_value=self.mask_value, eos_id=self.gen.eos_id,
                pad_id=self.gen.pad_id, top_p=self.top_p,
                per_row_sampling=self.per_row_sampling,
                no_repeat_ngram=self.no_repeat_ngram,
                grammar=self._garr, use_grammar=self.use_grammar)
            if n_chunks >= 6 and ci == n_chunks // 2 - 1:
                if bool(np.asarray(_pack_snapshot(state))[0, -1]):
                    break
        self._detached_state = state
        snap = np.asarray(_pack_snapshot(state))     # ONE host fetch
        pos = int(snap[0, -2])
        return snap[0, :min(pos, ml)].tolist()

    def close(self, timeout: float = 30.0):
        self._stop = True
        self._q.put(None)
        # join: a daemon worker killed mid-jax-call at interpreter exit
        # aborts the process ("FATAL: exception not rethrown")
        self._thread.join(timeout)

    # ------------------------------------------------------------- engine

    def _admit(self, req: _Pending, slot: int):
        p = len(req.prompt_ids)
        width = min(_bucket(p), self.max_len)
        prompt = np.full((1, width), self.gen.pad_id, np.int32)
        prompt[0, :p] = req.prompt_ids
        self.state = admit_row(
            self.gen.params, self.state, jnp.asarray(prompt),
            jnp.asarray(p, jnp.int32), jnp.asarray(slot, jnp.int32),
            jax.random.PRNGKey(req.seed),
            jnp.asarray(req.max_len, jnp.int32),
            jnp.asarray(req.temperature, jnp.float32),
            self.gen.cfg, top_k=self.top_k, greedy=self.greedy,
            mask_value=self.mask_value, eos_id=self.gen.eos_id,
            pad_id=self.gen.pad_id, top_p=self.top_p,
            row_top_p=req.top_p, per_row_sampling=self.per_row_sampling,
            row_min_p=req.min_p, row_penalties=req.penalties,
            no_repeat_ngram=self.no_repeat_ngram,
            row_ngram_on=bool(req.ngram), grammar=self._garr,
            use_grammar=self.use_grammar, row_gram_on=bool(req.grammar),
            medusa_row=bool(req.medusa))
        if req.medusa:
            self._med_slots.add(slot)
        else:
            self._med_slots.discard(slot)
        req.started = time.monotonic()
        req.admit_seq = self.stats["chunks"]
        self._live[slot] = req
        self.stats["admitted"] += 1
        self.stats["join_delay_ms"].append(
            (req.started - req.submitted) * 1000)

    def _harvest(self, snapshot, seq):
        """Fetch a packed snapshot (one RPC, see ``_pack_snapshot``);
        fulfill finished rows. A done row's buffer is immutable afterwards,
        so reading it from any later snapshot is safe — the host frees the
        slot only here. A slot whose occupant was admitted at or after this
        snapshot's dispatch (admit_seq >= seq) is skipped: the snapshot's
        done flag still describes the slot's previous life (free slots read
        done=True)."""
        arr = np.asarray(snapshot)
        buf, pos, done = arr[:, :-2], arr[:, -2], arr[:, -1].astype(bool)
        eligible = [(s, r) for s, r in list(self._live.items())
                    if r.admit_seq < seq]
        finished = [s for s, r in eligible if done[s]]
        streaming = [s for s, r in eligible if r.stream_q is not None]
        if not finished and not streaming:
            return
        # incremental deltas: a row's buffer cells below pos are written
        # exactly once and never rewritten, so reading them from this
        # (older) snapshot is final even while the row keeps decoding
        for slot in streaming:
            req = self._live[slot]
            end = min(int(pos[slot]), req.max_len)
            if end > req.emitted:
                req.stream_q.put(
                    ("tokens", buf[slot, req.emitted:end].tolist()))
                req.emitted = end
        for slot in finished:
            req = self._live.pop(slot)
            req.result = buf[slot, :min(int(pos[slot]),
                                        req.max_len)].tolist()
            req.finished = time.monotonic()
            if req.stream_q is not None:
                req.stream_q.put(("done", req.result))
            req.event.set()
            self._free.append(slot)
            self._med_slots.discard(slot)
            self.stats["served"] += 1

    def _drain_cancels(self):
        """Free the slots of cancelled live rows (worker thread only).
        Popping from ``_live`` is sufficient: harvest acts only on live
        slots, and the next admission into the slot replaces the zombie
        row's entire device state."""
        while True:
            try:
                req = self._cancels.get(block=False)
            except queue.Empty:
                return
            for slot, r in list(self._live.items()):
                if r is req:
                    del self._live[slot]
                    self._free.append(slot)
                    self._med_slots.discard(slot)
                    self.stats["cancelled"] += 1

    def _fail_all(self, exc: Exception):
        """Deliver ``exc`` to every live and queued request, reset the
        engine to empty, and keep serving — one poisoned request or a
        transient backend error must not wedge the server (the reference
        crashed the uvicorn worker on any exception)."""
        for slot, req in list(self._live.items()):
            req.error = exc
            if req.stream_q is not None:
                req.stream_q.put(("error", exc))
            req.event.set()
        self._live.clear()
        self._free = list(range(self.slots))
        while True:
            try:
                req = self._q.get(block=False)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # preserve the shutdown signal
                break
            req.error = exc
            if req.stream_q is not None:
                req.stream_q.put(("error", exc))
            req.event.set()
        self.state = init_state(self.gen.cfg, self.slots, self.max_len,
                                per_row_sampling=self.per_row_sampling,
                                no_repeat_ngram=self.no_repeat_ngram,
                                grammar=self.use_grammar,
                                medusa=self.medusa)

    def _worker(self):
        pending_fetch = None
        while not self._stop:
            try:
                self._drain_cancels()
                # admit as many queued requests as there are free slots
                try:
                    while self._free:
                        block = not self._live and pending_fetch is None
                        req = self._q.get(block=block, timeout=None)
                        # _busy covers the dequeued-but-not-yet-in-_live
                        # window (admit dispatch can be a minutes-long
                        # fresh compile) so drain() can't report idle
                        # while a request is mid-admission
                        self._busy = True
                        if req is None:
                            return
                        if req.cancelled:
                            self.stats["cancelled"] += 1
                            continue
                        self._admit(req, self._free.pop())
                except queue.Empty:
                    pass
                finally:
                    self._busy = False
                if not self._live and pending_fetch is None:
                    continue

                if self._live:
                    # medusa program only while a live medusa row exists
                    # (every row pays the block-verify premium in it);
                    # pure-plain traffic keeps the plain chunk program
                    live_med = any(s in self._live for s in self._med_slots)
                    if live_med:
                        self.state = medusa_chunk(
                            self.gen.params, self._hw, self._hb,
                            self.state, self.gen.cfg,
                            chunk=self.chunk_med, gamma=self.gamma,
                            top_k=self.top_k, greedy=self.greedy,
                            mask_value=self.mask_value,
                            eos_id=self.gen.eos_id,
                            pad_id=self.gen.pad_id, top_p=self.top_p,
                            per_row_sampling=self.per_row_sampling,
                            no_repeat_ngram=self.no_repeat_ngram,
                            grammar=self._garr,
                            use_grammar=self.use_grammar)
                    else:
                        self.state = ragged_chunk(
                            self.gen.params, self.state, self.gen.cfg,
                            chunk=self.chunk, top_k=self.top_k,
                            greedy=self.greedy, mask_value=self.mask_value,
                            eos_id=self.gen.eos_id, pad_id=self.gen.pad_id,
                            top_p=self.top_p,
                            per_row_sampling=self.per_row_sampling,
                            no_repeat_ngram=self.no_repeat_ngram,
                            grammar=self._garr,
                            use_grammar=self.use_grammar)
                    self.stats["chunks"] += 1
                    # depth-1 lookahead: fetch the PREVIOUS chunk's flags
                    # while this one computes — the tunnel RPC overlaps
                    # device time
                    prev, pending_fetch = (pending_fetch,
                                           (_pack_snapshot(self.state),
                                            self.stats["chunks"]))
                    if prev is not None:
                        self._harvest(*prev)
                else:
                    # nothing live: drain the outstanding fetch
                    prev, pending_fetch = pending_fetch, None
                    self._harvest(*prev)
            except Exception as exc:  # noqa: BLE001 - worker must survive
                pending_fetch = None
                self._fail_all(exc)
