"""Ragged batched generation: per-row prompt lengths in one decode.

The core loops (decode/loop.py) require every row of a batch to share one
prompt length — fine for benchmarks, wrong for serving mixed traffic. Here
each row carries its own length: prefill masks per-row, the cache tracks
per-row lengths, decode steps gather per-row positions and scatter per-row
cache updates (vmapped dynamic_update_slice), and rows finish
independently. This is the building block for server-side request
coalescing (batching concurrent /generate calls into one device program).

Corrected causal configs only (the reference's quirk modes are inherently
single-prompt-shaped).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..models.gpt import (GPTConfig, _attn_input, _finish_block,
                          _gqa_scores, _gqa_values, _heads, _linear,
                          _split_qkv, _unheads)
from .grammar import grammar_mask, grammar_step, scan_prompt_state
from .loop import _norm_grammar, _norm_penalties
from .sampling import (apply_no_repeat_ngram, apply_penalties,
                       sample_token, token_counts)


def init_ragged_cache(cfg: GPTConfig, batch: int, max_len: int):
    dt = cfg.jnp_dtype
    shape = (batch, cfg.kv_heads, max_len, cfg.head_dim)
    return {"k": tuple(jnp.zeros(shape, dt) for _ in range(cfg.n_layer)),
            "v": tuple(jnp.zeros(shape, dt) for _ in range(cfg.n_layer)),
            "lengths": jnp.zeros((batch,), jnp.int32)}


def prefill_ragged(params: dict, ids: jax.Array, prompt_lens: jax.Array,
                   cfg: GPTConfig, cache: dict):
    """[B, T] padded prompts with per-row lengths -> (logits, cache)."""
    assert cfg.causal and not cfg.pos_broadcast_bug
    B, T = ids.shape
    dt = cfg.jnp_dtype
    x = (params["tok_emb"][ids] + params["pos"][:T]).astype(dt)
    # causal AND per-row key-validity
    key_pos = jnp.arange(T)
    valid = (key_pos[None, :] < prompt_lens[:, None])[:, None, None, :]
    causal = (key_pos[None, :] <= key_pos[:, None])[None, None]
    mask = valid & causal
    ks, vs = list(cache["k"]), list(cache["v"])
    zero = jnp.asarray(0, jnp.int32)
    for li, p in enumerate(params["layers"]):
        attn_in = _attn_input(p, x, cfg)
        (wq, bq), (wk, bk), (wv, bv) = _split_qkv(p["attn"])
        q = _heads(_linear(attn_in, wq, bq), cfg.n_head)
        k = _heads(_linear(attn_in, wk, bk), cfg.kv_heads)
        v = _heads(_linear(attn_in, wv, bv), cfg.kv_heads)
        ks[li] = jax.lax.dynamic_update_slice(ks[li], k,
                                              (zero, zero, zero, zero))
        vs[li] = jax.lax.dynamic_update_slice(vs[li], v,
                                              (zero, zero, zero, zero))
        scores = _gqa_scores(q, k, 1.0 / math.sqrt(cfg.head_dim))
        scores = jnp.where(mask, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
        attn_out = _linear(_unheads(_gqa_values(probs, v)),
                           p["attn"]["out_w"], p["attn"]["out_b"])
        x = _finish_block(p, x, attn_out, cfg)
    logits = _linear(x.astype(jnp.float32), params["head"]["w"],
                     params["head"]["b"])
    return logits, {"k": tuple(ks), "v": tuple(vs),
                    "lengths": prompt_lens.astype(jnp.int32)}


def _row_update(c_layer, new, t):
    """vmapped per-row cache write: [B,H,M,Dh] <- [B,H,1,Dh] at t[B]."""
    return jax.vmap(
        lambda c, n, tt: jax.lax.dynamic_update_slice(c, n, (0, tt, 0))
    )(c_layer, new, t)


def decode_step_ragged(params: dict, last: jax.Array, cache: dict,
                       cfg: GPTConfig):
    """[B] last tokens at per-row positions t=lengths -> ([B, V], cache)."""
    B = last.shape[0]
    dt = cfg.jnp_dtype
    t = cache["lengths"]                                  # [B]
    max_len = cache["k"][0].shape[2]
    x = (params["tok_emb"][last[:, None]]
         + params["pos"][t][:, None]).astype(dt)          # [B,1,D]
    ks, vs = list(cache["k"]), list(cache["v"])
    key_valid = (jnp.arange(max_len)[None, :] <=
                 t[:, None])[:, None, None, :]
    for li, p in enumerate(params["layers"]):
        attn_in = _attn_input(p, x, cfg)
        qkv = _linear(attn_in, p["attn"]["in_w"], p["attn"]["in_b"])
        D, KVD = cfg.d_model, cfg.kv_dim
        q = _heads(qkv[..., :D], cfg.n_head)
        k_new = _heads(qkv[..., D:D + KVD], cfg.kv_heads)
        v_new = _heads(qkv[..., D + KVD:], cfg.kv_heads)
        ks[li] = _row_update(ks[li], k_new, t)
        vs[li] = _row_update(vs[li], v_new, t)
        scores = _gqa_scores(q, ks[li], 1.0 / math.sqrt(cfg.head_dim))
        scores = jnp.where(key_valid, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
        attn_out = _linear(_unheads(_gqa_values(probs, vs[li])),
                           p["attn"]["out_w"], p["attn"]["out_b"])
        x = _finish_block(p, x, attn_out, cfg)
    logits = _linear(x.astype(jnp.float32), params["head"]["w"],
                     params["head"]["b"])[:, 0]
    return logits, {"k": tuple(ks), "v": tuple(vs), "lengths": t + 1}


def decode_block_ragged(params: dict, block: jax.Array, cache: dict,
                        cfg: GPTConfig):
    """[B, W] token blocks starting at per-row positions t=lengths ->
    ([B, W, V] logits, [B, W, D] hidden, cache with the W entries
    written and lengths UNCHANGED — the caller commits the accepted
    prefix by setting lengths itself (medusa rewind semantics).

    The ragged twin of models.gpt.decode_block (the speculative verify
    step): each of the W tokens attends to the row's cached prefix plus
    the block up to itself. K/V block writes are masked one-hot (a
    vmapped per-row dynamic_update_slice compiles 2-3x slower on the
    remote helper — the round-2 continuous-engine lesson)."""
    assert cfg.causal and not cfg.pos_broadcast_bug
    B, W = block.shape
    dt = cfg.jnp_dtype
    t = cache["lengths"]                                   # [B]
    max_len = cache["k"][0].shape[2]
    pos_ids = jnp.minimum(t[:, None] + jnp.arange(W)[None],
                          params["pos"].shape[0] - 1)      # [B, W]
    x = (params["tok_emb"][block] + params["pos"][pos_ids]).astype(dt)
    key_pos = jnp.arange(max_len)
    # causal over absolute positions: key m visible to query w iff
    # m <= t + w (full prefix + causal within the block)
    valid = (key_pos[None, None, None, :]
             <= pos_ids[:, None, :, None])                 # [B,1,W,M]
    offs = key_pos[None, :] - t[:, None]                   # [B, M]
    sel = (offs[:, :, None]
           == jnp.arange(W)[None, None, :]).astype(dt)     # [B, M, W]
    wmask = ((offs >= 0) & (offs < W))[:, None, :, None]   # [B,1,M,1]
    ks, vs = list(cache["k"]), list(cache["v"])
    for li, p in enumerate(params["layers"]):
        attn_in = _attn_input(p, x, cfg)
        qkv = _linear(attn_in, p["attn"]["in_w"], p["attn"]["in_b"])
        D, KVD = cfg.d_model, cfg.kv_dim
        q = _heads(qkv[..., :D], cfg.n_head)               # [B,H,W,Dh]
        k_new = _heads(qkv[..., D:D + KVD], cfg.kv_heads)
        v_new = _heads(qkv[..., D + KVD:], cfg.kv_heads)
        ks[li] = jnp.where(
            wmask, jnp.einsum("bmw,bhwd->bhmd", sel, k_new), ks[li])
        vs[li] = jnp.where(
            wmask, jnp.einsum("bmw,bhwd->bhmd", sel, v_new), vs[li])
        scores = _gqa_scores(q, ks[li], 1.0 / math.sqrt(cfg.head_dim))
        scores = jnp.where(valid, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dt)
        attn_out = _linear(_unheads(_gqa_values(probs, vs[li])),
                           p["attn"]["out_w"], p["attn"]["out_b"])
        x = _finish_block(p, x, attn_out, cfg)
    logits = _linear(x.astype(jnp.float32), params["head"]["w"],
                     params["head"]["b"])                  # [B, W, V]
    return logits, x, {"k": tuple(ks), "v": tuple(vs), "lengths": t}


def _sample_per_row(rngs, logits, temperature, top_k, mask_value, greedy,
                    top_p=1.0, use_top_p=False, min_p=0.0,
                    use_min_p=False, counts=None, rep_p=1.0, freq_p=0.0,
                    pres_p=0.0, use_penalties=False):
    """Per-row PRNG keys: row outputs don't depend on batch composition,
    so a coalesced request keeps its seed reproducibility. ``counts``
    ([B, V], with the batch-wide traced penalty values) feeds the
    anti-repetition transforms — per-row state, shared penalty params
    (the window batcher groups requests by sampling params)."""
    if use_penalties and counts is not None:
        logits = apply_penalties(logits, counts, rep_p, freq_p, pres_p,
                                 enabled=True)
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.vmap(
        lambda k, lg: sample_token(k, lg[None], temperature, top_k,
                                   mask_value, greedy, top_p=top_p,
                                   use_top_p=use_top_p, min_p=min_p,
                                   use_min_p=use_min_p)[0]
    )(rngs, logits)


def generate_kv_ragged(params: dict, prompt: jax.Array,
                       prompt_lens: jax.Array, rngs: jax.Array,
                       cfg: GPTConfig, max_len: int,
                       temperature: float = 1.0, top_k: int = 50,
                       eos_id: int = -1, pad_id: int = 0,
                       greedy: bool = False, mask_value: float = -1e10,
                       top_p: float = 1.0, min_p: float = 0.0,
                       penalties: tuple | None = None,
                       no_repeat_ngram: int = 0, grammar=None):
    """Thin host wrapper — top_p/min_p/penalties stay TRACED operands so
    every client-supplied value shares one compiled ragged program (a
    fresh ragged compile costs minutes on the axon remote helper); only
    the on/off bits are static. ``penalties`` is a batch-wide
    (repetition, frequency, presence) tuple — the window batcher groups
    requests by sampling params, so rows share the values; the counts
    state is per row. ``grammar``: optional decode.grammar.Grammar (or
    its ``arrays()`` pytree), batch-wide; the FSM state is per row."""
    use_top_p = top_p is not None and float(top_p) < 1.0
    use_min_p = min_p is not None and float(min_p) > 0.0
    rep_p, freq_p, pres_p, use_pen = _norm_penalties(penalties)
    garr, use_gram = _norm_grammar(grammar)
    return _generate_kv_ragged(params, prompt, prompt_lens, rngs, cfg,
                               max_len, temperature, top_k, eos_id, pad_id,
                               greedy, mask_value,
                               float(top_p) if use_top_p else 1.0,
                               use_top_p,
                               float(min_p) if use_min_p else 0.0,
                               use_min_p, rep_p, freq_p, pres_p, use_pen,
                               int(no_repeat_ngram or 0), garr, use_gram)


@partial(jax.jit, static_argnames=("cfg", "max_len", "top_k", "greedy",
                                   "mask_value", "use_top_p", "use_min_p",
                                   "use_penalties", "no_repeat_ngram",
                                   "use_grammar"))
def _generate_kv_ragged(params: dict, prompt: jax.Array,
                        prompt_lens: jax.Array, rngs: jax.Array,
                        cfg: GPTConfig, max_len: int,
                        temperature: float = 1.0, top_k: int = 50,
                        eos_id: int = -1, pad_id: int = 0,
                        greedy: bool = False, mask_value: float = -1e10,
                        top_p=1.0, use_top_p: bool = False,
                        min_p=0.0, use_min_p: bool = False,
                        rep_p=1.0, freq_p=0.0, pres_p=0.0,
                        use_penalties: bool = False,
                        no_repeat_ngram: int = 0,
                        grammar=None, use_grammar: bool = False):
    """Heterogeneous batch: prompt [B, P] padded, prompt_lens [B], one PRNG
    key per row (rngs [B, 2] — jax.vmap(jax.random.PRNGKey)(seeds)).
    Returns (tokens [B, max_len], lengths [B]); row b holds its prompt then
    its generation, PAD elsewhere. Each row's stream is a pure function of
    (params, its prompt, its key) — independent of the other rows."""
    B, P = prompt.shape
    # decode_step_ragged reads params["pos"][t] for t up to max_len-1;
    # trainer presets allocate seq_len-1 rows (train/train_large2.py:87),
    # so a max_len == seq_len decode would silently clamp the final
    # position lookup.
    assert max_len <= cfg.n_pos, (
        f"max_len={max_len} exceeds the positional table "
        f"(n_pos={cfg.n_pos}); cap decode length at cfg.n_pos")
    if rngs.ndim == 1:  # single key: fan out per row
        rngs = jax.vmap(lambda i: jax.random.fold_in(rngs, i))(
            jnp.arange(B))
    cache = init_ragged_cache(cfg, B, max_len)
    logits0, cache = prefill_ragged(params, prompt, prompt_lens, cfg, cache)

    buf = jnp.full((B, max_len), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.where(jnp.arange(P)[None] < prompt_lens[:, None], prompt,
                       pad_id).astype(jnp.int32), (0, 0))

    split = jax.vmap(lambda k: jax.random.split(k))
    keys = split(rngs)                      # [B, 2, 2]
    rngs, subs = keys[:, 0], keys[:, 1]
    # one-hot contraction, NOT take_along_axis: vocab-broadcast gathers
    # hit the scalar core (~25 ms on this backend, measured)
    onehot = (jnp.arange(P)[None, :] ==
              (prompt_lens - 1)[:, None]).astype(logits0.dtype)
    last_logits = jnp.einsum("bpv,bp->bv", logits0, onehot)
    counts = token_counts(
        prompt, jnp.arange(P)[None, :] < prompt_lens[:, None],
        cfg.vocab_size) if use_penalties else None
    gstate = scan_prompt_state(grammar, prompt,
                               prompt_lens) if use_grammar else None
    if no_repeat_ngram:
        last_logits = apply_no_repeat_ngram(
            last_logits, buf, prompt_lens, no_repeat_ngram, mask_value)
    if use_grammar:
        last_logits = grammar_mask(last_logits, gstate, grammar,
                                   budget_left=max_len - prompt_lens)
    first = _sample_per_row(subs, last_logits, temperature, top_k,
                            mask_value, greedy, top_p, use_top_p, min_p,
                            use_min_p, counts, rep_p, freq_p, pres_p,
                            use_penalties)
    # A row whose prompt already fills the buffer (prompt_lens == max_len)
    # has no slot left: it starts done, its position stays put, and the
    # write below re-writes the existing value instead of clobbering the
    # final prompt token (reference semantics: zero generation steps,
    # api_cache.py:166 range(max_len - len) is empty).
    active0 = prompt_lens < max_len
    cols = jnp.arange(max_len)[None, :]
    # masked one-hot write — same values as a per-row dynamic_update_slice,
    # but the vmapped-scatter form compiles 2-3x slower on this backend's
    # remote-compile helper (measured on the continuous-engine chunk)
    hit0 = (cols == prompt_lens[:, None]) & active0[:, None]
    buf = jnp.where(hit0, first[:, None].astype(jnp.int32), buf)
    pos = jnp.where(active0, prompt_lens + 1, prompt_lens)
    done = (first == eos_id) | ~active0
    if use_penalties:
        counts = counts + ((first[:, None] == jnp.arange(
            cfg.vocab_size)[None, :]) & active0[:, None]).astype(
            jnp.float32)
    if use_grammar:
        gstate = grammar_step(gstate, first, grammar, active=active0)

    def cond(state):
        pos, done = state[1], state[3]
        return ~jnp.all(done | (pos >= max_len))

    def body(state):
        buf, pos, last, done, rngs, cache = state[:6]
        idx = 6
        counts = state[idx] if use_penalties else None
        idx += int(use_penalties)
        gstate = state[idx] if use_grammar else None
        keys = split(rngs)
        rngs, subs = keys[:, 0], keys[:, 1]
        logits, new_cache = decode_step_ragged(params, last, cache, cfg)
        if no_repeat_ngram:
            logits = apply_no_repeat_ngram(logits, buf, pos,
                                           no_repeat_ngram, mask_value)
        if use_grammar:
            logits = grammar_mask(logits, gstate, grammar,
                                  budget_left=max_len - pos)
        nxt = _sample_per_row(subs, logits, temperature, top_k, mask_value,
                              greedy, top_p, use_top_p, min_p, use_min_p,
                              counts, rep_p, freq_p, pres_p, use_penalties)
        active = ~(done | (pos >= max_len))
        write = jnp.where(active, nxt, pad_id).astype(jnp.int32)
        hit = (cols == pos[:, None]) & active[:, None]
        buf = jnp.where(hit, write[:, None], buf)
        # inactive rows must not advance their cache length
        cache = {"k": new_cache["k"], "v": new_cache["v"],
                 "lengths": jnp.where(active, new_cache["lengths"],
                                      cache["lengths"])}
        pos = jnp.where(active, pos + 1, pos)
        done = done | (nxt == eos_id) | (pos >= max_len)
        last = jnp.where(active, nxt, last)
        out = (buf, pos, last, done, rngs, cache)
        if use_penalties:
            counts = counts + ((nxt[:, None] == jnp.arange(
                cfg.vocab_size)[None, :]) & active[:, None]).astype(
                jnp.float32)
            out = out + (counts,)
        if use_grammar:
            out = out + (grammar_step(gstate, nxt, grammar, active=active),)
        return out

    state0 = (buf, pos.astype(jnp.int32), first, done, rngs, cache)
    if use_penalties:
        state0 = state0 + (counts,)
    if use_grammar:
        state0 = state0 + (gstate,)
    res = jax.lax.while_loop(cond, body, state0)
    return res[0], jnp.minimum(res[1], max_len)
