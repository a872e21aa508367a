"""Speculative decoding: draft-model rollout + single-pass target verify.

Serving-side acceleration that preserves the target model's sampling
distribution exactly (Leviathan et al.'s rejection scheme): a small draft
model proposes ``gamma`` tokens autoregressively; the target scores the
whole block in ONE cached forward (models.gpt.decode_block); proposals are
accepted with prob min(1, p/q), the first rejection resamples from
normalize(max(p-q, 0)), and a fully-accepted block earns a bonus token.
Greedy mode degenerates to "accept while the draft matches the target
argmax" — the output is bit-identical to target-only greedy decoding, which
is the correctness test.

Requires corrected causal configs (no reference bidirectional/pos quirks)
and batch 1 (per-row acceptance lengths diverge otherwise). The whole
generator is one ``lax.while_loop`` program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.gpt import (GPTConfig, decode_block, decode_step,
                          init_kv_cache, prefill)
from .sampling import apply_min_p, apply_top_k, apply_top_p


def _dist(logits, temperature, top_k, greedy, top_p=1.0, min_p=0.0):
    """Sampling distribution as used by sample_token (softmax of the
    temperature/top-k/top-p/min-p-masked logits); greedy = one-hot argmax.
    Draft and target share the filter, so rejection sampling still yields
    exactly the target's filtered distribution."""
    if greedy:
        return jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1])
    masked = apply_top_k(logits / temperature, top_k)
    masked = apply_top_p(masked, top_p)
    masked = apply_min_p(masked, min_p)
    return jax.nn.softmax(masked, axis=-1)


@partial(jax.jit, static_argnames=("cfg_t", "cfg_d", "max_len", "gamma",
                                   "top_k", "greedy", "top_p", "min_p"))
def generate_speculative(params_t: dict, params_d: dict, prompt: jax.Array,
                         prompt_len, rng: jax.Array, cfg_t: GPTConfig,
                         cfg_d: GPTConfig, max_len: int, gamma: int = 4,
                         temperature: float = 1.0, top_k: int = 50,
                         eos_id: int = -1, pad_id: int = 0,
                         greedy: bool = False, top_p: float = 1.0,
                         min_p: float = 0.0):
    """prompt [1, P] -> (tokens [1, max_len], n_tokens). Same contract as
    generate_kv (efficient mode), same output distribution as the target
    model alone."""
    assert cfg_t.causal and cfg_d.causal, "speculative requires causal"
    assert not (cfg_t.pos_broadcast_bug or cfg_d.pos_broadcast_bug)
    B, P = prompt.shape
    assert B == 1, "speculative decoding is a batch-1 latency optimization"
    assert cfg_t.n_pos >= max_len + gamma, \
        "target pos table too small for the speculative block overshoot"
    assert cfg_d.n_pos >= max_len + gamma
    V = cfg_t.vocab_size
    slack = max_len + gamma + 1

    cache_t = init_kv_cache(cfg_t, 1, slack)
    cache_d = init_kv_cache(cfg_d, 1, slack)
    logits_t0, cache_t = prefill(params_t, prompt, cfg_t, cache_t,
                                 prompt_len=prompt_len)
    _, cache_d = prefill(params_d, prompt, cfg_d, cache_d,
                         prompt_len=prompt_len)

    buf = jnp.full((1, slack), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.where(jnp.arange(P)[None] < prompt_len, prompt,
                       pad_id).astype(jnp.int32), (0, 0))

    rng, sub = jax.random.split(rng)
    first_dist = _dist(logits_t0[:, :][0, prompt_len - 1][None],
                       temperature, top_k, greedy, top_p, min_p)[0]
    first = jnp.argmax(first_dist).astype(jnp.int32) if greedy else \
        jax.random.categorical(sub, jnp.log(first_dist + 1e-30)).astype(
            jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, first[None, None],
                                       (0, prompt_len))
    pos0 = prompt_len + 1
    done0 = first == eos_id

    def cond(state):
        buf, pos, last, done, rng, cache_t, cache_d = state
        return jnp.logical_and(pos < max_len, ~done)

    def body(state):
        buf, pos, last, done, rng, cache_t, cache_d = state
        L = pos - 1  # cached prefix length; `last` sits at index L

        # ---- draft rollout: gamma proposals + one cache-sync step --------
        d_tokens = []
        q_dists = []
        cur = last
        cd = {"k": cache_d["k"], "v": cache_d["v"],
              "length": jnp.asarray(L, jnp.int32)}
        for i in range(gamma + 1):
            rng, sub = jax.random.split(rng)
            logits_d, cd = decode_step(params_d, cur[None, None], cd,
                                       cfg_d)
            if i < gamma:
                dist = _dist(logits_d[0][None], temperature, top_k,
                             greedy, top_p, min_p)[0]
                nxt = jnp.argmax(dist).astype(jnp.int32) if greedy else \
                    jax.random.categorical(
                        sub, jnp.log(dist + 1e-30)).astype(jnp.int32)
                d_tokens.append(nxt)
                q_dists.append(dist)
                cur = nxt
        d = jnp.stack(d_tokens)                       # [gamma]
        q = jnp.stack(q_dists)                        # [gamma, V]

        # ---- target verify: one block forward ----------------------------
        block = jnp.concatenate([last[None], d])[None]  # [1, gamma+1]
        ct = {"k": cache_t["k"], "v": cache_t["v"],
              "length": jnp.asarray(L, jnp.int32)}
        logits_t, ct = decode_block(params_t, block, ct, cfg_t)
        p = jax.vmap(lambda lg: _dist(lg[None], temperature, top_k,
                                      greedy, top_p, min_p)[0])(logits_t[0])  # [g+1, V]

        # ---- acceptance ---------------------------------------------------
        rng, sub_u, sub_r = jax.random.split(rng, 3)
        p_d = jnp.take_along_axis(p[:gamma], d[:, None], 1)[:, 0]
        q_d = jnp.take_along_axis(q, d[:, None], 1)[:, 0]
        if greedy:
            acc = p_d > 0.5  # one-hot: accepted iff d == target argmax
        else:
            u = jax.random.uniform(sub_u, (gamma,))
            acc = u < jnp.minimum(1.0, p_d / jnp.maximum(q_d, 1e-30))
        acc_prefix = jnp.cumprod(acc.astype(jnp.int32))
        n = jnp.sum(acc_prefix)                       # accepted proposals

        # ---- next token: residual resample or bonus ----------------------
        p_n = p[n]                                    # dist after n accepts
        q_n = jnp.where(n < gamma,
                        q[jnp.minimum(n, gamma - 1)],
                        jnp.zeros((V,)))              # bonus: residual = p
        residual = jnp.maximum(p_n - q_n, 0.0)
        rsum = jnp.sum(residual)
        residual = jnp.where(rsum > 1e-12, residual / jnp.maximum(rsum,
                                                                  1e-30),
                             p_n)
        t_new = jnp.argmax(residual).astype(jnp.int32) if greedy else \
            jax.random.categorical(sub_r,
                                   jnp.log(residual + 1e-30)).astype(
                                       jnp.int32)

        # ---- window of written tokens: d_1..d_n, t_new, pad... -----------
        idx = jnp.arange(gamma + 1)
        window = jnp.where(idx < n, jnp.concatenate([d, d[-1:]]),
                           jnp.where(idx == n, t_new, pad_id)
                           ).astype(jnp.int32)
        is_eos = window == eos_id
        big = gamma + 2
        e = jnp.min(jnp.where(is_eos & (idx <= n), idx, big))
        limit = jnp.minimum(n + 1, e + 1)
        window = jnp.where(idx < limit, window, pad_id).astype(jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, window[None], (0, pos))
        new_pos = pos + limit
        new_last = window[limit - 1]
        done = e <= n

        # ---- rewind caches to the confirmed prefix ------------------------
        ct = {"k": ct["k"], "v": ct["v"],
              "length": jnp.asarray(new_pos - 1, jnp.int32)}
        cd = {"k": cd["k"], "v": cd["v"],
              "length": jnp.asarray(new_pos - 1, jnp.int32)}
        return buf, new_pos, new_last, done, rng, ct, cd

    buf, pos, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (buf, jnp.asarray(pos0, jnp.int32), first, done0, rng,
                     cache_t, cache_d))
    pos = jnp.minimum(pos, max_len)
    idx = jnp.arange(slack)[None]
    buf = jnp.where(idx < pos, buf, pad_id)
    return buf[:, :max_len], pos


@partial(jax.jit, static_argnames=("cfg", "max_len", "gamma", "ngram",
                                   "top_k", "greedy", "top_p", "min_p"))
def generate_prompt_lookup(params: dict, prompt: jax.Array, prompt_len,
                           rng: jax.Array, cfg: GPTConfig, max_len: int,
                           gamma: int = 8, ngram: int = 3,
                           temperature: float = 1.0, top_k: int = 50,
                           eos_id: int = -1, pad_id: int = 0,
                           greedy: bool = False, top_p: float = 1.0,
                           min_p: float = 0.0):
    """Draft-free speculative decoding: proposals are copied from the
    sequence's own history (prompt-lookup / n-gram speculation).

    Each iteration finds the most recent earlier occurrence of the
    trailing ``ngram`` tokens in the buffer, proposes the ``gamma`` tokens
    that followed it, and verifies the whole block in ONE cached target
    forward (models.gpt.decode_block). The proposal distribution is a
    point mass, so Leviathan acceptance reduces to: accept d with prob
    p(d) (sampled) or iff d == argmax p (greedy); the rejection residual
    is p with the proposed token zeroed out, renormalized — the output
    distribution is exactly the target's, and greedy output is
    bit-identical to target-only greedy decoding.

    Unlike generate_speculative there is NO draft model: the proposal
    costs a few vector ops, and the verify block streams the KV cache
    once — on this TPU's MXU-streaming-bound decode step (DESIGN.md §3.7)
    a gamma+1-token verify costs barely more than a single-token step, so
    every accepted proposal is nearly free latency-wise. Wins on
    self-repetitive streams (compact-vocab music, Scheme B); degrades to
    ~1 verify per token (≈ plain decode) when nothing matches.

    Reference capability being surpassed: the one-token-at-a-time loop at
    /root/reference/api_cache.py:166-182. Batch 1, corrected causal
    configs only (same contract as generate_speculative).

    Measured caveats (DESIGN.md §3.6): on Scheme-B checkpoints acceptance
    is ~1.1 tok/verify — the absolute `T_x` onset tokens increase
    monotonically, so exact n-gram matches rarely predict continuations;
    and on TPU at default matmul precision the block-verify rounds
    differently than single-token steps, so greedy near-tie argmaxes can
    flip (bit-parity holds on CPU and under
    jax.default_matmul_precision("float32")).

    Returns (tokens [1, max_len], n_tokens, n_verify_steps) — generated
    tokens per verify step = (n_tokens - prompt_len - 1) / n_verify_steps
    is the speculation win to report.
    """
    assert cfg.causal and not cfg.pos_broadcast_bug
    assert ngram >= 1 and gamma >= 1
    B, P = prompt.shape
    assert B == 1, "prompt-lookup decoding is a batch-1 latency optimization"
    assert cfg.n_pos >= max_len + gamma, \
        "pos table too small for the speculative block overshoot"
    V = cfg.vocab_size
    slack = max_len + gamma + 1

    cache = init_kv_cache(cfg, 1, slack)
    logits0, cache = prefill(params, prompt, cfg, cache,
                             prompt_len=prompt_len)

    buf = jnp.full((1, slack), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.where(jnp.arange(P)[None] < prompt_len, prompt,
                       pad_id).astype(jnp.int32), (0, 0))

    rng, sub = jax.random.split(rng)
    first_dist = _dist(logits0[0, prompt_len - 1][None], temperature,
                       top_k, greedy, top_p, min_p)[0]
    first = jnp.argmax(first_dist).astype(jnp.int32) if greedy else \
        jax.random.categorical(sub, jnp.log(first_dist + 1e-30)).astype(
            jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, first[None, None],
                                       (0, prompt_len))
    pos0 = prompt_len + 1
    done0 = first == eos_id

    def propose(buf, pos):
        """Most recent history match of the trailing ngram -> [gamma]
        proposed tokens; -1 marks invalid slots (never accepted: the
        one-hot p/q lookups read 0 probability for out-of-range ids)."""
        buf0 = buf[0]
        idx = jnp.arange(slack)
        tpos = jnp.clip(pos - ngram + jnp.arange(ngram), 0, slack - 1)
        trail = buf0[tpos]                                   # [ngram]
        # match[s]: buf0[s:s+ngram] == trail, gram entirely in history
        # and strictly before the trailing occurrence (s < pos - ngram;
        # rolls never wrap into play because s + ngram - 1 < pos <= slack)
        cmp = jnp.stack([jnp.roll(buf0, -j) for j in range(ngram)],
                        0) == trail[:, None]                 # [ngram, slack]
        match = jnp.all(cmp, 0) & (idx < pos - ngram) & (pos >= ngram + 1)
        m = jnp.max(jnp.where(match, idx, -1))               # most recent
        has = m >= 0
        src = m + ngram + jnp.arange(gamma)
        d = jnp.where(has & (src < pos),
                      buf0[jnp.clip(src, 0, slack - 1)], -1)
        return d.astype(jnp.int32)

    def cond(state):
        buf, pos, last, done, rng, cache, n_steps = state
        return jnp.logical_and(pos < max_len, ~done)

    def body(state):
        buf, pos, last, done, rng, cache, n_steps = state
        L = pos - 1  # cached prefix length; `last` sits at index L

        d = propose(buf, pos)                                 # [gamma]
        q = jax.nn.one_hot(d, V)                              # [gamma, V]

        # ---- target verify: one block forward ----------------------------
        block = jnp.concatenate([last[None], d * (d >= 0)])[None]
        ct = {"k": cache["k"], "v": cache["v"],
              "length": jnp.asarray(L, jnp.int32)}
        logits_t, ct = decode_block(params, block, ct, cfg)
        p = jax.vmap(lambda lg: _dist(lg[None], temperature, top_k,
                                      greedy, top_p, min_p)[0])(
                                          logits_t[0])        # [g+1, V]

        # ---- acceptance: q is a point mass, so accept w.p. p(d) ----------
        rng, sub_u, sub_r = jax.random.split(rng, 3)
        p_d = jnp.sum(p[:gamma] * q, -1)                      # 0 for d = -1
        if greedy:
            acc = p_d > 0.5  # one-hot p: accepted iff d == target argmax
        else:
            u = jax.random.uniform(sub_u, (gamma,))
            acc = u < p_d
        acc_prefix = jnp.cumprod(acc.astype(jnp.int32))
        n = jnp.sum(acc_prefix)                               # accepted

        # ---- next token: residual resample or bonus ----------------------
        p_n = p[n]                                            # dist after n
        q_n = jnp.where(n < gamma, q[jnp.minimum(n, gamma - 1)],
                        jnp.zeros((V,)))                      # bonus: = p
        residual = jnp.maximum(p_n - q_n, 0.0)
        rsum = jnp.sum(residual)
        residual = jnp.where(rsum > 1e-12,
                             residual / jnp.maximum(rsum, 1e-30), p_n)
        t_new = jnp.argmax(residual).astype(jnp.int32) if greedy else \
            jax.random.categorical(sub_r,
                                   jnp.log(residual + 1e-30)).astype(
                                       jnp.int32)

        # ---- window of written tokens: d_1..d_n, t_new, pad... -----------
        idx = jnp.arange(gamma + 1)
        window = jnp.where(idx < n, jnp.concatenate([d, d[-1:]]),
                           jnp.where(idx == n, t_new, pad_id)
                           ).astype(jnp.int32)
        is_eos = window == eos_id
        big = gamma + 2
        e = jnp.min(jnp.where(is_eos & (idx <= n), idx, big))
        limit = jnp.minimum(n + 1, e + 1)
        window = jnp.where(idx < limit, window, pad_id).astype(jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, window[None], (0, pos))
        new_pos = pos + limit
        new_last = window[limit - 1]
        done = e <= n

        # ---- rewind the cache to the confirmed prefix ---------------------
        ct = {"k": ct["k"], "v": ct["v"],
              "length": jnp.asarray(new_pos - 1, jnp.int32)}
        return buf, new_pos, new_last, done, rng, ct, n_steps + 1

    buf, pos, _, _, _, _, n_steps = jax.lax.while_loop(
        cond, body, (buf, jnp.asarray(pos0, jnp.int32), first, done0, rng,
                     cache, jnp.asarray(0, jnp.int32)))
    pos = jnp.minimum(pos, max_len)
    idx = jnp.arange(slack)[None]
    buf = jnp.where(idx < pos, buf, pad_id)
    return buf[:, :max_len], pos, n_steps
