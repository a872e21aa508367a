"""Medusa-style multi-token decoding: extra heads propose, one block
verifies.

VERDICT r2 #4: every SEQUENTIAL speculation variant measured negative at
batch 1 on this runtime — a trained draft model pays its own serial op
chain per proposal (DESIGN.md §3), and prompt-lookup found nothing to
copy in non-repetitive streams (§3.6). Medusa heads break the sequential
bottleneck: ``gamma`` lightweight heads read the SAME hidden state the
base LM head reads and predict tokens t+2, t+3, ... t+1+gamma in one
shot — zero extra serial chain traversals per proposal. Verification
reuses models.gpt.decode_block exactly like the other speculators, and
the acceptance math is Leviathan's, so sampled output follows the base
model's distribution exactly and greedy output is bit-identical to
target-only greedy decoding (the correctness test).

Head architecture (Medusa-1, arXiv:2401.10774's simplest variant): per
head a zero-init residual block ``h + silu(h @ W.T + b)`` feeding the
base LM head — zero init makes every head start as a copy of the base
next-token head, a sane warm start. Heads train on frozen base hidden
states (tools/medusa.py) in minutes; base weights never change, so
serving parity is untouched when heads are absent.

Reference baseline being beaten: the one-token-per-iteration loop at
/root/reference/api_cache.py:166-182.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.gpt import GPTConfig, decode_block, init_kv_cache, prefill
from .speculative import _dist


def init_medusa_heads(rng: jax.Array, cfg: GPTConfig,
                      n_heads: int) -> dict:
    """{"blocks": [{"w": [D, D], "b": [D]}, ...]} — zero-init so head_k
    initially equals the base next-token head."""
    D = cfg.d_model
    return {"blocks": [{"w": jnp.zeros((D, D), jnp.float32),
                        "b": jnp.zeros((D,), jnp.float32)}
                       for _ in range(n_heads)]}


def _stack_heads(heads: dict):
    """blocks list -> (w [g, D, D], b [g, D]) so the per-step head
    evaluation is ONE batched matmul instead of g serial chains — the
    decode loop body is latency-bound on serial op issue (DESIGN.md
    §3.7), so op count in the body is the cost model."""
    return (jnp.stack([blk["w"] for blk in heads["blocks"]]),
            jnp.stack([blk["b"] for blk in heads["blocks"]]))


def _head_logits(w: jax.Array, b: jax.Array, params: dict,
                 h: jax.Array) -> jax.Array:
    """Stacked-head logits: h [D] -> [g, V] via two batched matmuls."""
    hk = h[None] + jax.nn.silu(jnp.einsum("gde,e->gd", w, h) + b)
    return (hk.astype(jnp.float32) @ params["head"]["w"].T
            + params["head"]["b"])


def medusa_logits(heads: dict, params: dict, h: jax.Array) -> jax.Array:
    """h [..., D] -> [n_heads, ..., V]: head_k's logits for the token
    k+2 positions after the one ``h`` sits at (the base head covers +1)."""
    w, b = _stack_heads(heads)
    hk = h[None] + jax.nn.silu(
        jnp.einsum("gde,...e->g...d", w, h)
        + b.reshape((b.shape[0],) + (1,) * (h.ndim - 1) + (-1,)))
    return (hk.astype(jnp.float32) @ params["head"]["w"].T
            + params["head"]["b"])


@partial(jax.jit, static_argnames=("cfg", "max_len", "gamma", "top_k",
                                   "greedy", "top_p", "min_p"))
def generate_medusa(params: dict, heads: dict, prompt: jax.Array,
                    prompt_len, rng: jax.Array, cfg: GPTConfig,
                    max_len: int, gamma: int = 4,
                    temperature: float = 1.0, top_k: int = 50,
                    eos_id: int = -1, pad_id: int = 0,
                    greedy: bool = False, top_p: float = 1.0,
                    min_p: float = 0.0):
    """prompt [1, P] -> (tokens [1, max_len], n_tokens, n_verify_steps).
    Same contract as generate_prompt_lookup; ``gamma`` must equal the
    number of trained heads. Tokens per verify step =
    (n_tokens - prompt_len) / n_verify_steps is the speculation win."""
    assert cfg.causal and not cfg.pos_broadcast_bug
    assert len(heads["blocks"]) >= gamma >= 1
    heads = {"blocks": heads["blocks"][:gamma]}
    B, P = prompt.shape
    assert B == 1, "medusa decoding is a batch-1 latency optimization"
    assert cfg.n_pos >= max_len + gamma, \
        "pos table too small for the speculative block overshoot"
    slack = max_len + gamma + 1

    state = _medusa_init(params, prompt, prompt_len, rng, cfg, slack,
                         temperature, top_k, greedy, top_p, min_p, eos_id,
                         pad_id)
    hw, hb = _stack_heads(heads)  # stacked ONCE, outside the loop body
    body = _make_medusa_body(params, hw, hb, cfg, gamma, temperature,
                             top_k, greedy, top_p, min_p, eos_id, pad_id)

    def cond(state):
        buf, pos, last, h_last, done, rng, cache, n_steps = state
        return jnp.logical_and(pos < max_len, ~done)

    buf, pos, _, _, _, _, _, n_steps = jax.lax.while_loop(
        cond, body, state)
    pos = jnp.minimum(pos, max_len)
    idx = jnp.arange(slack)[None]
    buf = jnp.where(idx < pos, buf, pad_id)
    return buf[:, :max_len], pos, n_steps


def _medusa_init(params: dict, prompt: jax.Array, prompt_len,
                 rng: jax.Array, cfg: GPTConfig, slack: int,
                 temperature, top_k: int, greedy: bool, top_p, min_p,
                 eos_id: int, pad_id: int):
    """Prefill + first token -> the loop-carried medusa state
    (buf, pos, last, h_last, done, rng, cache, n_steps)."""
    B, P = prompt.shape
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
    # no hidden state exists yet for `first`'s predictor position in this
    # loop's bookkeeping; a zero h makes round-1 proposals the zero-init
    # base distribution — acceptance math keeps the output exact either way
    h0 = jnp.zeros((cfg.d_model,), cfg.jnp_dtype)
    return (buf, jnp.asarray(pos0, jnp.int32), first, h0, done0, rng,
            cache, jnp.asarray(0, jnp.int32))


def _make_medusa_body(params: dict, hw: jax.Array, hb: jax.Array,
                      cfg: GPTConfig, gamma: int, temperature,
                      top_k: int, greedy: bool, top_p, min_p,
                      eos_id: int, pad_id: int):
    """One verify iteration over the medusa state — shared by the
    one-shot while_loop (generate_medusa) and the bounded streaming
    chunk (medusa_stream_chunk), so streams are BIT-IDENTICAL to the
    one-shot for any sampling mode (rng flows through the state)."""
    V = cfg.vocab_size

    def body(state):
        buf, pos, last, h_last, done, rng, cache, n_steps = state
        L = pos - 1  # cached prefix length; `last` sits at index L

        # ---- head proposals: one hidden state, gamma parallel heads ------
        head_lg = _head_logits(hw, hb, params, h_last)        # [g, V]
        rng, sub_d = jax.random.split(rng)
        if greedy:
            d = jnp.argmax(head_lg, -1).astype(jnp.int32)     # [gamma]
        else:
            q = jax.vmap(lambda lg: _dist(lg[None], temperature, top_k,
                                          greedy, top_p, min_p)[0])(head_lg)
            d = jax.random.categorical(
                sub_d, jnp.log(q + 1e-30), axis=-1).astype(jnp.int32)

        # ---- target verify: one block forward ----------------------------
        block = jnp.concatenate([last[None], d])[None]        # [1, g+1]
        ct = {"k": cache["k"], "v": cache["v"],
              "length": jnp.asarray(L, jnp.int32)}
        logits_t, h_block, ct = decode_block(params, block, ct, cfg,
                                             return_hidden=True)

        if greedy:
            # fast path: acceptance is d_k == target argmax; the residual
            # resample collapses to the target argmax. No [*, V] one-hots,
            # no softmaxes — bit-identical outcomes to the general path.
            t = jnp.argmax(logits_t[0], -1).astype(jnp.int32)  # [g+1]
            acc = d == t[:gamma]
            acc_prefix = jnp.cumprod(acc.astype(jnp.int32))
            n = jnp.sum(acc_prefix)                           # accepted
            t_new = t[n]
            rng = rng  # no draws consumed on the greedy path
        else:
            p = jax.vmap(lambda lg: _dist(lg[None], temperature, top_k,
                                          greedy, top_p, min_p)[0])(
                                              logits_t[0])    # [g+1, V]

            # ---- Leviathan acceptance (q = head dists) --------------------
            rng, sub_u, sub_r = jax.random.split(rng, 3)
            onehot_d = jax.nn.one_hot(d, V)
            p_d = jnp.sum(p[:gamma] * onehot_d, -1)
            q_d = jnp.sum(q * onehot_d, -1)
            u = jax.random.uniform(sub_u, (gamma,))
            acc = u < jnp.minimum(1.0, p_d / jnp.maximum(q_d, 1e-30))
            acc_prefix = jnp.cumprod(acc.astype(jnp.int32))
            n = jnp.sum(acc_prefix)                           # accepted

            # ---- next token: residual resample or bonus -------------------
            p_n = p[n]
            q_n = jnp.where(n < gamma, q[jnp.minimum(n, gamma - 1)],
                            jnp.zeros((V,)))                  # bonus: = p
            residual = jnp.maximum(p_n - q_n, 0.0)
            rsum = jnp.sum(residual)
            residual = jnp.where(rsum > 1e-12,
                                 residual / jnp.maximum(rsum, 1e-30), p_n)
            t_new = jax.random.categorical(
                sub_r, jnp.log(residual + 1e-30)).astype(jnp.int32)

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
        # hidden whose base head predicted new_last: in-block index
        # limit-1 (absolute position new_pos-2) — its medusa heads cover
        # exactly the gamma slots after new_last
        h_new = h_block[0, limit - 1]

        # ---- rewind the cache to the confirmed prefix ---------------------
        ct = {"k": ct["k"], "v": ct["v"],
              "length": jnp.asarray(new_pos - 1, jnp.int32)}
        return buf, new_pos, new_last, h_new, done, rng, ct, n_steps + 1

    return body


@partial(jax.jit, static_argnames=("cfg", "slack", "top_k", "greedy",
                                   "top_p", "min_p"))
def medusa_stream_start(params: dict, prompt: jax.Array, prompt_len,
                        rng: jax.Array, cfg: GPTConfig, slack: int,
                        temperature: float = 1.0, top_k: int = 50,
                        eos_id: int = -1, pad_id: int = 0,
                        greedy: bool = False, top_p: float = 1.0,
                        min_p: float = 0.0):
    """Compiled stream prelude: prefill + first token -> medusa state."""
    return _medusa_init(params, prompt, prompt_len, rng, cfg, slack,
                        temperature, top_k, greedy, top_p, min_p, eos_id,
                        pad_id)


@partial(jax.jit, static_argnames=("cfg", "max_len", "k_verifies",
                                   "gamma", "top_k", "greedy", "top_p",
                                   "min_p"))
def medusa_stream_chunk(params: dict, hw: jax.Array, hb: jax.Array,
                        state, cfg: GPTConfig, max_len: int,
                        k_verifies: int, gamma: int,
                        temperature: float = 1.0, top_k: int = 50,
                        eos_id: int = -1, pad_id: int = 0,
                        greedy: bool = False, top_p: float = 1.0,
                        min_p: float = 0.0):
    """Up to ``k_verifies`` verify iterations (early exit on EOS or
    max_len) — the streaming twin of generate_medusa's loop. The same
    body runs with the same state, so the accepted-token stream is
    bit-identical to the one-shot program's output."""
    body = _make_medusa_body(params, hw, hb, cfg, gamma, temperature,
                             top_k, greedy, top_p, min_p, eos_id, pad_id)

    def cond_i(carry):
        i, state = carry
        buf, pos, last, h_last, done, rng, cache, n_steps = state
        return (i < k_verifies) & (pos < max_len) & ~done

    def body_i(carry):
        i, state = carry
        return i + 1, body(state)

    _, state = jax.lax.while_loop(
        cond_i, body_i, (jnp.asarray(0, jnp.int32), state))
    # packed host view [slack + 2]: buf row, pos, done — ONE transfer per
    # chunk (each fetch costs a fixed ~25 ms RPC on the axon tunnel;
    # three separate fetches tripled the streaming overhead, measured)
    buf, pos, last, h_last, done, rng, cache, n_steps = state
    packed = jnp.concatenate(
        [buf[0], jnp.stack([pos, done.astype(jnp.int32)])])
    return state, packed


def stream_tokens_medusa(params: dict, heads: dict, cfg: GPTConfig,
                         prompt_ids: list[int], max_len: int,
                         k_verifies: int = 16, gamma: int = 4,
                         temperature: float = 1.0, top_k: int = 50,
                         eos_id: int = -1, pad_id: int = 0,
                         greedy: bool = False, seed: int = 0,
                         bucket: int = 64, top_p: float = 1.0,
                         min_p: float = 0.0):
    """Python generator yielding token ids one at a time (batch 1) —
    the medusa twin of decode.stream.stream_tokens: accepted tokens
    reach the host every ``k_verifies`` verify blocks, and the stream
    is bit-identical to generate_medusa's one-shot output (same body,
    same state, rng carried through).
    """
    import numpy as np

    assert cfg.causal and not cfg.pos_broadcast_bug
    gamma = min(gamma, len(heads["blocks"]))
    assert gamma >= 1
    heads = {"blocks": heads["blocks"][:gamma]}
    max_len = min(max_len, cfg.n_pos - gamma)
    p = len(prompt_ids)
    if p >= max_len:
        return
    width = max(bucket, 1)
    while width < p:
        width *= 2
    width = min(width, max_len)
    prompt = np.full((1, width), pad_id, np.int32)
    prompt[0, :p] = prompt_ids
    slack = max_len + gamma + 1
    hw, hb = _stack_heads(heads)
    state = medusa_stream_start(
        params, jnp.asarray(prompt), p, jax.random.PRNGKey(seed), cfg,
        slack, temperature=temperature, top_k=top_k, eos_id=eos_id,
        pad_id=pad_id, greedy=greedy, top_p=top_p, min_p=min_p)
    first = int(np.asarray(state[2]))
    yield first
    if first == eos_id:
        return
    emitted = p + 1
    done = False
    while emitted < max_len and not done:
        state, packed = medusa_stream_chunk(
            params, hw, hb, state, cfg, max_len, k_verifies, gamma,
            temperature=temperature, top_k=top_k, eos_id=eos_id,
            pad_id=pad_id, greedy=greedy, top_p=top_p, min_p=min_p)
        arr = np.asarray(packed)          # one RPC: buf row + pos + done
        pos = min(int(arr[-2]), max_len)
        done = bool(arr[-1])
        if pos > emitted:
            for t in arr[emitted:pos]:
                yield int(t)
                if int(t) == eos_id:
                    return
            emitted = pos
