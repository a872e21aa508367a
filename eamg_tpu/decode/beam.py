"""Beam-search decoding: one compiled while_loop over K live hypotheses.

Beyond-reference capability — the reference only ever samples
(api_cache.py:171-177; there is no argmax-tree search anywhere in it).
Beam search is the standard deterministic decoding mode a serving
framework is expected to offer, and it maps naturally onto the existing
KV runtime: the K beams are the batch dimension of the same
``decode_step`` program (models/gpt.py:498), so the MXU sees a [K, ...]
matmul per layer exactly like batched sampling.

TPU shape of the classic algorithm:

- the prompt is prefilled ONCE at batch 1 and the cache is broadcast to
  the K beam rows (identical prefixes — no K× prefill work);
- per step: ``log_softmax`` over [K, V], finished beams are collapsed to
  a single PAD continuation with unchanged score, one ``lax.top_k`` over
  the flattened [K*V] candidates picks the next beam set;
- beam reordering is a batched row gather of the KV cache by the parent
  index (``jnp.take`` along the batch axis — K is small, the gather is
  ~cache-size HBM traffic per step and XLA pipelines it);
- finished hypotheses are frozen in place (their only continuation is
  PAD at logp 0), so the loop carries no separate "finished" pool; the
  final ranking applies a GNMT-style length penalty
  ``score / gen_len**length_penalty`` on the host side of the program.

Composes with FSM grammar constraints (decode/grammar.py): with a
``grammar``, each beam carries its own FSM state (gathered by parent on
reorder) and the per-step logits are masked BEFORE the log-softmax, so
scores are renormalized over the grammatically-valid continuations —
the standard constrained-beam-search semantics. Budget-aware closing
guarantees every hypothesis that runs out of budget ends with a
complete note + END token.

Deterministic by construction (no RNG anywhere). K and max_len are
static; each (K, bucket) pair is one compiled program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.gpt import GPTConfig, decode_step, init_kv_cache, prefill
from .grammar import grammar_mask, grammar_step, scan_prompt_state
from .loop import _norm_grammar

_NEG = -1e30     # candidate mask: must dominate any real log-prob sum


def generate_beam(params: dict, prompt: jax.Array, prompt_len,
                  cfg: GPTConfig, max_len: int, n_beams: int = 4,
                  eos_id: int = -1, pad_id: int = 0,
                  length_penalty: float = 1.0, grammar=None):
    """prompt [1, P] -> (buf [K, max_len], gen_lens [K], scores [K]).

    ``buf`` rows hold prompt + hypothesis (PAD-padded), UNSORTED;
    ``scores`` are raw summed log-probs; ``gen_lens`` count generated
    tokens (EOS included when emitted). Rank on the host with
    :func:`rank_beams` (the length penalty is a cheap host-side
    normalization — keeping it out of the program lets one compile serve
    every penalty value). ``eos_id < 0`` disables EOS tracking: all beams
    run to ``max_len``. ``grammar``: optional decode.grammar.Grammar (or
    its ``arrays()`` pytree) — per-beam FSM constraint with renormalized
    scores; the tables are traced, only the on/off bit is static."""
    garr, use_gram = _norm_grammar(grammar)
    return _generate_beam(params, prompt, prompt_len, cfg, max_len,
                          n_beams, eos_id, pad_id, garr, use_gram)


@partial(jax.jit, static_argnames=("cfg", "max_len", "n_beams", "eos_id",
                                   "pad_id", "use_grammar"))
def _generate_beam(params: dict, prompt: jax.Array, prompt_len,
                   cfg: GPTConfig, max_len: int, n_beams: int = 4,
                   eos_id: int = -1, pad_id: int = 0,
                   grammar=None, use_grammar: bool = False):
    K = n_beams
    B, P = prompt.shape
    assert B == 1, "beam search expands ONE prompt into K hypotheses"
    assert cfg.pos_broadcast_bug or max_len <= cfg.n_pos, (
        f"max_len={max_len} exceeds the positional table "
        f"(n_pos={cfg.n_pos})")

    cache1 = init_kv_cache(cfg, 1, max_len)
    logits0, cache1 = prefill(params, prompt, cfg, cache1,
                              prompt_len=prompt_len)
    # broadcast the prefilled cache to the K beam rows
    cache = {"k": tuple(jnp.repeat(k, K, axis=0) for k in cache1["k"]),
             "v": tuple(jnp.repeat(v, K, axis=0) for v in cache1["v"]),
             "length": cache1["length"]}

    last_logits = jax.lax.dynamic_slice_in_dim(
        logits0, prompt_len - 1, 1, axis=1)[0, 0]            # [V]
    gstate = None
    if use_grammar:
        gstate1 = scan_prompt_state(grammar, prompt, prompt_len)   # [1]
        last_logits = grammar_mask(
            last_logits[None], gstate1, grammar,
            budget_left=jnp.asarray(max_len - prompt_len,
                                    jnp.int32)[None])[0]
    logp0 = jax.nn.log_softmax(last_logits)
    scores, first = jax.lax.top_k(logp0, K)                  # [K], [K]
    first = first.astype(jnp.int32)
    if use_grammar:
        gstate = grammar_step(jnp.broadcast_to(gstate1, (K,)), first,
                              grammar)

    buf = jnp.full((K, max_len), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.broadcast_to(
            jnp.where(jnp.arange(P) < prompt_len, prompt[0], pad_id),
            (K, P)).astype(jnp.int32), (0, 0))
    wcol = jnp.arange(max_len)[None, :]
    buf = jnp.where(wcol == prompt_len, first[:, None], buf)
    done = (first == eos_id) if eos_id >= 0 else jnp.zeros((K,), bool)
    V = cfg.vocab_size
    pad_onehot = (jnp.arange(V) == pad_id)

    def cond(state):
        pos, done = state[1], state[3]
        if eos_id < 0:
            return pos < max_len
        return jnp.logical_and(pos < max_len, ~jnp.all(done))

    def body(state):
        (buf, pos, last, done, scores, gen_len, cache, gstate) = state
        logits, cache = decode_step(params, last[:, None], cache, cfg)
        if use_grammar:
            # mask BEFORE the softmax: scores renormalize over the valid
            # continuations (constrained-beam-search semantics)
            logits = grammar_mask(logits, gstate, grammar,
                                  budget_left=max_len - pos)
        logp = jax.nn.log_softmax(logits, axis=-1)           # [K, V]
        # finished beams: exactly one candidate (PAD, logp 0) keeps the
        # hypothesis alive in the top-k pool at its frozen score
        step = jnp.where(done[:, None],
                         jnp.where(pad_onehot[None, :], 0.0, _NEG), logp)
        cand = scores[:, None] + step                        # [K, V]
        new_scores, idx = jax.lax.top_k(cand.reshape(-1), K)
        parent = (idx // V).astype(jnp.int32)
        tok = (idx % V).astype(jnp.int32)
        # reorder every per-beam state by parent (the cache rows already
        # contain this step's K/V for the token each parent was fed)
        cache = {"k": tuple(jnp.take(k, parent, axis=0)
                            for k in cache["k"]),
                 "v": tuple(jnp.take(v, parent, axis=0)
                            for v in cache["v"]),
                 "length": cache["length"]}
        buf = jnp.take(buf, parent, axis=0)
        pdone = jnp.take(done, parent)
        pgen = jnp.take(gen_len, parent)
        plast = jnp.take(last, parent)
        write = jnp.where(pdone, pad_id, tok)
        buf = jnp.where(wcol == pos, write[:, None], buf)
        if eos_id >= 0:
            done = pdone | (tok == eos_id)
        else:
            done = pdone
        gen_len = pgen + (~pdone).astype(jnp.int32)
        last = jnp.where(pdone, plast, tok)
        if use_grammar:
            gstate = grammar_step(jnp.take(gstate, parent), tok, grammar,
                                  active=~pdone)
        return (buf, pos + 1, last, done, new_scores, gen_len, cache,
                gstate)

    if gstate is None:
        gstate = jnp.zeros((K,), jnp.int32)    # inert placeholder
    state0 = (buf, jnp.asarray(prompt_len + 1, jnp.int32), first, done,
              scores, jnp.ones((K,), jnp.int32), cache, gstate)
    buf, pos, _, done, scores, gen_len, _, _ = jax.lax.while_loop(
        cond, body, state0)
    return buf, gen_len, scores


def rank_beams(buf, gen_lens, scores, length_penalty: float = 1.0):
    """Host-side GNMT-style ranking: order beams by
    ``score / gen_len**length_penalty`` descending; returns (buf, gen_lens,
    scores, normalized) all re-ordered. length_penalty 0 ranks by raw sum
    (favors short), 1 by mean per-token log-prob; >1 favors longer."""
    import numpy as np

    buf = np.asarray(buf)
    gen_lens = np.asarray(gen_lens)
    scores = np.asarray(scores)
    norm = scores / np.maximum(gen_lens, 1) ** float(length_penalty)
    order = np.argsort(-norm, kind="stable")
    return buf[order], gen_lens[order], scores[order], norm[order]
