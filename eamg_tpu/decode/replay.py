"""Teacher-forced decode: replay verification and perplexity.

Two jobs the reference had no tooling for (SURVEY.md §4: evaluation was
out-of-repo):

- **Host-replay sampled parity** (BASELINE: "sampled runs must match under
  fixed RNG"): torch.multinomial and jax.random.categorical draw
  differently, so cross-framework sampled parity is verified by replaying a
  *recorded* reference token stream through our model — every recorded
  token must lie inside our top-k support, and its log-probability under
  our sampling distribution is reported (with shared weights the
  distributions are equal per the logits parity suite, so support
  membership == reproducibility).
- **Perplexity** (paper §10.4's PPL metric) over teacher-forced data.

The teacher-forced pass is one ``lax.scan`` over decode steps — compiled
once, no per-token Python.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gpt import GPTConfig, decode_step, forward, init_kv_cache
from ..models.gpt import prefill
from .sampling import apply_min_p, apply_top_k, apply_top_p


@partial(jax.jit, static_argnames=("cfg", "prompt_len",
                                   "refeed_last_prompt"))
def teacher_forced_logits(params: dict, ids: jax.Array, prompt_len: int,
                          cfg: GPTConfig,
                          refeed_last_prompt: bool = True):
    """[B, L] recorded ids -> [B, L-P, V] logits, one per generated token,
    computed exactly the way the serving decode produced them (prefill +
    incremental steps, including the refeed/pos quirks when configured)."""
    B, L = ids.shape
    cache = init_kv_cache(cfg, B, L + 1)
    logits0, cache = prefill(params, ids[:, :], cfg, cache,
                             prompt_len=prompt_len)

    if refeed_last_prompt:
        # feed ids[P-1], ids[P], ..., ids[L-2]; logits align with targets
        # ids[P], ..., ids[L-1]
        start = prompt_len - 1
        steps = L - prompt_len
    else:
        start = prompt_len  # first target's logits come from the prefill
        steps = L - 1 - prompt_len

    def body(cache, i):
        tok = jax.lax.dynamic_slice(ids, (0, start + i), (B, 1))
        logits, cache = decode_step(params, tok, cache, cfg)
        return cache, logits

    _, step_logits = jax.lax.scan(body, cache, jnp.arange(steps))
    step_logits = step_logits.transpose(1, 0, 2)  # [B, steps, V]
    if refeed_last_prompt:
        return step_logits
    # efficient mode: prepend the prefill logits at the last prompt pos
    first = logits0[:, prompt_len - 1:prompt_len]
    return jnp.concatenate([first, step_logits], axis=1)


def verify_stream(params: dict, cfg: GPTConfig, ids, prompt_len: int,
                  temperature: float = 1.0, top_k: int = 50,
                  mask_value: float = -1e10,
                  refeed_last_prompt: bool = True,
                  top_p: float = 1.0, min_p: float = 0.0) -> dict:
    """Replay a recorded stream; returns reachability + per-token logprobs.

    ids: [L] or [B, L] full recorded stream (prompt + generated tokens).
    Pass the top_p/min_p the stream was sampled with so support checking
    uses the true (filtered) distribution.
    """
    ids = jnp.atleast_2d(jnp.asarray(ids, jnp.int32))
    B, L = ids.shape
    logits = teacher_forced_logits(params, ids, prompt_len, cfg,
                                   refeed_last_prompt=refeed_last_prompt)
    n_gen = L - prompt_len
    logits = logits[:, :n_gen]
    targets = ids[:, prompt_len:]

    masked = apply_top_k(logits / temperature, top_k, mask_value)
    masked = apply_top_p(masked, top_p, mask_value)
    masked = apply_min_p(masked, min_p, mask_value)
    logp = jax.nn.log_softmax(masked, axis=-1)
    tok_logp = jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    in_support = tok_logp > jnp.log(1e-30)
    return {
        "n_tokens": int(n_gen) * B,
        "all_in_top_k": bool(jnp.all(in_support)),
        "in_top_k_fraction": float(jnp.mean(in_support)),
        "log_prob_per_token": np.asarray(tok_logp),
        "total_log_prob": float(jnp.sum(tok_logp)),
    }


def perplexity(params: dict, cfg: GPTConfig, ids, pad_id: int = 0,
               batch: int = 128) -> float:
    """Teacher-forced next-token perplexity over [B, T] padded sequences
    (x = ids[:, :-1], y = ids[:, 1:], PAD masked) — the paper's PPL metric
    (§10.4), computed the way the trainers see data.

    Evaluates in ``batch``-row chunks: a monolithic forward materializes
    [B, T, V] logits (26 GB at 3000 eval rows on the flagship vocab — the
    at-scale ablation's OOM). The tail chunk pads with PAD rows, which
    the mask drops, so the result is chunking-invariant."""
    ids = np.asarray(ids, np.int32)
    total_nll, total_count = 0.0, 0
    for s in range(0, ids.shape[0], batch):
        chunk = ids[s:s + batch]
        if chunk.shape[0] < batch and s > 0:  # keep one compiled shape
            pad = np.full((batch - chunk.shape[0], ids.shape[1]), pad_id,
                          np.int32)
            chunk = np.concatenate([chunk, pad])
        chunk = jnp.asarray(chunk)
        x, y = chunk[:, :-1], chunk[:, 1:]
        logits = forward(params, x, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # one-hot contraction, NOT take_along_axis: vocab-axis gathers hit
        # the scalar core on this backend and FailedPrecondition at some
        # shapes (same convention as decode/ragged.py last-logit selection)
        onehot = jax.nn.one_hot(y, logits.shape[-1], dtype=jnp.float32)
        nll = -jnp.sum(logp * onehot, axis=-1)
        mask = y != pad_id
        total_nll += float(jnp.sum(nll * mask))
        total_count += int(jnp.sum(mask))
    return float(np.exp(total_nll / max(total_count, 1)))
